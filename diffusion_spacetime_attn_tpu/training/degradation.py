"""Blind-superresolution image degradation (BSRGAN-style), host-side.

Reference: `ldm/modules/image_degradation/bsrgan_light.py` (from the BSRGAN
paper "Designing a Practical Degradation Model for Deep Blind Image
Super-Resolution") as consumed by the superres dataset
`ldm/data/imagenet.py:274-330` (`ImageNetSR`: crop → degrade → the LDM
trains on (HQ image, LR conditioning)).

Same stage set and probabilities as `degradation_bsrgan_variant`
(`bsrgan_light.py:534-`): random-order {blur (iso/aniso gaussian),
random-scale downsample, gaussian noise, JPEG compression} with the final
nearest/area downsample to the target scale factor kept last, plus the
reference's 25%-probability pre-halving for sf=4.  cv2 is replaced with
PIL (resize/JPEG) and scipy.ndimage (kernel convolution) — pure host-side
numpy; the TPU never sees this stage (SURVEY §7 host/device split).
"""
from __future__ import annotations

import io
import random
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage


def _gaussian_kernel(size: int, sigma_x: float, sigma_y: Optional[float] = None,
                     theta: float = 0.0) -> np.ndarray:
    """Isotropic / anisotropic 2-D gaussian (reference `fspecial` /
    `anisotropic_Gaussian`, `bsrgan_light.py:50-120`)."""
    sigma_y = sigma_x if sigma_y is None else sigma_y
    ax = np.arange(size) - (size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    c, s = np.cos(theta), np.sin(theta)
    xr = c * xx + s * yy
    yr = -s * xx + c * yy
    k = np.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    return k / k.sum()


def add_blur(img: np.ndarray, sf: int, rng: random.Random) -> np.ndarray:
    """`bsrgan_light.py add_blur`: 50% anisotropic, widths scaled by sf."""
    wd = 2.0 + 0.2 * sf
    if rng.random() < 0.5:
        k = _gaussian_kernel(
            2 * rng.randint(2, 11) + 3,
            sigma_x=wd * rng.random(), sigma_y=wd * rng.random(),
            theta=rng.random() * np.pi,
        )
    else:
        k = _gaussian_kernel(2 * rng.randint(2, 11) + 3,
                             sigma_x=max(wd * rng.random(), 1e-2))
    return ndimage.convolve(img, k[..., None], mode="mirror")


def add_gaussian_noise(img: np.ndarray, rng: random.Random,
                       noise_level1: int = 2, noise_level2: int = 25
                       ) -> np.ndarray:
    """`add_Gaussian_noise`: per-channel / grayscale / correlated covariance
    noise with random level."""
    level = rng.randint(noise_level1, noise_level2) / 255.0
    p = rng.random()
    nprng = np.random.RandomState(rng.randint(0, 2 ** 31 - 1))
    if p > 0.6:
        img = img + nprng.normal(0, level, img.shape)
    elif p > 0.4:
        img = img + nprng.normal(0, level, img.shape[:2] + (1,))
    else:  # correlated color noise
        d = np.diag(nprng.rand(3))
        u, _ = np.linalg.qr(nprng.rand(3, 3))
        cov = u.T @ d @ u
        n = nprng.multivariate_normal([0, 0, 0], np.abs(level ** 2 * cov),
                                      img.shape[:2])
        img = img + n
    return np.clip(img, 0.0, 1.0)


def add_jpeg_compression(img: np.ndarray, rng: random.Random,
                         q_min: int = 30, q_max: int = 95) -> np.ndarray:
    """`add_JPEG_noise` with PIL instead of cv2.imencode."""
    from PIL import Image

    q = rng.randint(q_min, q_max)
    buf = io.BytesIO()
    Image.fromarray((img * 255.0 + 0.5).clip(0, 255).astype(np.uint8)).save(
        buf, format="JPEG", quality=q)
    buf.seek(0)
    return np.asarray(Image.open(buf)).astype(np.float64) / 255.0


def _resize(img: np.ndarray, shape: Tuple[int, int], rng: random.Random
            ) -> np.ndarray:
    from PIL import Image

    method = rng.choice([Image.BILINEAR, Image.BICUBIC, Image.LANCZOS])
    out = Image.fromarray(
        (img * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
    ).resize((shape[1], shape[0]), method)
    return np.asarray(out).astype(np.float64) / 255.0


def degradation_bsrgan_light(image: np.ndarray, sf: int = 4,
                             seed: Optional[int] = None
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """image [H, W, 3] in [0, 1] (float) or uint8 → (lq [H/sf, W/sf, 3],
    hq [H, W, 3]), both [0, 1] float32 (`degradation_bsrgan_variant`)."""
    rng = random.Random(seed)
    if image.dtype == np.uint8:
        image = image.astype(np.float64) / 255.0
    image = image.astype(np.float64)
    h1, w1 = image.shape[:2]
    image = image[: h1 - h1 % sf, : w1 - w1 % sf]
    h, w = image.shape[:2]
    hq = image.copy()
    sf_run = sf
    if sf == 4 and rng.random() < 0.25:  # scale2_prob pre-halving
        image = _resize(image, (h // 2, w // 2), rng)
        sf_run = 2

    jpeg_prob = 0.9
    order = rng.sample(range(4), 4)
    # keep the final downsample last (reference keeps downsample3 last)
    order.remove(3)
    order.append(3)
    for stage in order:
        if stage == 0:
            image = add_blur(image, sf_run, rng)
        elif stage == 1:
            if rng.random() < 0.8:  # random-scale downsample (downsample2)
                sf1 = rng.uniform(1, 2 * sf_run)
                image = _resize(
                    image,
                    (max(int(image.shape[0] / sf1), h // sf),
                     max(int(image.shape[1] / sf1), w // sf)),
                    rng,
                )
        elif stage == 2:
            image = add_gaussian_noise(image, rng)
        elif stage == 3:
            image = _resize(image, (h // sf, w // sf), rng)  # downsample3
            if rng.random() < jpeg_prob:
                image = add_jpeg_compression(image, rng)
    image = _resize(image, (h // sf, w // sf), rng)  # enforce final size
    return image.astype(np.float32), hq.astype(np.float32)


def superres_example(image: np.ndarray, size: int = 256, sf: int = 4,
                     degradation: str = "bsrgan_light",
                     seed: Optional[int] = None) -> dict:
    """One ImageNetSR-style training record (`ldm/data/imagenet.py:274-330`):
    center-crop to `size`, degrade, return {'image', 'LR_image'} both in
    [-1, 1] (the reference's `2*x - 1` mapping)."""
    from PIL import Image

    h, w = image.shape[:2]
    m = min(h, w)
    top, left = (h - m) // 2, (w - m) // 2
    crop = image[top: top + m, left: left + m]
    crop = np.asarray(
        Image.fromarray(
            (crop * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
            if crop.dtype != np.uint8 else crop
        ).resize((size, size), Image.BICUBIC)
    ).astype(np.float32) / 255.0
    if degradation == "bsrgan_light":
        lq, hq = degradation_bsrgan_light(crop, sf=sf, seed=seed)
    else:  # deterministic bicubic (the reference's cv_* interpolation modes)
        lq = np.asarray(
            Image.fromarray((crop * 255).astype(np.uint8)).resize(
                (size // sf, size // sf), Image.BICUBIC)
        ).astype(np.float32) / 255.0
        hq = crop
    return {"image": hq * 2.0 - 1.0, "LR_image": lq * 2.0 - 1.0}
