"""Invisible watermark: embed/decode a byte string in images.

Reference surface: `scripts/txt2img.py` embeds "StableDiffusionV1" via the
`invisible-watermark` package (dwtDct) and `scripts/tests/test_watermark.py`
decodes it.  That package isn't available offline; this is a self-contained
blind scheme: the message bits are redundantly written into the
least-significant bit of the blue channel over a seeded pseudo-random pixel
permutation, decoded by majority vote.  Imperceptible (±1/255) and robust to
PNG round-trips (lossless), which is the reference's actual use case.
"""
from __future__ import annotations

import numpy as np

_SEED = 0x5D1FFB17


def _bits(message: bytes) -> np.ndarray:
    arr = np.frombuffer(message, dtype=np.uint8)
    return np.unpackbits(arr)


def embed_watermark(image: np.ndarray, message: str = "SDV1") -> np.ndarray:
    """image: [H, W, 3] uint8 → watermarked copy."""
    assert image.dtype == np.uint8 and image.ndim == 3
    h, w, _ = image.shape
    bits = _bits(message.encode())
    n = h * w
    reps = n // len(bits)
    if reps == 0:
        raise ValueError("image too small for message")
    rng = np.random.RandomState(_SEED)
    perm = rng.permutation(n)[: reps * len(bits)]
    out = image.copy()
    blue = out[..., 2].reshape(-1)
    payload = np.tile(bits, reps)
    blue[perm] = (blue[perm] & 0xFE) | payload
    out[..., 2] = blue.reshape(h, w)
    return out


def decode_watermark(image: np.ndarray, message_len: int = 4) -> str:
    """Majority-vote decode of a message_len-byte watermark."""
    h, w, _ = image.shape
    n = h * w
    nbits = message_len * 8
    reps = n // nbits
    rng = np.random.RandomState(_SEED)
    perm = rng.permutation(n)[: reps * nbits]
    blue = image[..., 2].reshape(-1)
    payload = (blue[perm] & 1).reshape(reps, nbits)
    bits = (payload.mean(axis=0) > 0.5).astype(np.uint8)
    return np.packbits(bits).tobytes().decode(errors="replace")
