"""Image dataset pipelines for first-stage / LDM training.

Reference: `ldm/data/lsun.py` (LSUNBase + the 6 church/bedroom/cat splits)
and `ldm/data/imagenet.py` (ImageNetTrain/Validation via `ImagePaths`,
ImageNetSR handled separately by `training/degradation.py`).  Both reduce
to the same core: a list of image paths (+ optional class labels), loaded
as RGB, center-cropped square, resized, randomly h-flipped, scaled to
[-1, 1] float32 — exactly `lsun.py:39-60` / `imagenet.py` ImagePaths
preprocessing.

TPU shape: the per-example torchvision Dataset becomes a host-side
`ImagePathsDataset` plus `batches()` yielding FIXED-SHAPE [B, H, W, 3]
(+ [B] labels) numpy arrays that shard straight onto a data mesh — same
contract as `training/datasets.batches`.  The reference's ImageNet
download/untar machinery (`imagenet.py:40-130`, taming `download`) is
deliberately not reproduced: this environment has zero egress; the loader
consumes an already-extracted tree.
"""
from __future__ import annotations

import dataclasses
import os
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_PIL_RESAMPLE = {"linear": "BILINEAR", "bilinear": "BILINEAR",
                 "bicubic": "BICUBIC", "lanczos": "LANCZOS",
                 "nearest": "NEAREST"}
IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def load_image(path: str, size: Optional[int], interpolation: str = "bicubic",
               ) -> np.ndarray:
    """One image → center-cropped square, resized, uint8 [H, W, 3]
    (`lsun.py:39-55` score-sde preprocessing)."""
    from PIL import Image

    image = Image.open(path)
    if image.mode != "RGB":
        image = image.convert("RGB")
    img = np.asarray(image, np.uint8)
    crop = min(img.shape[0], img.shape[1])
    h, w = img.shape[0], img.shape[1]
    img = img[(h - crop) // 2:(h + crop) // 2,
              (w - crop) // 2:(w + crop) // 2]
    if size is not None:
        image = Image.fromarray(img).resize(
            (size, size), resample=getattr(Image, _PIL_RESAMPLE[interpolation]))
        img = np.asarray(image, np.uint8)
    return img


@dataclasses.dataclass
class ImagePathsDataset:
    """LSUNBase / taming ImagePaths equivalent.

    paths: absolute image paths; labels: optional per-path class ids
    (ImageNet); size/interpolation/flip_p as in the reference ctor."""

    paths: List[str]
    size: Optional[int] = 256
    interpolation: str = "bicubic"
    flip_p: float = 0.5
    labels: Optional[List[int]] = None

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int, rng: Optional[random.Random] = None):
        rng = rng or random
        img = load_image(self.paths[i], self.size, self.interpolation)
        if rng.random() < self.flip_p:
            img = img[:, ::-1]
        example = {
            "image": (img.astype(np.float32) / 127.5 - 1.0),
            "relative_file_path_": os.path.basename(self.paths[i]),
            "file_path_": self.paths[i],
        }
        if self.labels is not None:
            example["class_label"] = int(self.labels[i])
        return example

    def batches(self, batch_size: int, seed: int = 0, epochs: Optional[int] = None
                ) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Fixed-shape [B, size, size, 3] float32 in [-1, 1] (+ [B] int32
        labels), shuffled per epoch; tail dropped (static shapes)."""
        rng = random.Random(seed)
        epoch = 0
        order = list(range(len(self.paths)))
        while epochs is None or epoch < epochs:
            rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[s:s + batch_size]
                exs = [self.__getitem__(i, rng) for i in idx]
                imgs = np.stack([e["image"] for e in exs])
                labels = (np.asarray([e["class_label"] for e in exs], np.int32)
                          if self.labels is not None else None)
                yield imgs, labels
            epoch += 1


def lsun_split(txt_file: str, data_root: str, size: int = 256,
               interpolation: str = "bicubic", flip_p: float = 0.5
               ) -> ImagePathsDataset:
    """`LSUNBase(txt_file, data_root, …)` (`lsun.py:10-34`): one relative
    path per line.  The reference's six named splits are this with their
    fixed txt/root pairs and flip_p=0 for validation (`lsun.py:62-91`)."""
    with open(txt_file) as f:
        rel = f.read().splitlines()
    return ImagePathsDataset(
        paths=[os.path.join(data_root, l) for l in rel if l],
        size=size, interpolation=interpolation, flip_p=flip_p)


def imagenet_tree(data_root: str, size: int = 256, flip_p: float = 0.5,
                  synsets: Optional[Sequence[str]] = None
                  ) -> ImagePathsDataset:
    """ImageNetTrain/Validation over an ALREADY-EXTRACTED tree of
    `{data_root}/{synset}/*.JPEG` directories (`imagenet.py:134-270` minus
    the download/untar machinery).  Class ids are the sorted-synset index —
    the reference's `sorted(self.synsets)` convention."""
    found = sorted(
        d for d in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, d))
        and (synsets is None or d in synsets)
    )
    paths, labels = [], []
    for cls, syn in enumerate(found):
        for f in sorted(os.listdir(os.path.join(data_root, syn))):
            if f.lower().endswith(IMG_EXTS):
                paths.append(os.path.join(data_root, syn, f))
                labels.append(cls)
    return ImagePathsDataset(paths=paths, size=size, flip_p=flip_p,
                             labels=labels)
