"""Image preprocessing: resize/crop/normalize to [-1, 1] numpy arrays.

Equivalent of the reference's torchvision transforms
(training/utils.py:200-220): `image_transform` = bicubic resize (short side)
→ center crop → normalize ±1; `image_transform_squash` resizes to the exact
square. Output is NHWC float32 (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _to_array(image: Image.Image) -> np.ndarray:
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def image_transform(
    image: Image.Image, resolution: int = 256, normalize: bool = True
) -> np.ndarray:
    w, h = image.size
    scale = resolution / min(w, h)
    new_w, new_h = round(w * scale), round(h * scale)
    image = image.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - resolution) // 2
    top = (new_h - resolution) // 2
    image = image.crop((left, top, left + resolution, top + resolution))
    arr = _to_array(image)
    if normalize:
        arr = arr * 2.0 - 1.0
    return arr


def image_transform_squash(
    image: Image.Image, resolution: int = 256, normalize: bool = True
) -> np.ndarray:
    image = image.resize((resolution, resolution), Image.BICUBIC)
    arr = _to_array(image)
    if normalize:
        arr = arr * 2.0 - 1.0
    return arr


def pad_sequence(seqs: list[np.ndarray], pad_value: int) -> np.ndarray:
    max_len = max(len(s) for s in seqs)
    out = np.full((len(seqs), max_len), pad_value, dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out
