"""Host-side geometric augmentation (numpy/cv2).

The reference's geometric aug vocabulary (reference:
code/sseg/datasets/augmentations.py:50-64 and the per-dataset builders in
code/sseg/datasets/loader/*.py) re-implemented with cv2 directly:

- 'MS'  : random horizontal flip + random-sized crop + resize to a FIXED
          [crop_h, crop_w] (static shapes = one XLA compilation)
- 'OMS' : same with the Oxford aspect ratio
- 'PRS-h-w' : deterministic resize (pseudo-label generation / eval)
- 'DACS': resize then random crop
- 'FDA-*' : Fourier domain adaptation (numpy FFT, see fda())

Color augs ('SCA'/'CCA') are NOT here — they run on device inside the train
step (ops/color_aug.py), which is the TPU-native redesign of the reference's
DataLoader-worker albumentations pipeline.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

import cv2
import numpy as np


@dataclass
class GeometricAug:
    """flip + RandomSizedCrop(min_max_height, w2h_ratio) + resize to (h, w)."""

    out_h: int
    out_w: int
    min_max_height: tuple[int, int]
    w2h_ratio: float
    flip_p: float = 0.5

    def __call__(self, img: np.ndarray, lbl: np.ndarray, rng: np.random.Generator):
        from hiast_tpu.data.native_ops import crop_flip_resize

        flip = bool(rng.random() < self.flip_p)
        h, w = img.shape[:2]
        crop_h = int(rng.integers(self.min_max_height[0], self.min_max_height[1] + 1))
        crop_h = min(crop_h, h)
        crop_w = min(int(round(crop_h * self.w2h_ratio)), w)
        y0 = int(rng.integers(0, h - crop_h + 1))
        x0 = int(rng.integers(0, w - crop_w + 1))
        # fused crop+flip+resize: one C++ pass, no cropped intermediate
        return crop_flip_resize(
            img, lbl, y0, x0, crop_h, crop_w, flip, self.out_h, self.out_w
        )


@dataclass
class Resize:
    out_h: int
    out_w: int

    def __call__(self, img, lbl, rng=None):
        img = cv2.resize(img, (self.out_w, self.out_h), interpolation=cv2.INTER_LINEAR)
        if lbl is not None:
            lbl = cv2.resize(lbl, (self.out_w, self.out_h), interpolation=cv2.INTER_NEAREST)
        return img, lbl


@dataclass
class ResizeCrop:
    """'DACS': resize to (h, w), then random crop (crop_h, crop_w)."""

    h: int
    w: int
    crop_h: int
    crop_w: int

    def __call__(self, img, lbl, rng: np.random.Generator):
        img = cv2.resize(img, (self.w, self.h), interpolation=cv2.INTER_LINEAR)
        lbl = cv2.resize(lbl, (self.w, self.h), interpolation=cv2.INTER_NEAREST)
        y0 = int(rng.integers(0, self.h - self.crop_h + 1))
        x0 = int(rng.integers(0, self.w - self.crop_w + 1))
        return (
            np.ascontiguousarray(img[y0 : y0 + self.crop_h, x0 : x0 + self.crop_w]),
            np.ascontiguousarray(lbl[y0 : y0 + self.crop_h, x0 : x0 + self.crop_w]),
        )


class FDA:
    """Fourier Domain Adaptation (arXiv:2004.05498; reference
    augmentations.py:92-99): swap the low-frequency amplitude band of the
    source image with a random target-domain image's."""

    def __init__(self, target_json_path: str, target_image_dir: str, beta_limit: float = 0.001):
        with open(target_json_path) as f:
            data = json.load(f)
        self.paths = [os.path.join(target_image_dir, d["image_name"]) for d in data]
        self.beta = beta_limit

    def _load_target(self, rng: np.random.Generator, shape):
        from PIL import Image

        path = self.paths[int(rng.integers(0, len(self.paths)))]
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        return cv2.resize(img, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR)

    def __call__(self, img, lbl, rng: np.random.Generator):
        tgt = self._load_target(rng, img.shape[:2]).astype(np.float32)
        src = img.astype(np.float32)
        h, w = src.shape[:2]
        b = max(int(np.floor(min(h, w) * self.beta)), 1)
        out = np.empty_like(src)
        for c in range(3):
            fs = np.fft.fft2(src[..., c])
            ft = np.fft.fft2(tgt[..., c])
            amp_s, pha_s = np.abs(fs), np.angle(fs)
            amp_t = np.abs(ft)
            amp_s = np.fft.fftshift(amp_s)
            amp_t = np.fft.fftshift(amp_t)
            cy, cx = h // 2, w // 2
            amp_s[cy - b : cy + b, cx - b : cx + b] = amp_t[cy - b : cy + b, cx - b : cx + b]
            amp_s = np.fft.ifftshift(amp_s)
            out[..., c] = np.real(np.fft.ifft2(amp_s * np.exp(1j * pha_s)))
        return np.clip(out, 0, 255).astype(np.uint8), lbl


def parse_resize_params(aug_type: str) -> tuple[int, int]:
    """'PRS-768-1536' -> (768, 1536) (reference datasets/utils.py:67-71)."""
    parts = aug_type.split("-")
    assert len(parts) == 3, "aug_type should be like 'PRS-512-1024'"
    return int(parts[1]), int(parts[2])


# device-side color-aug kinds recognized in aug_type lists
DEVICE_COLOR_AUGS = ("SCA", "CCA")


def split_aug_types(aug_types: list[str]) -> tuple[list[str], str | None]:
    """Partition an aug_type list into (host geometric augs, device color aug).

    The reference's serial multi-aug (['MS','CCA'] -> weak=MS(img),
    strong=CCA(weak)) maps to: host produces the weak view, the train step
    produces the strong view on device.
    """
    host = [a for a in aug_types if a not in DEVICE_COLOR_AUGS]
    device = [a for a in aug_types if a in DEVICE_COLOR_AUGS]
    assert len(device) <= 1, "at most one device color aug"
    return host, (device[0] if device else None)
