"""Synthetic datasets for tests and benchmarks (no disk, no real data).

Generates structured random scenes (blobby class regions, not iid noise) so
self-training has learnable signal; shape-compatible with BaseDataset's
``get_item`` contract.
"""
from __future__ import annotations

import numpy as np


class SyntheticSegDataset:
    """Images whose colors weakly encode their class layout."""

    def __init__(
        self,
        n: int = 64,
        h: int = 512,
        w: int = 1024,
        num_classes: int = 19,
        seed: int = 0,
        p_ignore: float = 0.0,
        device_color_aug: str | None = None,
        cache: bool = True,
    ):
        self.n, self.h, self.w = n, h, w
        self.num_classes = num_classes
        self.seed = seed
        self.p_ignore = p_ignore
        self.device_color_aug = device_color_aug
        self.preprocessor = None
        self._cache: dict | None = {} if cache else None
        # per-class mean colors: the learnable signal
        self.palette = np.random.default_rng(seed).integers(
            0, 255, size=(num_classes, 3)
        ).astype(np.float32)
        self.img_paths = [f"synthetic_{i}.png" for i in range(n)]
        self.file_to_idx = {p: i for i, p in enumerate(self.img_paths)}

    def __len__(self):
        return self.n

    def set_preprocessor(self, preprocessor):
        self.preprocessor = preprocessor

    def get_file_to_idx(self, file_name):
        return self.file_to_idx[file_name]

    def get_samples_with_class(self):
        return {c: list(self.img_paths) for c in range(self.num_classes)}

    def _scene(self, index: int):
        if self._cache is not None and index in self._cache:
            img, lbl = self._cache[index]
            return img.copy(), lbl.copy()
        img, lbl = self._make_scene(index)
        if self._cache is not None:
            self._cache[index] = (img, lbl)
        return img.copy(), lbl.copy()

    def _make_scene(self, index: int):
        rng = np.random.default_rng((self.seed, index))
        # blobby label map: smooth random field argmax
        gh, gw = 8, 16
        field = rng.normal(size=(self.num_classes, gh, gw)).astype(np.float32)
        import cv2

        up = np.stack(
            [cv2.resize(f, (self.w, self.h), interpolation=cv2.INTER_LINEAR) for f in field]
        )
        lbl = np.argmax(up, axis=0).astype(np.uint8)
        img = self.palette[lbl] + rng.normal(0, 30, size=(self.h, self.w, 3))
        img = np.clip(img, 0, 255).astype(np.uint8)
        if self.p_ignore > 0:
            mask = rng.random(size=lbl.shape) < self.p_ignore
            lbl = np.where(mask, 255, lbl).astype(np.uint8)
        return img, lbl

    def load_data(self, index: int):
        img, lbl = self._scene(index)
        return img, lbl, self.img_paths[index]

    def get_item(self, index: int, rng: np.random.Generator) -> dict:
        img, lbl, path = self.load_data(index)
        result = {}
        if self.preprocessor is not None:
            img, lbl, cp_mask = self.preprocessor.run(img, lbl, rng)
            result["copy_paste_mask"] = cp_mask
        result["images"] = img
        result["labels"] = lbl
        result["image_paths"] = path
        return result
