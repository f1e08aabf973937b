"""Hard-aware pseudo-label augmentation (HPA cross-image copy-paste).

Re-implements the reference CopyPaste preprocessor (reference:
code/sseg/datasets/preprocessor.py:11-122):

- hard classes = the ``selected_num_classes`` lowest class-mean-probability
  classes (SYNTHIA masks its 3 non-existent classes {9, 14, 16} to +inf);
- donor CLASS sampled with probability proportional to (1 - mean_prob)^2;
- donor IMAGE drawn from samples_with_class[class] (pixel-count filtered);
- ALL hard-class pixels of the donor are pasted into the input image/label.

Faithfulness note: the reference's 3-donor loop marks every selected class
as 'pasted' after the first donor regardless of donor content
(preprocessor.py:106-110), so it always terminates after ONE donor; we keep
the loop shape (cfg.preprocessor.copy_paste.max_donors) with the same
accounting, which reproduces that single-donor behavior.

The mask/paste itself is vectorized numpy on the host here; the training
step can equivalently fold it on device (ops-level jnp.where) when the
pipeline ships donor tensors — donor selection stays host-side either way
because it reads run-time stats files.
"""
from __future__ import annotations

import numpy as np

from hiast_tpu.registry import PREPROCESSOR

IGNORE = 255


@PREPROCESSOR.register("CopyPaste")
class CopyPaste:
    def __init__(self, cfg, dataset_copy_from, init_class_value: np.ndarray):
        self.cfg = cfg
        self.dataset = dataset_copy_from
        # the reference rejects its own latent non-'original' modes
        # (preprocessor.py:64-68); mirror that loudly
        mode = cfg.preprocessor.copy_paste.mode
        assert mode == "original", f"unsupported copy_paste.mode {mode!r}"

        class_value = np.asarray(init_class_value, np.float64).copy()
        if cfg.dataset.source.type == "SYNTHIA":
            class_value[[9, 14, 16]] = np.inf  # classes absent from SYNTHIA

        k = cfg.preprocessor.copy_paste.selected_num_classes
        self.class_value = class_value
        self.hard_classes = np.argsort(class_value)[:k]
        self.samples_with_class = dataset_copy_from.get_samples_with_class()
        probs = (1.0 - np.where(np.isfinite(class_value), class_value, 1.0)) ** 2
        if probs.sum() <= 0:  # degenerate stats (all mean-probs == 1)
            probs = np.ones_like(probs)
            probs[~np.isfinite(class_value)] = 0.0
        self.class_probs = probs / probs.sum()

        self._hard_lut = np.zeros(256, bool)
        self._hard_lut[self.hard_classes] = True

    def _random_select(self, selected_classes, rng: np.random.Generator) -> int:
        """Class sampled from the global hard-class distribution, rejected
        until it lands in ``selected_classes`` (reference preprocessor.py:70-77)."""
        selected = set(int(c) for c in selected_classes)
        while True:
            c = int(rng.choice(len(self.class_probs), p=self.class_probs))
            if c in selected:
                return c

    def run(self, img: np.ndarray, lbl: np.ndarray, rng: np.random.Generator):
        import cv2

        img = img.copy()
        lbl = lbl.copy()
        cp_mask = np.full_like(lbl, IGNORE)
        selected_classes = list(self.hard_classes)
        exist_classes: list[int] = []
        max_donors = self.cfg.preprocessor.copy_paste.max_donors

        for _ in range(max_donors):
            select_c = self._random_select(selected_classes, rng)
            donors = self.samples_with_class[select_c]
            if not donors:
                break
            file_name = donors[int(rng.integers(0, len(donors)))]
            donor_idx = self.dataset.get_file_to_idx(file_name)
            d_img, d_lbl, _ = self.dataset.load_data(donor_idx)
            if d_img.shape != img.shape:
                d_img = cv2.resize(d_img, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_LINEAR)
                d_lbl = cv2.resize(d_lbl, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)

            for c in self.hard_classes:
                if c in selected_classes and c not in exist_classes:
                    exist_classes.append(int(c))
            from hiast_tpu.data.native_ops import paste_hard_classes

            paste_hard_classes(
                img, lbl, cp_mask, d_img, d_lbl, self._hard_lut.astype(np.uint8)
            )

            if len(exist_classes) >= len(self.hard_classes) * 0.5:
                break
            selected_classes = [c for c in self.hard_classes if c not in exist_classes]

        return img, lbl, cp_mask


@PREPROCESSOR.register("ClassMix")
class ClassMix:
    """ClassMix (arXiv:2007.07936): paste HALF the classes of a random donor
    image.  Named but unimplemented in the reference
    (default_config.py:173, base_dataset.py:44-46); provided here for the
    full preprocessor enum."""

    def __init__(self, cfg, dataset_copy_from, init_class_value=None):
        self.cfg = cfg
        self.dataset = dataset_copy_from

    def run(self, img: np.ndarray, lbl: np.ndarray, rng: np.random.Generator):
        img = img.copy()
        lbl = lbl.copy()
        cp_mask = np.full_like(lbl, IGNORE)
        donor_idx = int(rng.integers(0, len(self.dataset)))
        d_img, d_lbl, _ = self.dataset.load_data(donor_idx)
        if d_img.shape != img.shape:
            import cv2

            d_img = cv2.resize(d_img, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_LINEAR)
            d_lbl = cv2.resize(d_lbl, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)
        classes = np.unique(d_lbl)
        classes = classes[classes != IGNORE]
        if classes.size == 0:
            return img, lbl, cp_mask
        k = max(classes.size // 2, 1)
        chosen = rng.choice(classes, size=k, replace=False)
        lut = np.zeros(256, np.uint8)
        lut[chosen] = 1
        from hiast_tpu.data.native_ops import paste_hard_classes

        paste_hard_classes(img, lbl, cp_mask, d_img, d_lbl, lut)
        return img, lbl, cp_mask


@PREPROCESSOR.register("CutMix")
class CutMix:
    """CutMix (arXiv:1905.04899): paste one random rectangle from a donor
    image.  Named but unimplemented in the reference."""

    def __init__(self, cfg, dataset_copy_from, init_class_value=None, beta: float = 1.0):
        self.cfg = cfg
        self.dataset = dataset_copy_from
        self.beta = beta

    def run(self, img: np.ndarray, lbl: np.ndarray, rng: np.random.Generator):
        img = img.copy()
        lbl = lbl.copy()
        cp_mask = np.full_like(lbl, IGNORE)
        donor_idx = int(rng.integers(0, len(self.dataset)))
        d_img, d_lbl, _ = self.dataset.load_data(donor_idx)
        if d_img.shape != img.shape:
            import cv2

            d_img = cv2.resize(d_img, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_LINEAR)
            d_lbl = cv2.resize(d_lbl, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)
        h, w = lbl.shape
        lam = rng.beta(self.beta, self.beta)
        cut = np.sqrt(1.0 - lam)
        ch, cw = max(int(h * cut), 1), max(int(w * cut), 1)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        sl = (slice(y0, y0 + ch), slice(x0, x0 + cw))
        img[sl] = d_img[sl]
        lbl[sl] = d_lbl[sl]
        cp_mask[sl] = d_lbl[sl]
        return img, lbl, cp_mask
