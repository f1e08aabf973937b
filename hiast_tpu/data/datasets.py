"""Host-side datasets: manifest-driven decode + remap + geometric aug.

Registry-dispatched datasets mirroring the reference loaders (reference:
code/sseg/datasets/loader/*.py) with the TPU-shaped contract: every train
sample leaves the host as a FIXED-SHAPE uint8 image + uint8 label so one XLA
compilation serves the whole run; color augs move on device (ops/color_aug).

Per-dataset differences (all from the reference):
- GTAV     : labelId remap, MS crop heights 341..950 (gtav_dataset.py:18-31)
- SYNTHIA  : imageio PNG-FI channel-0 labels, crops 341..640 (synthia_dataset.py)
- Cityscapes: optional 19->9 remap for the Oxford scenario, MS 341..1000,
              OMS 768x1024 with 1280/960 ratio (cityscapes_dataset.py:22-45)
- Oxford   : RGBA channel-0 labels, unlabeled train split -> all-255
             (oxford_dataset.py:12-22)
"""
from __future__ import annotations

import json
import os
from typing import Callable

import cv2
import numpy as np
from PIL import Image

# Our batch fetcher parallelizes across samples with threads; cv2's internal
# pool on top of that oversubscribes the host (the reference hits the same
# issue under DataLoader workers and does this per-__getitem__,
# base_dataset.py:38-40 — once at import is enough in-process).
cv2.setNumThreads(0)

from hiast_tpu.data import augment as A
from hiast_tpu.data import native_ops
from hiast_tpu.data.remap import remap_label
from hiast_tpu.registry import DATASET

IGNORE = 255


def read_rgb(path: str) -> np.ndarray:
    """PNG decode via the C++ lib (single inflate + unfilter, no PIL
    mode-conversion copies — decode is the largest per-sample host cost at
    2048x1024, scripts/profile_host_pipeline.py); PIL for everything else."""
    arr = native_ops.decode_png_file(path)
    if arr is not None and arr.dtype == np.uint8:
        if arr.ndim == 3 and arr.shape[2] == 3:
            return arr
        if arr.ndim == 3 and arr.shape[2] == 4:
            return np.ascontiguousarray(arr[..., :3])
        if arr.ndim == 2:
            return np.repeat(arr[..., None], 3, axis=2)
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def read_gray(path: str) -> np.ndarray:
    """8-bit grayscale PNG via the C++ decoder (pseudo-label maps are re-read
    every epoch); PIL fallback for palette/16-bit/other formats."""
    arr = native_ops.decode_png_file(path)
    if arr is not None and arr.ndim == 2 and arr.dtype == np.uint8:
        return arr
    return np.asarray(Image.open(path), np.uint8)


def get_path_list(json_path: str, image_dir: str):
    """JSON manifest -> absolute (image, label) path lists (reference
    datasets/utils.py:21-34)."""
    with open(json_path) as f:
        data = json.load(f)
    imgs = [os.path.join(image_dir, d["image_name"]) for d in data]
    lbls = [os.path.join(image_dir, d["mask_name"]) for d in data]
    return imgs, lbls


class BaseDataset:
    def __init__(
        self,
        cfg,
        json_path: str,
        image_dir: str,
        pseudo_dir: str | None = None,
        aug_type=(),
        num_classes: int = 19,
    ):
        self.cfg = cfg
        self.pseudo_dir = pseudo_dir
        self.num_classes = num_classes
        self.preprocessor = None

        host_augs, self.device_color_aug = A.split_aug_types(list(aug_type))
        self.aug_fns = [self.build_aug_fn(a) for a in host_augs]
        self.aug_fns = [a for a in self.aug_fns if a is not None]

        self.img_paths, self.lbl_paths = get_path_list(json_path, image_dir)
        assert len(self.img_paths) == len(self.lbl_paths)
        self.file_to_idx = {
            os.path.basename(p): i for i, p in enumerate(self.img_paths)
        }

        # class -> donor image list, for copy-paste (reference
        # base_dataset.py:61-77: sort by pixel count, drop the smallest 10%)
        self.samples_with_class: dict[int, list[str]] | None = None
        if self.pseudo_dir is not None:
            stats_dir = os.path.dirname(os.path.normpath(self.pseudo_dir))
            swc_path = os.path.join(stats_dir, "samples_with_class.json")
            if os.path.exists(swc_path):
                with open(swc_path) as f:
                    raw = {int(k): v for k, v in json.load(f).items()}
                self.samples_with_class = {}
                for c in range(num_classes):
                    entries = sorted(raw.get(c, []), key=lambda e: e[1])
                    files = [os.path.basename(e[0]) for e in entries]
                    self.samples_with_class[c] = files[round(len(files) * 0.1):]

    # -- per-dataset hooks ---------------------------------------------------
    def read_label(self, path: str) -> np.ndarray | None:
        raise NotImplementedError

    def build_aug_fn(self, aug_type: str | None) -> Callable | None:
        raise NotImplementedError

    # -- core ---------------------------------------------------------------
    def __len__(self):
        return len(self.img_paths)

    def set_preprocessor(self, preprocessor):
        self.preprocessor = preprocessor

    def get_samples_with_class(self):
        return self.samples_with_class

    def get_file_to_idx(self, file_name: str) -> int:
        return self.file_to_idx[file_name]

    def load_data(self, index: int):
        """-> (img uint8 [H,W,3], lbl uint8 [H,W], img_path)."""
        img_path = self.img_paths[index]
        lbl_path = self.lbl_paths[index]
        img = read_rgb(img_path)
        if self.pseudo_dir is not None:
            name = os.path.splitext(os.path.basename(img_path))[0]
            lbl_path = os.path.join(self.pseudo_dir, f"{name}_pseudo_label.png")
            lbl = read_gray(lbl_path)
        else:
            lbl = self.read_label(lbl_path)
        if lbl is None:  # unlabeled split (Oxford train)
            lbl = np.full(img.shape[:2], IGNORE, np.uint8)
        if lbl.shape != img.shape[:2]:
            lbl = cv2.resize(
                lbl, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST
            )
        return img, lbl, img_path

    def get_item(self, index: int, rng: np.random.Generator) -> dict:
        """One sample: load (+copy-paste) + host geometric augs.

        Corrupt files retry a neighboring index (reference
        base_dataset.py:81-86)."""
        try:
            img, lbl, img_path = self.load_data(index)
        except Exception as e:  # noqa: BLE001 - deliberate robustness net
            print(f"## {e!r} loading index {index}: {self.img_paths[index]}")
            index = index - 1 if index > 0 else index + 1
            return self.get_item(index, rng)

        result = {}
        cp_mask = None
        if self.preprocessor is not None:
            img, lbl, cp_mask = self.preprocessor.run(img, lbl, rng)
            result["copy_paste_mask"] = cp_mask
        aug_state = rng.bit_generator.state if cp_mask is not None else None
        img_pre = img
        for fn in self.aug_fns:
            img, lbl = fn(img, lbl, rng)
        if cp_mask is not None and self.cfg.cst_training.dcst_loss.weight > 0:
            # the directional consistency loss consumes the mask on the
            # augmented grid: replay the SAME geometric augs (cloned rng
            # state -> identical crops/flips) with the mask as the label
            replay = np.random.default_rng()
            replay.bit_generator.state = aug_state
            for fn in self.aug_fns:
                img_pre, cp_mask = fn(img_pre, cp_mask, replay)
            result["copy_paste_mask"] = cp_mask
        result["images"] = np.ascontiguousarray(img)
        result["labels"] = np.ascontiguousarray(lbl)
        result["image_paths"] = img_path
        return result


@DATASET.register("GTAV")
class GTAVDataset(BaseDataset):
    def read_label(self, path):
        lbl = read_gray(path)
        return remap_label(lbl, "GTAV")

    def build_aug_fn(self, aug_type):
        ch, cw = self.cfg.dataset.crop_size
        if not aug_type:
            return None
        if aug_type == "MS":
            return A.GeometricAug(ch, cw, (341, 950), w2h_ratio=2)
        if aug_type == "DACS":
            return A.ResizeCrop(720, 1280, 512, 512)
        if aug_type.startswith("PRS"):
            return A.Resize(*A.parse_resize_params(aug_type))
        if aug_type == "FDA-Target":
            return A.FDA(self.cfg.dataset.target.json_path, self.cfg.dataset.target.image_dir)
        raise ValueError(f"invalid aug_type {aug_type!r}")


def _probe_png_fi() -> bool:
    """Can imageio's PNG-FI (FreeImage) backend actually decode?  Probes with
    a tiny in-memory PNG so the answer reflects the BACKEND, not the file
    that just failed."""
    try:
        import io

        import imageio.v2 as imageio
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 2)).save(buf, format="PNG")
        imageio.imread(buf.getvalue(), format="PNG-FI")
        return True
    except Exception:  # noqa: BLE001 - any failure means "backend unusable"
        return False


@DATASET.register("SYNTHIA")
class SYNTHIADataset(BaseDataset):
    # PNG-FI availability, latched only on PLUGIN-level failure (a single
    # corrupt file must not disable the reference decoder for the whole run)
    _imageio_plugin_ok: bool | None = None

    def read_label(self, path):
        """SYNTHIA labels are 16-bit RGB PNGs with the class id in channel 0
        (reference synthia_dataset.py:16 reads via imageio PNG-FI).  Decode
        order: native C++ (16-bit path, libdeflate) -> imageio PNG-FI (the
        reference decoder; the FreeImage plugin is probed once via the first
        REAL read) -> cv2's 16-bit reader (BGR: channel 0 of RGB == channel
        2 of BGR)."""
        raw = native_ops.decode_png_file(path)
        if raw is not None and raw.ndim == 3:
            lbl = raw[:, :, 0]
        else:
            lbl = None
            if SYNTHIADataset._imageio_plugin_ok is not False:
                try:
                    import imageio.v2 as imageio

                    lbl = np.asarray(imageio.imread(path, format="PNG-FI"))[:, :, 0]
                    SYNTHIADataset._imageio_plugin_ok = True
                except ImportError:
                    SYNTHIADataset._imageio_plugin_ok = False
                except Exception:  # noqa: BLE001 - plugin missing OR bad file
                    # Latch only on BACKEND-level failure; a per-file error
                    # must fall through to cv2 for this file alone.  The
                    # registration table can't distinguish the two (PNG-FI is
                    # registered statically even when the FreeImage binary is
                    # absent and imread raises NeedDownloadError), so probe
                    # the backend ONCE with a known-good in-memory PNG.
                    if SYNTHIADataset._imageio_plugin_ok is None:
                        SYNTHIADataset._imageio_plugin_ok = _probe_png_fi()
            if lbl is None:
                raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                if raw is None:
                    raise FileNotFoundError(path)
                lbl = raw[:, :, 2] if raw.ndim == 3 else raw  # BGR -> red chan
        return remap_label(np.clip(lbl, 0, 255).astype(np.uint8), "SYNTHIA")

    def build_aug_fn(self, aug_type):
        ch, cw = self.cfg.dataset.crop_size
        if not aug_type:
            return None
        if aug_type == "MS":
            return A.GeometricAug(ch, cw, (341, 640), w2h_ratio=2)
        if aug_type == "DACS":
            return A.ResizeCrop(760, 1280, 512, 512)
        if aug_type.startswith("PRS"):
            return A.Resize(*A.parse_resize_params(aug_type))
        if aug_type == "FDA-Target":
            return A.FDA(self.cfg.dataset.target.json_path, self.cfg.dataset.target.image_dir)
        raise ValueError(f"invalid aug_type {aug_type!r}")


@DATASET.register("Cityscapes")
class CityscapesDataset(BaseDataset):
    def read_label(self, path):
        assert self.num_classes in (9, 19)
        lbl = read_gray(path)
        if self.num_classes == 9:  # Cityscapes -> Oxford scenario
            lbl = remap_label(lbl, "Cityscapes9")
        return lbl

    def build_aug_fn(self, aug_type):
        ch, cw = self.cfg.dataset.crop_size
        if not aug_type:
            return None
        if aug_type == "MS":
            return A.GeometricAug(ch, cw, (341, 1000), w2h_ratio=2)
        if aug_type == "OMS":
            return A.GeometricAug(768, 1024, (341, 1000), w2h_ratio=1280 / 960)
        if aug_type == "DACS":
            return A.ResizeCrop(512, 1024, 512, 512)
        if aug_type.startswith("PRS"):
            return A.Resize(*A.parse_resize_params(aug_type))
        if aug_type == "FDA-Source":
            return A.FDA(self.cfg.dataset.source.json_path, self.cfg.dataset.source.image_dir)
        if aug_type == "FDA-Target":
            return A.FDA(self.cfg.dataset.target.json_path, self.cfg.dataset.target.image_dir)
        raise ValueError(f"invalid aug_type {aug_type!r}")


@DATASET.register("Oxford")
class OxfordDataset(BaseDataset):
    def read_label(self, path):
        assert self.num_classes == 9
        if not path.endswith(".png"):  # unlabeled train split
            return None
        lbl = native_ops.decode_png_file(path)
        if lbl is None or lbl.dtype != np.uint8:  # 16-bit PNG: let PIL decide
            lbl = np.asarray(Image.open(path), np.uint8)
        if lbl.ndim == 3:
            lbl = lbl[:, :, 0]
        return remap_label(np.ascontiguousarray(lbl), "Oxford")

    def build_aug_fn(self, aug_type):
        if not aug_type:
            return None
        if aug_type == "OMS":
            return A.GeometricAug(768, 1024, (341, 900), w2h_ratio=1280 / 960)
        if aug_type.startswith("PRS"):
            return A.Resize(*A.parse_resize_params(aug_type))
        if aug_type == "FDA-Source":
            return A.FDA(self.cfg.dataset.source.json_path, self.cfg.dataset.source.image_dir)
        raise ValueError(f"invalid aug_type {aug_type!r}")


def build_dataset(cfg, section, pseudo_dir=None, aug_type=None, num_classes=None):
    """Instantiate the dataset named by a cfg.dataset.<section> block."""
    node = getattr(cfg.dataset, section)
    return DATASET[node.type](
        cfg,
        node.json_path,
        node.image_dir,
        pseudo_dir=pseudo_dir,
        aug_type=aug_type if aug_type is not None else list(getattr(node, "aug_type", [])),
        num_classes=num_classes or cfg.dataset.num_classes,
    )
