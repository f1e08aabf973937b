"""Cityscapes -> Oxford RobotCar scenario (9-class path) on PNG fixtures:
19->9 remap, RGBA channel-0 labels, unlabeled train split -> all-255, OMS
aug, 9-class validation."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from hiast_tpu.config import default_config
from hiast_tpu.data import remap
from hiast_tpu.data.datasets import build_dataset
from hiast_tpu.registry import populate

populate()
RNG = np.random.default_rng(41)


@pytest.fixture
def oxford_fixture(tmp_path):
    root = tmp_path / "oxford"
    os.makedirs(root / "train")
    os.makedirs(root / "val")
    os.makedirs(root / "val_anno")
    train_manifest, val_manifest = [], []
    for i in range(3):
        img = RNG.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / f"t{i}.png")
        # unlabeled: mask path not ending in .png (reference oxford_dataset.py:17)
        train_manifest.append(
            {"image_name": f"train/t{i}.png", "mask_name": f"train/t{i}.png.nolabel"}
        )
    for i in range(2):
        img = RNG.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        lbl = np.zeros((48, 64, 4), np.uint8)
        lbl[..., 0] = RNG.choice(list(remap.OXFORD_ID_MAP.keys()) + [0], size=(48, 64))
        Image.fromarray(img).save(root / "val" / f"v{i}.png")
        Image.fromarray(lbl, mode="RGBA").save(root / "val_anno" / f"v{i}.png")
        val_manifest.append(
            {"image_name": f"val/v{i}.png", "mask_name": f"val_anno/v{i}.png"}
        )
    (tmp_path / "oxford_train.json").write_text(json.dumps(train_manifest))
    (tmp_path / "oxford_val.json").write_text(json.dumps(val_manifest))
    return tmp_path


def _cfg(tmp_path):
    cfg = default_config()
    cfg.dataset.num_classes = 9
    cfg.dataset.target.type = "Oxford"
    cfg.dataset.target.json_path = str(tmp_path / "oxford_train.json")
    cfg.dataset.target.image_dir = str(tmp_path / "oxford")
    cfg.dataset.val.type = "Oxford"
    cfg.dataset.val.json_path = str(tmp_path / "oxford_val.json")
    cfg.dataset.val.image_dir = str(tmp_path / "oxford")
    return cfg


def test_unlabeled_train_split_is_ignore(oxford_fixture):
    cfg = _cfg(oxford_fixture)
    ds = build_dataset(cfg, "target", aug_type=[])
    _, lbl, _ = ds.load_data(0)
    assert (lbl == 255).all()


def test_val_rgba_labels_remap_to_9(oxford_fixture):
    cfg = _cfg(oxford_fixture)
    ds = build_dataset(cfg, "val", aug_type=[])
    _, lbl, _ = ds.load_data(0)
    valid = lbl[lbl != 255]
    assert valid.size > 0 and valid.max() < 9


def test_cityscapes_19_to_9_remap_in_source_role(oxford_fixture, tmp_path):
    # a Cityscapes-train-ids label read with num_classes=9 applies the 9-class remap
    from hiast_tpu.data.datasets import CityscapesDataset

    img = RNG.integers(0, 255, size=(32, 48, 3)).astype(np.uint8)
    lbl19 = RNG.integers(0, 19, size=(32, 48)).astype(np.uint8)
    os.makedirs(tmp_path / "c")
    Image.fromarray(img).save(tmp_path / "c" / "i.png")
    Image.fromarray(lbl19, mode="L").save(tmp_path / "c" / "l.png")
    (tmp_path / "cm.json").write_text(
        json.dumps([{"image_name": "c/i.png", "mask_name": "c/l.png"}])
    )
    cfg = _cfg(oxford_fixture)
    ds = CityscapesDataset(cfg, str(tmp_path / "cm.json"), str(tmp_path), aug_type=["OMS"], num_classes=9)
    _, lbl, _ = ds.load_data(0)
    want = remap.remap_label(lbl19, "Cityscapes9")
    np.testing.assert_array_equal(lbl, want)
    item = ds.get_item(0, np.random.default_rng(0))
    assert item["images"].shape == (768, 1024, 3)  # OMS fixed output


def test_oxford_9class_iou_protocol():
    from hiast_tpu.ops.metrics import intersection_and_union
    import jax.numpy as jnp

    pred = RNG.integers(0, 9, size=(2, 16, 16)).astype(np.int32)
    tgt = np.where(RNG.random(size=(2, 16, 16)) < 0.3, 255, RNG.integers(0, 9, size=(2, 16, 16))).astype(np.int32)
    inter, union = intersection_and_union(jnp.asarray(pred), jnp.asarray(tgt), 9)
    assert inter.shape == (9,)
