"""On-chip micro-validates for the two remaining dataset protocols.

The 9-class Oxford RobotCar path (RGBA channel-0 labels, 19->9 remap) and
the SYNTHIA 16/13-class reporting protocol are covered by CPU tests
(tests/test_oxford_scenario.py, ops.metrics.synthia_mious); this script
closes the "compiles and runs on TPU too" gap (VERDICT r3 #9) by driving
`cli/validate.py` for real on the default (tunneled TPU) platform over tiny
PNG fixtures:

  1. Oxford: num_classes=9 trunk, RGBA val labels -> expects a finite mIoU
     over a 9-slot IoU vector;
  2. SYNTHIA->Cityscapes: source.type='SYNTHIA' -> expects miou_16/miou_13
     alongside the 19-slot IoU (reference code/workflows/validator.py:108-115).

The checkpoint is a freshly-initialized tiny trunk saved through the
production Orbax writer — the mIoU VALUE is meaningless; what is being
verified is that the remap tables, palettes, protocol arithmetic, and the
compiled eval program run end-to-end on TPU hardware.

Run from the repo root:  python scripts/validate_protocols_tpu.py
(one TPU process at a time; ~2-4 min with a warm compile cache)
"""
from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/hiast_protocols"


def write_fixtures() -> None:
    from PIL import Image

    from hiast_tpu.data import remap

    rng = np.random.default_rng(7)
    shutil.rmtree(ROOT, ignore_errors=True)

    # Oxford val: RGBA labels, class ids in channel 0
    os.makedirs(f"{ROOT}/oxford/val")
    manifest = []
    for i in range(4):
        img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        lbl = np.zeros((64, 96, 4), np.uint8)
        lbl[..., 0] = rng.choice(
            list(remap.OXFORD_ID_MAP.keys()) + [0], size=(64, 96)
        )
        Image.fromarray(img).save(f"{ROOT}/oxford/val/v{i}.png")
        Image.fromarray(lbl, mode="RGBA").save(f"{ROOT}/oxford/val/v{i}_lbl.png")
        manifest.append(
            {"image_name": f"val/v{i}.png", "mask_name": f"val/v{i}_lbl.png"}
        )
    with open(f"{ROOT}/oxford_val.json", "w") as f:
        json.dump(manifest, f)

    # Cityscapes val (SYNTHIA scenario): train-id labels, 255 for void
    os.makedirs(f"{ROOT}/city/val")
    manifest = []
    for i in range(4):
        img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        lbl = np.where(
            rng.random(size=(64, 96)) < 0.1, 255, rng.integers(0, 19, size=(64, 96))
        ).astype(np.uint8)
        Image.fromarray(img).save(f"{ROOT}/city/val/v{i}.png")
        Image.fromarray(lbl, mode="L").save(f"{ROOT}/city/val/v{i}_lbl.png")
        manifest.append(
            {"image_name": f"val/v{i}.png", "mask_name": f"val/v{i}_lbl.png"}
        )
    with open(f"{ROOT}/city_val.json", "w") as f:
        json.dump(manifest, f)


def write_ckpt(num_classes: int, name: str) -> str:
    import jax
    import jax.numpy as jnp

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.utils.checkpoint import save_train_state

    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.dataset.num_classes = num_classes
    cfg.model.seg_model.backbone_layers = [1, 1, 1, 1]
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    v = segmentor.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    save_train_state(
        f"{ROOT}/ckpts", name,
        {"params": v["params"], "batch_stats": v["batch_stats"]},
    )
    return f"{ROOT}/ckpts/{name}"


def write_cfg(name: str, body: str) -> str:
    path = f"{ROOT}/{name}"
    with open(path, "w") as f:
        f.write(body)
    return path


def main(smoke: bool = False) -> None:
    import jax

    if smoke:  # mechanics check off-TPU: the env force-appends the axon
        # platform, so override AFTER import like tests/conftest.py does
        jax.config.update("jax_platforms", "cpu")
    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    print(f"## platform={jax.devices()[0].platform}", flush=True)
    write_fixtures()

    from hiast_tpu.cli import validate

    results = {}

    # --- Oxford 9-class protocol ---
    ckpt = write_ckpt(9, "oxford")
    cfg = write_cfg("oxford.yaml", f"""
model:
  type: 'SelfTrainingSegmentor'
  seg_model:
    backbone_layers: [1, 1, 1, 1]
dataset:
  num_classes: 9
  val:
    type: 'Oxford'
    json_path: '{ROOT}/oxford_val.json'
    image_dir: '{ROOT}/oxford'
    resize_size: [ 64, 96 ]
validate:
  batch_size: 2
""")
    r = validate.main(["--config_file", cfg, "--validate_resume_from", ckpt])
    assert len(r["iou"]) == 9 and np.isfinite(r["miou"]), r
    results["oxford_9cls"] = {"miou": round(float(r["miou"]), 4), "classes": 9}

    # --- SYNTHIA 16/13 protocol ---
    ckpt = write_ckpt(19, "synthia")
    cfg = write_cfg("synthia.yaml", f"""
model:
  type: 'SelfTrainingSegmentor'
  seg_model:
    backbone_layers: [1, 1, 1, 1]
dataset:
  num_classes: 19
  source:
    type: 'SYNTHIA'
  val:
    type: 'Cityscapes'
    json_path: '{ROOT}/city_val.json'
    image_dir: '{ROOT}/city'
    resize_size: [ 64, 96 ]
validate:
  batch_size: 2
""")
    r = validate.main(["--config_file", cfg, "--validate_resume_from", ckpt])
    assert "miou_16" in r and "miou_13" in r, r
    assert np.isfinite(r["miou_16"]) and np.isfinite(r["miou_13"]), r
    results["synthia_protocol"] = {
        "miou_16": round(float(r["miou_16"]), 4),
        "miou_13": round(float(r["miou_13"]), 4),
    }

    print("PROTOCOLS_RESULT " + json.dumps(results), flush=True)
    print("## PASS: both protocol paths ran end-to-end on this platform")


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
