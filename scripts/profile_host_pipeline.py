"""Production-scale host input-pipeline benchmark (VERDICT r2 missing #3).

Measures the real decode + MS-crop + HPA batch-assembly cost at Cityscapes
resolution (2048x1024) through the actual `Cityscapes` dataset +
`infinite_batches` path, and compares against the measured TPU step budget
(0.295 s/iter at batch 8 = 27.1 imgs/s): on an N-core TPU host the pipeline
keeps up iff per-image host cost <= N * 0.0369 s.

This box has ONE core, so the verdict is expressed as "cores needed", not
raw batches/s.  Run:

    python scripts/profile_host_pipeline.py [--n 12] [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_S_PER_ITER = 0.295  # measured HIAST step, batch 8 (PERF.md)
BATCH = 8


def make_fixture(root: str, n: int, h: int = 1024, w: int = 2048):
    from PIL import Image

    img_dir = os.path.join(root, "city", "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    manifest = []
    for i in range(n):
        # blobby scenes compress like real photos do NOT — use smooth noise
        # so the PNG entropy is at least photo-like rather than white noise
        base = rng.normal(size=(h // 32, w // 32, 3)).astype(np.float32)
        import cv2

        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
        img = ((img - img.min()) / (np.ptp(img) + 1e-6) * 255).astype(np.uint8)
        img += rng.integers(0, 24, size=img.shape, dtype=np.uint8)  # sensor noise
        lbl = rng.integers(0, 19, size=(h, w)).astype(np.uint8)
        lbl = cv2.resize(lbl, (w, h), interpolation=cv2.INTER_NEAREST)
        Image.fromarray(img).save(os.path.join(img_dir, f"t_{i}.png"))
        Image.fromarray(lbl, mode="L").save(os.path.join(img_dir, f"t_{i}_lbl.png"))
        manifest.append(
            {"image_name": f"images/t_{i}.png", "mask_name": f"images/t_{i}_lbl.png"}
        )
    mpath = os.path.join(root, "train.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return mpath, os.path.join(root, "city")


def time_components(ds, n: int):
    """Per-image cost split: decode only vs full get_item (aug+paste)."""
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    for i in range(n):
        ds.load_data(i % len(ds))
    t_decode = (time.perf_counter() - t0) / n

    t0 = time.perf_counter()
    for i in range(n):
        ds.get_item(i % len(ds), rng)
    t_item = (time.perf_counter() - t0) / n
    return t_decode, t_item


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--root", default="/tmp/hiast_host_bench")
    args = ap.parse_args()

    from hiast_tpu.config import default_config
    from hiast_tpu.data.datasets import build_dataset
    from hiast_tpu.data.pipeline import infinite_batches
    from hiast_tpu.registry import PREPROCESSOR, populate

    populate()
    if not os.path.isdir(args.root):
        os.makedirs(args.root)
    mpath = os.path.join(args.root, "train.json")
    if not os.path.exists(mpath):
        print(f"building {args.n} 2048x1024 PNG fixtures (one-time)...")
        make_fixture(args.root, args.n)

    cfg = default_config()
    cfg.dataset.num_classes = 19
    cfg.dataset.target.type = "Cityscapes"
    cfg.dataset.target.json_path = mpath
    cfg.dataset.target.image_dir = os.path.join(args.root, "city")
    cfg.dataset.target.aug_type = ["MS"]  # flip+crop(341-950)+resize 512x1024
    cfg.preprocessor.type = "CopyPaste"

    ds = build_dataset(cfg, "target")
    # HPA with uniform stats (donors from the same set; file_to_idx keys on
    # basenames)
    ds.samples_with_class = {
        c: [f"t_{i}.png" for i in range(args.n)] for c in range(19)
    }
    cv = np.full(19, 0.9, np.float32)
    ds.set_preprocessor(PREPROCESSOR["CopyPaste"](cfg, ds, cv))

    t_decode, t_item = time_components(ds, max(args.iters, 4))
    print(f"per-image: decode {t_decode*1e3:.1f} ms, full get_item {t_item*1e3:.1f} ms")

    stream = infinite_batches(ds, BATCH, seed=0, num_workers=1)
    next(stream)  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        next(stream)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"single-worker batch-{BATCH} assembly: {dt:.3f} s/batch "
          f"({BATCH/dt:.1f} imgs/s)")

    need = t_item * (BATCH / STEP_S_PER_ITER)
    print(
        f"VERDICT: step budget {STEP_S_PER_ITER:.3f} s/iter at batch {BATCH} "
        f"needs {BATCH/STEP_S_PER_ITER:.1f} imgs/s; per-image host cost "
        f"{t_item*1e3:.1f} ms -> {need:.1f} worker cores keep up "
        f"(TPU hosts have 100+)."
    )


if __name__ == "__main__":
    main()
