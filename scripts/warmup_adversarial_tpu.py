"""AdversarialWarmupTrainer on the REAL chip — the one trainer with no
TPU evidence before round 5 (VERDICT r4 missing #3): a micro warmup run
through the real ``cli/train.py`` with the discriminator ENABLED, i.e. the
dual-optimizer G+D jit program (selftrain/steps.py:make_adversarial_step) +
``FCDiscriminator`` + the AdvEnt entropy input on hardware.

Reference analog: code/workflows/trainer/adversarial_warmup_trainer.py:13-37
(its warmup stage before self-training rounds).  Synthetic source/target
domains (no data on this box); the point is hardware execution + s/iter +
finite losses, recorded in PERF.md like the protocol micro-validations.

Run: python scripts/warmup_adversarial_tpu.py [--iters N] [--root DIR]
     (one TPU process at a time; ~4-8 min incl. compiles)
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_rounds_tpu import write_domains  # noqa: E402 (sibling script)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/hiast_adv_warmup")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop", default="256x512")
    args = p.parse_args()
    ch, cw = (int(v) for v in args.crop.split("x"))

    if os.path.isdir(args.root):
        shutil.rmtree(args.root)
    os.makedirs(args.root)
    write_domains(args.root, ch, cw, n_src=12, n_src_val=2, n_tgt=12, n_tgt_val=2)

    cfg_yaml = f"""
trainer: 'AdversarialWarmupTrainer'
model:
  type: 'AdversarialWarmupSegmentor'
  predictor:
    ent_loss:
      weight: 1.0
  discriminator:
    is_enabled: True
    is_entropy_input: True   # AdvEnt-style: D sees the entropy map
dataset:
  num_classes: 19
  crop_size: [{ch}, {cw}]
  source:
    type: 'GTAV'
    json_path: '{args.root}/gtav_train.json'
    image_dir: '{args.root}/gtav'
    aug_type: [ 'MS' ]
  target:
    type: 'Cityscapes'
    json_path: '{args.root}/city_train.json'
    image_dir: '{args.root}/city'
    aug_type: [ 'MS' ]
  val:
    type: 'Cityscapes'
    json_path: '{args.root}/city_val.json'
    image_dir: '{args.root}/city'
    resize_size: [ {ch}, {cw} ]
train:
  batch_size: {args.batch}
  total_iter: {args.iters}
  iter_report: {max(args.iters // 3, 1)}
  iter_val: {args.iters}
validate:
  batch_size: 2
"""
    cfg_file = os.path.join(args.root, "adv_warmup.yaml")
    with open(cfg_file, "w") as f:
        f.write(cfg_yaml)
    work_dir = os.path.join(args.root, "work")

    from hiast_tpu.cli import train

    t0 = time.time()
    train.main(["--config_file", cfg_file, "--work_dir", work_dir])
    wall = time.time() - t0

    # pull the recorded losses + s/iter back out of the run's own log
    log_text = open(os.path.join(work_dir, "train.log")).read()
    losses = dict(re.findall(r"(\w*_?loss): ([0-9.eE+-]+)", log_text))
    sec_iter = re.findall(r"([0-9.]+) s/iter", log_text)
    result = {
        "trainer": "AdversarialWarmupTrainer",
        "iters": args.iters,
        "batch": args.batch,
        "crop": [ch, cw],
        "wall_s": round(wall, 1),
        "s_per_iter_last": float(sec_iter[-1]) if sec_iter else None,
        "losses_last": {k: float(v) for k, v in losses.items()},
        "finite": all(
            v == v and abs(float(v)) != float("inf")
            for v in map(float, losses.values())
        ),
        "checkpoints": sorted(os.listdir(os.path.join(work_dir, "checkpoints"))),
    }
    print("ADV_WARMUP_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
