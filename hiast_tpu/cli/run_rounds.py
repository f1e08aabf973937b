"""The 3-round self-training driver (reference code/train.sh).

Round k: generate pseudo labels from round k-1's EMA checkpoint, then train
the student resumed from round k-1's STUDENT checkpoint.  State crosses
rounds via the filesystem only (checkpoints, pseudo-label PNG dir, stats
files) — the same contract as the reference (SURVEY §3.5).

Re-running the driver after an interruption resumes instead of redoing
finished work (a superset of ``code/train.sh``, which restarts manually):
a round whose ``model_last`` is at ``total_iter`` is skipped outright;
one interrupted mid-training (e.g. the preemption checkpoint, SIGTERM ->
trainers.py) continues FULL-state via ``train.resume_from``; pseudo-label
dirs skip when complete and are cleared+regenerated when partial
(pseudo/generator.py:prepare_dirs).

    python -m hiast_tpu.cli.run_rounds --work_dir ../log/gtav-to-cityscapes/hiast \
        --warmup_ckpt ../pretrained/resume_from.pth \
        --warmup_pseudo_ckpt ../pretrained/pseudo_resume_from.pth
"""
from __future__ import annotations

import argparse
import os

from hiast_tpu.cli import generate_pseudo_labels, train
from hiast_tpu.utils.checkpoint import load_step


def _round_total_iter(cfg_file: str, setting: str) -> int:
    """The round's schedule length, from the SAME config layering train.main
    applies (config file + setting overlay) — the resume decision must see
    the value training will actually run with."""
    from hiast_tpu.config import load_config

    return int(load_config(cfg_file, setting, freeze=False).train.total_iter)


def main(argv=None):
    p = argparse.ArgumentParser(description="hiast_tpu 3-round driver")
    p.add_argument("--work_dir", required=True)
    p.add_argument("--warmup_ckpt", required=True, help="student warmup checkpoint")
    p.add_argument("--warmup_pseudo_ckpt", required=True, help="EMA/pseudo warmup checkpoint")
    p.add_argument(
        "--configs_dir",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs"),
    )
    p.add_argument("--setting_file", default=None, help="defaults to hiast_setting.yaml")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    setting = args.setting_file or os.path.join(args.configs_dir, "hiast_setting.yaml")
    pseudo_ckpt = args.warmup_pseudo_ckpt
    student_ckpt = args.warmup_ckpt

    for k in range(1, args.rounds + 1):
        cfg_file = os.path.join(args.configs_dir, f"sl_{k}.yaml")
        round_dir = os.path.join(args.work_dir, f"sl_{k}")
        pseudo_dir = os.path.join(round_dir, "pseudo_label", "gray_label")
        ckpt_dir = os.path.join(round_dir, "checkpoints")

        # Round-level resume: model_last carries the step it was saved at
        # (both the end-of-round save and the SIGTERM preemption checkpoint
        # write it).  step >= total_iter -> the round's training is DONE;
        # 0 < step < total_iter -> continue it FULL-state (optimizer, EMA,
        # schedule position) via train.resume_from; no step -> fresh round.
        done_step = load_step(ckpt_dir, "model_last")
        total_iter = _round_total_iter(cfg_file, setting)
        if done_step is not None and done_step >= total_iter:
            print(f"%% round {k}: training already complete "
                  f"(model_last at step {done_step} >= {total_iter}); skipping")
        else:
            # pseudo-gen skips idempotently when complete and recovers a
            # partially-written dir (pseudo/generator.py:prepare_dirs); when
            # training is mid-round the labels are necessarily complete.
            generate_pseudo_labels.main([
                "--config_file", cfg_file,
                "--pseudo_resume_from", pseudo_ckpt,
                "--pseudo_save_dir", pseudo_dir,
            ])
            if done_step is not None:
                print(f"%% round {k}: resuming interrupted training from "
                      f"step {done_step} (full state)")
                resume_args = ["--resume_from", os.path.join(ckpt_dir, "model_last")]
            else:
                # train.init_from, NOT --resume_from: round k-1's model_last
                # is a FULL-state Orbax checkpoint (step == total_iter);
                # resuming it would start round k past its schedule and train
                # zero iterations.  The cross-round contract is weights-only +
                # a fresh schedule (reference code/train.sh re-launches
                # train.py per round).
                resume_args = ["train.init_from", student_ckpt]
            train.main([
                "--config_file", cfg_file,
                "--setting_file", setting,
                "--pseudo_save_dir", pseudo_dir,
                "--work_dir", round_dir,
            ] + resume_args)

        pseudo_ckpt = os.path.join(ckpt_dir, "ema_model_last")
        student_ckpt = os.path.join(ckpt_dir, "model_last")


if __name__ == "__main__":
    main()
