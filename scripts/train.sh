#!/usr/bin/env bash
# 3-round HIAST pipeline — shell-compatible wrapper around the Python round
# driver, mirroring the reference's code/train.sh usage.
set -euo pipefail

work_dir=${1:-../log/gtav-to-cityscapes/hiast}
warmup_ckpt=${2:-../pretrained/gtav-to-cityscapes/resume_from.pth}
warmup_pseudo_ckpt=${3:-../pretrained/gtav-to-cityscapes/pseudo_resume_from.pth}

python -m hiast_tpu.cli.run_rounds \
    --work_dir "$work_dir" \
    --warmup_ckpt "$warmup_ckpt" \
    --warmup_pseudo_ckpt "$warmup_pseudo_ckpt"
