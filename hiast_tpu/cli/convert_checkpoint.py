"""Checkpoint conversion tool: torch .pth <-> Orbax, either direction.

    # torch -> orbax (e.g. to seed training from a published checkpoint)
    python -m hiast_tpu.cli.convert_checkpoint --input HIAST_final.pth --output ckpt_dir

    # orbax -> torch (export for the reference ecosystem)
    python -m hiast_tpu.cli.convert_checkpoint --input work/checkpoints/model_last --output model_last.pth
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="hiast_tpu checkpoint converter")
    p.add_argument("--input", required=True, help=".pth file or Orbax checkpoint dir")
    p.add_argument("--output", required=True, help="Orbax dir or .pth file")
    args = p.parse_args(argv)

    from hiast_tpu.utils.checkpoint import export_pth, load_weights, save_train_state

    variables = load_weights(args.input)
    if args.output.endswith(".pth"):
        export_pth(args.output, variables)
        print(f"wrote torch state_dict to {args.output}")
    else:
        out_dir, name = os.path.split(os.path.normpath(args.output))
        save_train_state(out_dir or ".", name, variables)
        print(f"wrote Orbax checkpoint to {args.output}")


if __name__ == "__main__":
    main()
