"""Training entry point (reference code/train.py).

No process spawning / port search: one program drives the whole mesh.

    python -m hiast_tpu.cli.train --config_file configs/sl_1.yaml \
        --setting_file configs/hiast_setting.yaml \
        --resume_from .../resume_from.pth \
        --pseudo_save_dir .../gray_label --work_dir .../sl_1
"""
from __future__ import annotations

from hiast_tpu.cli.common import build_cfg, dump_provenance, standard_parser
from hiast_tpu.registry import TRAINER


def main(argv=None):
    args = standard_parser("hiast_tpu trainer").parse_args(argv)
    cfg = build_cfg(args)
    dump_provenance(cfg)
    trainer = TRAINER[cfg.trainer](cfg)
    trainer.run()


if __name__ == "__main__":
    main()
