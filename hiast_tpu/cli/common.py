"""Shared CLI plumbing: arg parsing, config layering, provenance dumps."""
from __future__ import annotations

import argparse
import os
import tarfile

from hiast_tpu.config import apply_cli_overrides, load_config
from hiast_tpu.registry import populate


def standard_parser(description: str) -> argparse.ArgumentParser:
    """The reference's CLI surface (reference code/train.py:18-28)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config_file", default=None, help="experiment yaml")
    p.add_argument("--setting_file", default=None, help="overlay yaml (e.g. hiast_setting.yaml)")
    p.add_argument("--resume_from", default=None)
    p.add_argument("--pseudo_resume_from", default=None)
    p.add_argument("--pseudo_save_dir", default=None)
    p.add_argument("--work_dir", default=None)
    p.add_argument("--seg_model", default=None)
    p.add_argument("--validate_resume_from", default=None)
    p.add_argument("opts", nargs="*", help="extra key value overrides")
    return p


def build_cfg(args):
    from hiast_tpu.runtime_init import init_runtime

    init_runtime()
    populate()
    cfg = load_config(args.config_file, args.setting_file, freeze=False)
    cfg = apply_cli_overrides(cfg, args)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def dump_provenance(cfg) -> None:
    """Config dump + source tarball into the work dir (reference
    code/train.py:74-79, code/utils/utils.py:186-200)."""
    os.makedirs(cfg.work_dir, exist_ok=True)
    with open(os.path.join(cfg.work_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    archive = os.path.join(cfg.work_dir, "code.tar.gz")
    with tarfile.open(archive, mode="w:gz") as tar:
        for root, _dirs, files in os.walk(pkg_root):
            for name in files:
                if name.endswith((".py", ".yaml", ".yml", ".sh", ".json", ".txt", ".cc", ".h")):
                    full = os.path.join(root, name)
                    tar.add(full, arcname=os.path.relpath(full, os.path.dirname(pkg_root)))
