"""Standalone evaluation entry point (reference code/validate.py).

    python -m hiast_tpu.cli.validate --config_file configs/validate.yaml \
        --validate_resume_from .../HIAST_final.pth
"""
from __future__ import annotations

import jax.numpy as jnp

from hiast_tpu.cli.common import build_cfg, standard_parser
from hiast_tpu.data.datasets import build_dataset
from hiast_tpu.data.pipeline import BatchIterator
from hiast_tpu.evaluation import Validator
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.utils.checkpoint import load_weights


def main(argv=None):
    args = standard_parser("hiast_tpu validator").parse_args(argv)
    cfg = build_cfg(args)

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(__import__("jax").random.PRNGKey(0))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    assert cfg.validate.resume_from, "--validate_resume_from (or validate.resume_from) required"
    variables = load_weights(cfg.validate.resume_from, variables)

    dataset = build_dataset(cfg, "val", aug_type=[])
    data_iter = BatchIterator(
        dataset, cfg.validate.batch_size, shuffle=False, drop_last=False
    )
    result = Validator(cfg, segmentor, variables).run(data_iter)
    iou_str = {c: round(float(v), 4) for c, v in enumerate(result["iou"])}
    if "miou_16" in result:
        print(
            f"miou_16: {result['miou_16']:.4f}, miou_13: {result['miou_13']:.4f}, iou: {iou_str}"
        )
    else:
        print(f"miou: {result['miou']:.4f}, iou: {iou_str}")
    return result


if __name__ == "__main__":
    main()
