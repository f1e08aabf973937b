"""Export the eval forward as a serialized StableHLO serving artifact.

The reference has no serving story — deployment means "run validate.py on a
GPU with the repo checked out".  On TPU the natural unit of deployment is an
ahead-of-time lowered XLA program: ``jax.export`` produces a versioned,
self-contained StableHLO module (weights embedded as constants, symbolic
batch dimension) that any JAX/XLA runtime — including non-Python serving
stacks — can load and run without this framework installed.

    python -m hiast_tpu.cli.export_model --config_file configs/validate.yaml \
        --validate_resume_from .../HIAST_final.pth \
        --output model.stablehlo --height 768 --width 1536 --platforms tpu

The exported callable maps uint8 RGB images [b, H, W, 3] (symbolic batch b)
to float32 per-pixel class logits [b, H, W, C] — normalization, the bf16
trunk, and the align_corners bilinear upsample are all inside the program.
Round-trip (deserialize + call == live forward) is tested in
tests/test_export.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from hiast_tpu.cli.common import build_cfg, standard_parser
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.selftrain.steps import normalize_image
from hiast_tpu.utils.checkpoint import load_weights


def build_exported(cfg, height: int, width: int, platforms=("tpu",), weights=None):
    """Lower the eval forward to a jax.export.Exported (cross-platform AOT)."""
    from jax import export

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, height, width, 3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ckpt = weights or cfg.validate.resume_from
    if ckpt:
        variables = load_weights(ckpt, variables)

    def serve(images_uint8):
        # Same preprocessing as every in-framework inference path
        # (evaluation.py val step, pseudo generation): /255 + ImageNet
        # mean/std.  forward() alone only casts to bf16 — exporting it raw
        # would ship an artifact whose predictions are garbage.
        img = normalize_image(images_uint8)
        out = segmentor.forward(variables, img, train=False)
        return out["logits"]

    (spec,) = export.symbolic_args_specs(
        [jax.ShapeDtypeStruct((1, height, width, 3), jnp.uint8)], "b, _, _, _"
    )
    return export.export(jax.jit(serve), platforms=list(platforms))(spec)


def main(argv=None):
    p = standard_parser("hiast_tpu StableHLO serving export")
    p.add_argument("--output", required=True, help="output .stablehlo path")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1536)
    p.add_argument(
        "--platforms", default="tpu",
        help="comma-separated lowering platforms (tpu,cpu,cuda)",
    )
    args = p.parse_args(argv)
    cfg = build_cfg(args)

    exp = build_exported(
        cfg, args.height, args.width, platforms=args.platforms.split(",")
    )
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(
        f"exported {cfg.model.seg_model.type} -> {args.output}: "
        f"{len(blob) / 1e6:.1f} MB, platforms={exp.platforms}, "
        f"in={exp.in_avals}, out={exp.out_avals}"
    )


if __name__ == "__main__":
    main()
