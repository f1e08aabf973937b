"""DeepLab-v2 segmentation head on the OS8 ResNet backbone (Flax, NHWC).

Re-design of the reference model (reference:
code/sseg/models/modules/seg_models/deeplab_v2.py:8-69): ASPP-v2 = sum of
four parallel 3x3 convs at dilations 6/12/18/24 over the 2048-d backbone
feature, plus a 1x1 256-d ``representation`` head kept for checkpoint parity
(the reference computes it but never returns it; we skip the compute unless
asked).  Logit upsampling to input resolution lives in the segmentor step
functions, not here, so eval and train steps control fusion.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hiast_tpu.models.resnet import ResNetOS8
from hiast_tpu.registry import SEG_MODEL


class ASPPV2(nn.Module):
    """Sum of parallel dilated 3x3 convs (with bias)."""

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(
                self.num_classes,
                (3, 3),
                padding=((d, d), (d, d)),
                kernel_dilation=(d, d),
                use_bias=True,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name=f"conv2d_list_{i}",
            )(x)
            out = y if out is None else out + y
        return out


@SEG_MODEL.register("DeepLab_V2")
class DeepLabV2(nn.Module):
    num_classes: int = 19
    output_dim: int = 256
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        bn_axis_name: str | None = None,
        return_representation: bool = False,
    ):
        feat = ResNetOS8(layers=self.backbone_layers, dtype=self.dtype, name="backbone")(
            x, train=train, bn_axis_name=bn_axis_name
        )
        logits = ASPPV2(num_classes=self.num_classes, dtype=self.dtype, name="aspp")(feat)
        out = {"logits": logits, "backbone": feat}
        if return_representation:
            out["representation"] = nn.Conv(
                self.output_dim, (1, 1), dtype=self.dtype, name="representation"
            )(feat)
        return out


class FCDiscriminator(nn.Module):
    """Fully-convolutional domain discriminator.

    Five stride-2 4x4 convs (ndf 64 -> 512 -> 1) with LeakyReLU(0.2)
    (reference: code/sseg/models/modules/discriminator.py:7-29).
    """

    ndf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, 1]
        for i, w in enumerate(widths):
            name = "classifier" if i == len(widths) - 1 else f"conv{i + 1}"
            x = nn.Conv(
                w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=name,
            )(x)
            if i < len(widths) - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


REMAT_MODES = ("full", "dots", "blocks", "blocks_dots")


def validate_remat_mode(mode: str) -> str:
    """Single source of truth for ``runtime.remat_mode`` values (used at
    model build for SegFormer and at trace time in segmentors.raw_apply)."""
    if mode not in REMAT_MODES:
        raise ValueError(
            f"unknown runtime.remat_mode {mode!r}; expected one of "
            + ", ".join(repr(m) for m in REMAT_MODES)
        )
    return mode


def build_seg_model(cfg, dtype=jnp.float32, backbone_layers=None):
    """Instantiate the configured segmentation trunk (registry-dispatched).

    ``backbone_layers`` overrides the block depths (tests use tiny trunks).
    """
    model_cls = SEG_MODEL[cfg.model.seg_model.type]
    kwargs = dict(
        num_classes=cfg.dataset.num_classes,
        output_dim=cfg.model.seg_model.output_dim,
        dtype=dtype,
    )
    if cfg.model.seg_model.type.startswith("SegFormer"):
        # block-level remat modes live inside the transformer (see
        # models/segformer.py:MixTransformer.remat); trunk-level modes
        # ('full'/'dots') are applied outside by segmentors.raw_apply
        mode = validate_remat_mode(getattr(cfg.runtime, "remat_mode", "full"))
        on = getattr(cfg.runtime, "remat", False)
        kwargs["remat"] = mode if (on and mode in ("blocks", "blocks_dots")) else "none"
        fused = getattr(cfg.runtime, "fused_attention", False)
        if isinstance(fused, (list, tuple)):
            # per-stage mix (see segformer.py:MixTransformer): a 4-list of
            # flags routes each MiT stage to its measured winner
            fused = tuple(bool(f) for f in fused)
            assert len(fused) == 4, (
                f"runtime.fused_attention as a list needs 4 per-stage flags, "
                f"got {fused!r}"
            )
        fused_any = any(fused) if isinstance(fused, tuple) else bool(fused)
        if fused_any:
            # The fused kernel partitions over the batch dim (dp) and the
            # query-token dim (sp: rows shard, resident K/V replicate, dK/dV
            # psum — ops/pallas/attention.py).  The 'model' axis would split
            # heads, and stage 1 of every MiT variant has a single head, so
            # there is nothing to split: fail loudly, not slowly.
            if getattr(cfg.runtime.mesh, "model", 1) not in (1, -1):
                raise ValueError(
                    "runtime.fused_attention requires runtime.mesh.model"
                    " == 1 (the Pallas attention kernel partitions over"
                    " batch and query tokens, not heads); use the default"
                    " einsum attention with tensor parallelism"
                )
        kwargs["fused_attention"] = fused
    if backbone_layers is None and "backbone_layers" in cfg.model.seg_model:
        backbone_layers = cfg.model.seg_model.backbone_layers
    if backbone_layers is not None:
        kwargs["backbone_layers"] = tuple(backbone_layers)
    return model_cls(**kwargs)
