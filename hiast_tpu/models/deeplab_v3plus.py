"""DeepLab-v3+ segmentation head on the OS8 ResNet backbone (Flax, NHWC).

The reference ships only DeepLab-v2 but carries an explicit hook for a
V3+-style decoder — the backbone's unused ``is_return_low`` low-level-feature
return (reference: code/sseg/models/modules/resnet.py:176-190).  This module
makes that latent capability real, TPU-first:

- ASPP-v3: 1x1 + three dilated 3x3 convs (rates 12/24/36 at output stride 8)
  + global image pooling, each 256-ch with BN+ReLU, concatenated and
  projected to 256.
- Decoder: the stride-4 low-level feature is reduced to 48 channels, the
  ASPP output is bilinearly upsampled 2x (MXU interpolation matmuls,
  ops/resize.py) and refined by two 3x3 convs before the classifier.

Logits come out at output stride 4 (vs the v2 head's stride 8); the
segmentor's final upsample to input resolution is shared with v2.  Drop-in
via ``model.seg_model.type: DeepLab_V3Plus`` — every trainer, pseudo-label
policy and the validator dispatch through the same SEG_MODEL registry.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hiast_tpu.models.norm import TorchBatchNorm
from hiast_tpu.models.resnet import BN_EPS, DEFAULT_BN_MOMENTUM, ResNetOS8
from hiast_tpu.ops.resize import bilinear_resize
from hiast_tpu.registry import SEG_MODEL


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_axis_name: str | None = None):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = TorchBatchNorm(
            name="bn",
            use_running_average=not train,
            momentum=DEFAULT_BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            axis_name=bn_axis_name if train else None,
        )(x)
        return nn.relu(x)


class ASPPV3(nn.Module):
    """1x1 + dilated 3x3 branches + image-level pooling, concat -> 256."""

    features: int = 256
    dilations: Sequence[int] = (12, 24, 36)  # OS8 rates (2x the OS16 6/12/18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_axis_name: str | None = None):
        branches = [
            _ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="branch0")(
                x, train=train, bn_axis_name=bn_axis_name
            )
        ]
        for i, d in enumerate(self.dilations):
            branches.append(
                _ConvBNReLU(
                    self.features, kernel=3, dilation=d, dtype=self.dtype,
                    name=f"branch{i + 1}",
                )(x, train=train, bn_axis_name=bn_axis_name)
            )
        # image-level pooling: mean in fp32 (bf16 reductions over the full
        # spatial grid lose precision), broadcast back over the grid
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        pooled = _ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="pool_proj")(
            pooled.astype(x.dtype), train=train, bn_axis_name=bn_axis_name
        )
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        # no dropout: the HIAST recipes fine-tune at lr<=3e-6 where the
        # reference's own head (ASPP-v2) also runs dropout-free
        return _ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="project")(
            y, train=train, bn_axis_name=bn_axis_name
        )


@SEG_MODEL.register("DeepLab_V3Plus")
class DeepLabV3Plus(nn.Module):
    num_classes: int = 19
    output_dim: int = 256  # ASPP / decoder width
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    low_level_dim: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        bn_axis_name: str | None = None,
        return_representation: bool = False,
    ):
        feat, low = ResNetOS8(layers=self.backbone_layers, dtype=self.dtype, name="backbone")(
            x, train=train, bn_axis_name=bn_axis_name, return_low=True
        )
        y = ASPPV3(features=self.output_dim, dtype=self.dtype, name="aspp")(
            feat, train=train, bn_axis_name=bn_axis_name
        )
        low = _ConvBNReLU(
            self.low_level_dim, kernel=1, dtype=self.dtype, name="low_proj"
        )(low, train=train, bn_axis_name=bn_axis_name)
        # stride 8 -> stride 4 (interpolation matmuls; fp32 out, recast)
        y = bilinear_resize(
            y.astype(jnp.float32), low.shape[1], low.shape[2]
        ).astype(self.dtype)
        y = jnp.concatenate([y, low], axis=-1)
        y = _ConvBNReLU(self.output_dim, kernel=3, dtype=self.dtype, name="decoder0")(
            y, train=train, bn_axis_name=bn_axis_name
        )
        y = _ConvBNReLU(self.output_dim, kernel=3, dtype=self.dtype, name="decoder1")(
            y, train=train, bn_axis_name=bn_axis_name
        )
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.01), name="classifier",
        )(y)
        out = {"logits": logits, "backbone": feat}
        if return_representation:
            out["representation"] = y  # the decoder feature IS the 256-d rep
        return out
