"""ResNet backbone (Flax, NHWC) with DeepLab output-stride-8 dilation.

TPU-native re-design of the reference's torchvision-style ResNet-101
(reference: code/sseg/models/modules/resnet.py:58-190) and the
``_nostride_dilate`` surgery applied by DeepLab-v2 (reference:
code/sseg/models/modules/seg_models/deeplab_v2.py:42-56):

- layer3: the stride-2 3x3 conv of block 0 becomes stride 1 / dilation 1
  (``dilate // 2``); every other 3x3 conv gets dilation 2; the block-0
  downsample 1x1 loses its stride.
- layer4: block-0 3x3 conv becomes stride 1 / dilation 2; the rest dilation 4.

This yields output stride 8 with a 2048-channel feature map.

Module/parameter names deliberately mirror the torch layout
(``layer3.5.conv2`` -> ``layer3_5/conv2``) so published ``.pth`` checkpoints
convert mechanically (see models/convert.py).

BatchNorm semantics (pinned by tests/test_train_parity.py — do NOT "fix"
this to eval-mode BN): the reference's ``freeze_bn`` only sets
``requires_grad=False`` on the BN affine params (reference:
code/utils/utils.py:60-65); BN stays in TRAIN mode during training, so batch
statistics are still computed from each batch and the running buffers keep
updating (and feed the EMA teacher's eval-mode forward).  We mirror that:
every train step runs BN with batch stats (``train=True``) and mutates
``batch_stats``, while the optimizer pins the scale/bias leaves with
``set_to_zero`` (train_state.py).  Under a sharded batch, passing
``bn_axis_name='data'`` pmean-s the moments across replicas — the TPU
equivalent of apex ``convert_syncbn_model`` (reference:
code/utils/utils.py:103-105).  TorchBatchNorm (models/norm.py) reproduces
torch's exact running-update rule (unbiased variance, momentum 0.1).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hiast_tpu.models.norm import TorchBatchNorm

DEFAULT_BN_MOMENTUM = 0.9  # torch momentum 0.1 == flax momentum 0.9
BN_EPS = 1e-5


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride/dilation) -> 1x1 with residual, expansion 4."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_axis_name: str | None = None):
        def bn(name):
            return TorchBatchNorm(
                name=name,
                use_running_average=not train,
                momentum=DEFAULT_BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                axis_name=bn_axis_name if train else None,
            )

        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((self.dilation, self.dilation), (self.dilation, self.dilation)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = bn("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.has_downsample:
            identity = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetOS8(nn.Module):
    """Dilated ResNet, output stride 8 (DeepLab-v2 backbone)."""

    layers: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        bn_axis_name: str | None = None,
        return_low: bool = False,
    ):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = TorchBatchNorm(
            name="bn1",
            use_running_average=not train,
            momentum=DEFAULT_BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            axis_name=bn_axis_name if train else None,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # (planes, first-block stride, first-block dilation, rest dilation)
        stage_spec = [
            (64, 1, 1, 1),
            (128, 2, 1, 1),
            (256, 1, 1, 2),  # layer3: _nostride_dilate(2)
            (512, 1, 2, 4),  # layer4: _nostride_dilate(4)
        ]
        low = None
        for stage_idx, (planes, stride, dil0, dil) in enumerate(stage_spec):
            for block_idx in range(self.layers[stage_idx]):
                first = block_idx == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dil0 if first else dil,
                    has_downsample=first,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train=train, bn_axis_name=bn_axis_name)
            if stage_idx == 0:
                low = x  # 256-ch stride-4 feature (the reference's
                # ``is_return_low`` V3+ hook, resnet.py:176-190)
        if return_low:
            return x, low
        return x  # [B, H/8, W/8, 2048]
