"""BatchNorm with exact torch running-statistics semantics.

``flax.linen.BatchNorm`` updates the running variance with the BIASED batch
variance; torch ``nn.BatchNorm2d`` normalizes with the biased variance but
updates ``running_var`` with the UNBIASED one (factor n/(n-1)).  The factor
is tiny at segmentation feature-map sizes, but it compounds over thousands of
train steps in every BN buffer — and the buffers feed the EMA teacher's
eval-mode forward (reference: consistency trainer runs the teacher with
``ema_model.eval()``), so matching torch exactly is what makes a multi-step
training-dynamics parity test meaningful (tests/test_train_parity.py).

Semantics mirrored from torch BatchNorm2d / apex SyncBN (reference:
code/utils/utils.py:103-110 converts to SyncBN then freezes the affine
params; BN stays in train mode so batch statistics still update):

- train: normalize by per-batch biased moments; with ``axis_name`` the
  moments are ``lax.pmean``-ed across the data axis first (SyncBN — the
  count n scales by the axis size);
- running update: ``ra = (1 - m) * ra + m * stat`` with torch momentum
  ``m = 1 - momentum`` (this module keeps the flax-style ``momentum``
  argument so call sites read identically), variance unbiased;
- eval: normalize by the stored running stats.

Statistics always accumulate in float32; the normalized output is cast back
to ``dtype`` (bf16 in the production trunk).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    use_running_average: bool = True
    momentum: float = 0.9  # flax-style: torch momentum is 1 - this
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            n = x.size // feat
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # biased
            if not self.is_initializing():
                m = 1.0 - self.momentum  # torch momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
