"""Static-shape image resizing as interpolation matmuls.

The reference leans on ``F.interpolate(mode='bilinear', align_corners=True)``
for every logit/image rescale (reference:
code/sseg/models/segmentors/self_training_segmentor.py:27,
code/workflows/validator.py:45-52, code/workflows/trainer/base_trainer.py:170-172).
``jax.image.resize`` has no align_corners=True mode, and a gather-based
implementation maps poorly onto the TPU.  Since every shape here is static,
separable bilinear interpolation is exactly two small dense matmuls
(``W_h @ x @ W_w^T``) — which XLA tiles straight onto the MXU.

All functions take NHWC arrays.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense [n_out, n_in] matrix computing 1-D linear interpolation."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    if align_corners:
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:  # half-pixel convention (torch align_corners=False / cv2)
        scale = n_in / n_out
        src = np.clip((np.arange(n_out) + 0.5) * scale - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return w


@functools.lru_cache(maxsize=128)
def _nearest_index(n_in: int, n_out: int) -> np.ndarray:
    """Source index per output position, torch 'nearest' convention."""
    return np.minimum(np.floor(np.arange(n_out) * (n_in / n_out)), n_in - 1).astype(
        np.int32
    )


def bilinear_resize(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear-resize an NHWC (or HWC) array to [out_h, out_w].

    Runs the interpolation contractions in float32 regardless of input dtype
    (weights are exact in fp32; bf16 accumulation would cost accuracy), and
    returns the input dtype.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_linear_interp_matrix(h, out_h, align_corners))
    ww = jnp.asarray(_linear_interp_matrix(w, out_w, align_corners))
    # [B,H,W,C] -> [B,out_h,W,C] -> [B,out_h,out_w,C]
    out = jnp.einsum("oh,bhwc->bowc", wh, xf, preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,bowc->bopc", ww, out, preferred_element_type=jnp.float32)
    out = out.astype(dtype)
    return out[0] if squeeze else out


def nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of the two TRAILING axes ([..., H, W]).

    Used for integer label maps ([H, W] or [B, H, W]); for [H, W, C] images
    move channels out of the trailing axes first.
    """
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    rows = jnp.asarray(_nearest_index(h, out_h))
    cols = jnp.asarray(_nearest_index(w, out_w))
    return jnp.take(jnp.take(x, rows, axis=-2), cols, axis=-1)
