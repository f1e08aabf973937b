"""On-device Fourier Domain Adaptation (arXiv:2004.05498).

The host FDA (data/augment.py:FDA) matches the reference's albumentations
path; this is the TPU-native alternative: swap the centered low-frequency
amplitude band of each source image with a target image's, entirely as a
jit'd batched FFT program (XLA supports FFT on TPU).  Use when the style
target can be batched alongside the source (e.g. paired streams) — it
removes the per-sample numpy FFTs from the host loader.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _low_freq_mask(h: int, w: int, beta: float) -> jnp.ndarray:
    """Centered (fftshift) square band of half-width floor(min(h,w)*beta)."""
    b = max(int(np.floor(min(h, w) * beta)), 1)
    cy, cx = h // 2, w // 2
    mask = np.zeros((h, w), np.float32)
    mask[cy - b : cy + b, cx - b : cx + b] = 1.0
    return jnp.asarray(np.fft.ifftshift(mask))


def fda_device(src: jnp.ndarray, tgt: jnp.ndarray, beta: float = 0.001) -> jnp.ndarray:
    """Transfer tgt's low-frequency amplitude onto src.

    src/tgt: [B, H, W, 3] float (0..255) of identical shape; returns float32.
    """
    b, h, w, c = src.shape
    mask = _low_freq_mask(h, w, beta)[None, :, :, None]
    fs = jnp.fft.fft2(src.astype(jnp.float32), axes=(1, 2))
    ft = jnp.fft.fft2(tgt.astype(jnp.float32), axes=(1, 2))
    amp_s, pha_s = jnp.abs(fs), jnp.angle(fs)
    amp = amp_s * (1.0 - mask) + jnp.abs(ft) * mask
    out = jnp.fft.ifft2(amp * jnp.exp(1j * pha_s), axes=(1, 2)).real
    return jnp.clip(out, 0.0, 255.0)
