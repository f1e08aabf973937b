"""Segmentation losses as pure array functions (NHWC logits).

Re-implements the reference loss registry and its region-masking protocol
(reference: code/sseg/models/modules/losses.py:9-89) plus the region-adaptive
regularizers (reference:
code/sseg/models/segmentors/self_training_segmentor.py:128-163) as pure
``jnp`` functions of ``(logits[B,H,W,C], labels, ...)`` — fully fusable by
XLA inside a single jit'd train step, no Python-side loss bookkeeping.

Region protocol: a loss can be restricted by ``refer_labels`` (usually the
pseudo-label map) to the ``'confident'`` region (refer != ignore), the
``'ignored'`` region (refer == ignore), or ``'all'``; the masked loss is
normalized by the number of NONZERO loss entries, matching the reference's
``loss_tensor.sum() / (loss_tensor != 0).sum()``.

All reductions are computed in float32 even when logits arrive in bfloat16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hiast_tpu.registry import LOSS

IGNORE_INDEX = 255


# ---------------------------------------------------------------------------
# region masking
# ---------------------------------------------------------------------------
def region_mask(refer_labels: jnp.ndarray, region: str, ignore_index: int = IGNORE_INDEX):
    """Boolean [B, H, W] mask selecting the requested region."""
    if region == "ignored":
        return refer_labels == ignore_index
    if region == "confident":
        return refer_labels != ignore_index
    if region == "all":
        return jnp.ones_like(refer_labels, dtype=bool)
    raise ValueError(f"{region!r} is not a valid region")


def _masked_nonzero_mean(loss: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(loss * mask) / count(loss * mask != 0), guarding empty regions.

    ``loss`` is [B, H, W] or [B, H, W, C]; ``mask`` is [B, H, W] bool.
    """
    if loss.ndim == 4:
        mask = mask[..., None]
    masked = loss * mask.astype(loss.dtype)
    count = jnp.sum(masked != 0)
    return jnp.sum(masked) / jnp.maximum(count, 1).astype(loss.dtype)


def build_region_weight(plbl: jnp.ndarray, ignore_index: int = IGNORE_INDEX):
    """(confident, ignored) float [B, H, W] masks from a pseudo-label map.

    Reference: self_training_segmentor.py:128-137 (returned there as
    broadcast [B, C, H, W] weights; we keep the compact per-pixel form).
    """
    confident = (plbl != ignore_index).astype(jnp.float32)
    return confident, 1.0 - confident


# ---------------------------------------------------------------------------
# core losses (reference losses.py registry)
# ---------------------------------------------------------------------------
def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


@LOSS.register("CE")
def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights=None,
    ignore_index: int = IGNORE_INDEX,
    refer_labels: jnp.ndarray | None = None,
    region: str = "confident",
) -> jnp.ndarray:
    """Hard-label CE; mean over valid pixels, or region-masked nonzero-mean."""
    num_classes = logits.shape[-1]
    logp = _log_softmax(logits)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    # one-hot contraction instead of take_along_axis: per-pixel gathers
    # serialize on TPU (measured 78 ms fwd + 90 ms bwd-scatter per step at
    # 8x512x1024x19); the [..., C] multiply+reduce fuses onto the VPU.
    onehot = (safe_labels[..., None] == jnp.arange(num_classes, dtype=jnp.int32)).astype(
        logp.dtype
    )
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weights is not None:
        w = jnp.sum(onehot * jnp.asarray(weights, dtype=nll.dtype), axis=-1)
        nll = nll * w
    nll = jnp.where(valid, nll, 0.0)
    if refer_labels is None:
        if weights is None:
            denom = jnp.maximum(jnp.sum(valid), 1)
        else:
            denom = jnp.maximum(jnp.sum(jnp.where(valid, w, 0.0)), 1e-12)
        return jnp.sum(nll) / denom.astype(nll.dtype)
    return _masked_nonzero_mean(nll, region_mask(refer_labels, region, ignore_index))


@LOSS.register("SoftCE")
def soft_cross_entropy(
    logits: jnp.ndarray,
    target_probs: jnp.ndarray,
    weights=None,
    ignore_index: int = IGNORE_INDEX,
    refer_labels: jnp.ndarray | None = None,
    region: str = "confident",
) -> jnp.ndarray:
    """Soft-label CE: -sum(target * log_softmax(logits)).

    ``target_probs`` is a [B, H, W, C] probability map (e.g. EMA-teacher
    softmax).  Reference: losses.py:39-66.
    """
    nll = -_log_softmax(logits)
    t = target_probs.astype(nll.dtype)
    if weights is not None:
        t = t * jnp.asarray(weights, dtype=nll.dtype)
    per_elem = nll * t  # [B, H, W, C]
    if refer_labels is None:
        return jnp.sum(per_elem) / per_elem.size
    return _masked_nonzero_mean(per_elem, region_mask(refer_labels, region, ignore_index))


@LOSS.register("KLDIV")
def kl_divergence(
    input_logits: jnp.ndarray,
    target_logits: jnp.ndarray,
    weights=None,
    ignore_index: int = IGNORE_INDEX,
    refer_labels: jnp.ndarray | None = None,
    region: str = "confident",
) -> jnp.ndarray:
    """KL(target || input) with torch KLDivLoss 'mean' semantics (mean over
    all elements).  Reference: losses.py:16-23."""
    logp = _log_softmax(input_logits)
    q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    per_elem = q * (jnp.log(jnp.maximum(q, 1e-30)) - logp)
    if refer_labels is None:
        return jnp.mean(per_elem)
    return _masked_nonzero_mean(per_elem, region_mask(refer_labels, region, ignore_index))


@LOSS.register("MSE")
def mse(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights=None,
    ignore_index: int = IGNORE_INDEX,
    refer_labels: jnp.ndarray | None = None,
    region: str = "all",
) -> jnp.ndarray:
    per_elem = (logits.astype(jnp.float32) - labels.astype(jnp.float32)) ** 2
    if refer_labels is None:
        return jnp.mean(per_elem)
    return _masked_nonzero_mean(per_elem, region_mask(refer_labels, region, ignore_index))


@LOSS.register("BCEWithLogits")
def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray, **_) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    # numerically-stable binary CE with logits
    per_elem = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per_elem)


# ---------------------------------------------------------------------------
# region-adaptive regularizers (reference self_training_segmentor.py:140-163)
# ---------------------------------------------------------------------------
def kld_to_uniform(logits: jnp.ndarray, pixel_weight: jnp.ndarray) -> jnp.ndarray:
    """KLD-to-uniform smoothing on the confident (pseudo-labeled) region.

    Exact reference normalization (self_training_segmentor.py:153-163): the
    reference's ``weight`` is broadcast to [B, C, H, W], so its
    ``val_num = weight[weight > 0].numel()`` counts #valid-pixels x C — the
    loss is ``-1/C * sum(w * log_softmax) / (#pixels * C)``.
    ``pixel_weight`` here is the compact float [B, H, W] mask.
    """
    num_classes = logits.shape[-1]
    logp = _log_softmax(logits)
    val_num = jnp.maximum(jnp.sum(pixel_weight > 0), 1).astype(jnp.float32) * num_classes
    return -jnp.sum(pixel_weight[..., None] * logp) / (num_classes * val_num)


def entropy_sharpen(logits: jnp.ndarray, pixel_weight: jnp.ndarray) -> jnp.ndarray:
    """Entropy regularizer on the ignored region.

    Same reference normalization as ``kld_to_uniform``: ``val_num`` counts
    #valid-pixels x C (the [B, C, H, W] broadcast weight), so the loss is
    ``-sum(softmax * w * log_softmax) / (#pixels * C)``.
    """
    num_classes = logits.shape[-1]
    logp = _log_softmax(logits)
    p = jnp.exp(logp)
    val_num = jnp.maximum(jnp.sum(pixel_weight > 0), 1).astype(jnp.float32) * num_classes
    return -jnp.sum(p * pixel_weight[..., None] * logp) / val_num


# ---------------------------------------------------------------------------
# adversarial helpers (reference adversarial_warmup_segmentor.py:71-86)
# ---------------------------------------------------------------------------
def prob_to_entropy(prob: jnp.ndarray) -> jnp.ndarray:
    """Per-class weighted self-information map (AdvEnt discriminator input)."""
    c = prob.shape[-1]
    p = prob.astype(jnp.float32)
    return -(p * jnp.log2(p + 1e-30)) / jnp.log2(jnp.float32(c))


def mean_entropy(prob: jnp.ndarray) -> jnp.ndarray:
    """MinEnt loss: mean per-pixel entropy, log2-normalized by #classes."""
    b, h, w, c = prob.shape
    p = prob.astype(jnp.float32)
    return -jnp.sum(p * jnp.log2(p + 1e-30)) / (b * h * w * jnp.log2(jnp.float32(c)))
