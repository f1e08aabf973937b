"""On-device pseudo-label selection policies (IAS / CBST / CT / NT).

The reference runs this pass on the host: per-pixel threshold lookup via
``np.apply_along_axis`` over ragged per-class probability lists (reference:
code/workflows/pseudo_label_generator.py:67-106,168-213) — the documented
bottleneck.  Here the whole pass is device-side and fixed-shape:

- confidence/argmax extraction is a fused softmax-max over the class axis;
- per-class probability populations become per-class HISTOGRAMS (fixed
  [C, num_bins] shape) instead of ragged lists.  Quantiles interpolate the
  histogram CDF.  At 2048 bins the resolution (4.9e-4) matches the
  reference's float16 probability storage (pseudo_label_generator.py:158,199),
  so threshold fidelity is preserved by construction;
- the IAS threshold vector is carried state threaded through the batch loop;
  under data-parallel generation the histogram is psum'd across shards and
  the state update stays replicated (SURVEY §7 'hard parts').

All functions are pure and jit/psum-safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE = 255


class IASState(NamedTuple):
    """Carried state of the instance-adaptive selector."""

    thresholds: jnp.ndarray  # [C] float32, init 0.9
    class_mean_probs: jnp.ndarray  # [C] float32, init 0 (EMA of selected-pixel conf)


def confidences(logits: jnp.ndarray):
    """Fused max-softmax confidence + argmax over the class axis.

    ``maxprob = exp(max_logit - logsumexp)`` avoids materializing the full
    softmax.  logits: [..., C] float; returns (maxprob [...], pred [...]).
    """
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1))
    return jnp.exp(m - lse), jnp.argmax(x, axis=-1).astype(jnp.int32)


def class_prob_histogram(
    maxprob: jnp.ndarray,
    pred: jnp.ndarray,
    num_classes: int,
    num_bins: int,
    weights: jnp.ndarray | None = None,
    method: str = "auto",
) -> jnp.ndarray:
    """[C, num_bins] histogram of max-probabilities grouped by predicted class.

    ``weights`` (same shape as ``pred``) scales each pixel's contribution —
    used to exclude pad samples of a partial batch (weight 0).

    Two bit-exact implementations (equality pinned by tests/test_pseudo.py):

    - ``scatter``: one scatter-add over the flattened (class, bin) keys.
      Scatters serialize per-pixel on TPU — fine on the OS8 stats grid
      (~150k pixels), ~60 ms at full resolution (9.4M pixels, measured).
    - ``matmul``: the classic TPU histogram factorization. ``bin`` splits
      into ``hi * lo_n + lo`` so the whole histogram is ONE contraction
      ``onehot_hi[N, hi_n] x onehot_(class,lo)[N, C*lo_n] -> [hi_n, C*lo_n]``
      over pixel chunks — MXU work with full 128-row utilization instead of
      a scatter.  One-hots are exact in bf16 and the f32 accumulation is
      exact below 2^24 pixels per cell, so counts are identical.  (Weights
      ride the bf16 one-hot: exact for the 0/1 pad masks every caller
      passes; fractional weights would round to 8 bits — use ``scatter``
      for those.)

    ``auto`` picks matmul for large pixel counts when the bin count allows
    the 128-way split.
    """
    n = int(np.prod(pred.shape))
    if method == "auto":
        method = (
            "matmul" if n >= (1 << 20) and num_bins % HIST_HI == 0 else "scatter"
        )
    if method == "matmul":
        return _class_prob_histogram_matmul(
            maxprob, pred, num_classes, num_bins, weights
        )
    bins = jnp.clip((maxprob * num_bins).astype(jnp.int32), 0, num_bins - 1)
    flat = pred.reshape(-1) * num_bins + bins.reshape(-1)
    w = jnp.ones(flat.shape, jnp.float32) if weights is None else weights.reshape(-1).astype(jnp.float32)
    hist = jnp.zeros((num_classes * num_bins,), jnp.float32).at[flat].add(w)
    return hist.reshape(num_classes, num_bins)


HIST_HI = 128  # rows of the joint-histogram matmul = one full MXU tile
_HIST_CHUNK = 1 << 20  # pixels per scan step: bounds the one-hot HBM footprint


def _class_prob_histogram_matmul(
    maxprob: jnp.ndarray,
    pred: jnp.ndarray,
    num_classes: int,
    num_bins: int,
    weights: jnp.ndarray | None,
) -> jnp.ndarray:
    lo_n = num_bins // HIST_HI
    s = jnp.clip((maxprob.reshape(-1) * num_bins).astype(jnp.int32), 0, num_bins - 1)
    hi = s // lo_n  # [N] in [0, hi_n)
    clo = pred.reshape(-1) * lo_n + s % lo_n  # [N] in [0, C*lo_n)
    w = (
        jnp.ones(s.shape, jnp.bfloat16)
        if weights is None
        else weights.reshape(-1).astype(jnp.bfloat16)
    )
    n = s.shape[0]
    n_pad = -(-n // _HIST_CHUNK) * _HIST_CHUNK
    if n_pad != n:  # pad rows carry weight 0 -> contribute nothing
        pad = (0, n_pad - n)
        hi, clo, w = jnp.pad(hi, pad), jnp.pad(clo, pad), jnp.pad(w, pad)
    chunks = n_pad // _HIST_CHUNK

    hi_ids = jnp.arange(HIST_HI, dtype=jnp.int32)
    clo_ids = jnp.arange(num_classes * lo_n, dtype=jnp.int32)

    def body(acc, args):
        hi_c, clo_c, w_c = args
        oh_hi = (hi_c[:, None] == hi_ids).astype(jnp.bfloat16)
        oh_clo = (clo_c[:, None] == clo_ids).astype(jnp.bfloat16) * w_c[:, None]
        joint = jax.lax.dot_general(
            oh_hi, oh_clo,
            (((0,), (0,)), ((), ())),  # contract over pixels
            preferred_element_type=jnp.float32,
        )
        return acc + joint, None

    init = jnp.zeros((HIST_HI, num_classes * lo_n), jnp.float32)
    if chunks == 1:
        joint, _ = body(init, (hi, clo, w))
    else:
        shape = (chunks, _HIST_CHUNK)
        joint, _ = jax.lax.scan(
            body, init, (hi.reshape(shape), clo.reshape(shape), w.reshape(shape))
        )
    return joint_to_class_hist(joint, num_classes, num_bins)


def joint_to_class_hist(joint, num_classes: int, num_bins: int):
    """Unflatten a [HIST_HI, C*lo_n] hi/lo joint histogram to [C, num_bins]
    (bin = hi * lo_n + lo).  Single source of truth for the hi/lo layout —
    the Pallas kernel (ops/pallas/select_kernel.py) shares it, so the
    XLA-vs-Pallas equality tests compare the SAME binning by construction."""
    lo_n = num_bins // HIST_HI
    return (
        joint.reshape(HIST_HI, num_classes, lo_n)
        .transpose(1, 0, 2)
        .reshape(num_classes, num_bins)
    )


def histogram_quantile(hist: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Per-class quantile via CDF interpolation of bin centers.

    hist: [C, B]; q: [C] in [0, 1].  Empty-class rows return the highest bin
    center they'd interpolate to — callers guard with their own fallbacks.
    """
    c, b = hist.shape
    centers = (jnp.arange(b, dtype=jnp.float32) + 0.5) / b
    total = jnp.sum(hist, axis=1, keepdims=True)  # [C,1]
    cdf = jnp.cumsum(hist, axis=1)
    # np.quantile(linear): virtual index q*(n-1); find the value whose rank
    # straddles it.  rank of bin i spans [cdf[i-1], cdf[i]-1].
    pos = q * (jnp.maximum(total[:, 0], 1.0) - 1.0)  # [C] virtual rank
    frac = pos - jnp.floor(pos)

    def value_at_rank(rank):  # first bin whose cdf exceeds the 0-indexed rank
        idx = jnp.argmax(cdf > rank[:, None], axis=1)
        return centers[idx]

    lo = value_at_rank(jnp.floor(pos))
    hi = value_at_rank(jnp.ceil(pos))
    return lo + frac * (hi - lo)


def ias_update(
    state: IASState,
    hist: jnp.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
) -> jnp.ndarray:
    """One IAS threshold update from a batch histogram.

    Mirrors reference pseudo_label_generator.py:171-209: each class's new
    candidate threshold is the ``1 - alpha * theta_old^gamma`` quantile of
    the batch's per-class confidence population seeded with theta_old itself
    (the reference prepends the old threshold to the list), then EMA-blended
    with beta and clipped to 0.999.
    """
    num_bins = hist.shape[1]
    theta = state.thresholds
    # seed the population with the old threshold (one synthetic sample)
    seed_bins = jnp.clip((theta * num_bins).astype(jnp.int32), 0, num_bins - 1)
    hist = hist.at[jnp.arange(hist.shape[0]), seed_bins].add(1.0)
    q = 1.0 - alpha * theta**gamma
    candidate = histogram_quantile(hist, q)
    new_theta = beta * theta + (1.0 - beta) * candidate
    return jnp.where(new_theta >= 1.0, 0.999, new_theta)


def select_pseudo_labels(
    maxprob: jnp.ndarray, pred: jnp.ndarray, thresholds: jnp.ndarray | None
) -> jnp.ndarray:
    """Confidence-gated pseudo labels: below-threshold pixels -> 255.

    The per-pixel threshold lookup is a one-hot contraction, not a gather
    (per-pixel gathers serialize on TPU).
    """
    if thresholds is None:  # NT policy
        return pred
    num_classes = thresholds.shape[0]
    onehot = (pred[..., None] == jnp.arange(num_classes, dtype=pred.dtype)).astype(
        jnp.float32
    )
    per_pixel_thr = jnp.sum(onehot * thresholds.astype(jnp.float32), axis=-1)
    return jnp.where(maxprob < per_pixel_thr, IGNORE, pred).astype(jnp.int32)


def per_sample_class_counts(plbl: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[B, C] pixel counts per selected class (feeds samples_with_class)."""
    classes = jnp.arange(num_classes, dtype=plbl.dtype)
    return jnp.sum(
        plbl[..., None] == classes, axis=tuple(range(1, plbl.ndim))
    ).astype(jnp.int32)


def class_prob_sums(
    plbl: jnp.ndarray, maxprob: jnp.ndarray, num_classes: int
):
    """Per-class (sum of confidences, count) over SELECTED pixels.

    Reductions stay in the native [..., C] layout — flattening to [N, C]
    first would force a costly relayout on TPU.
    """
    classes = jnp.arange(num_classes, dtype=plbl.dtype)
    onehot = (plbl[..., None] == classes).astype(jnp.float32)
    axes = tuple(range(plbl.ndim))
    sums = jnp.sum(onehot * maxprob[..., None].astype(jnp.float32), axis=axes)
    counts = jnp.sum(onehot, axis=axes)
    return sums, counts


def update_class_mean_probs(
    cmp: jnp.ndarray, prob_sums: jnp.ndarray, counts: jnp.ndarray, gamma: float
) -> jnp.ndarray:
    """EMA of per-class mean confidence (reference
    pseudo_label_generator.py:96-106): init directly on first observation,
    EMA(gamma) afterwards; classes absent from the batch keep their value."""
    mean = prob_sums / jnp.maximum(counts, 1.0)
    has = counts > 0
    updated = jnp.where(cmp == 0.0, mean, cmp * gamma + mean * (1.0 - gamma))
    return jnp.where(has, updated, cmp)


def cbst_thresholds(hist: jnp.ndarray, p: float) -> jnp.ndarray:
    """CBST: global per-class quantile at 1-p over the full dataset histogram
    (reference pseudo_label_generator.py:142-165)."""
    c = hist.shape[0]
    q = jnp.full((c,), 1.0 - p, jnp.float32)
    thr = histogram_quantile(hist, q)
    # classes never predicted: quantile of empty population -> keep 1.0
    empty = jnp.sum(hist, axis=1) == 0
    return jnp.where(empty, 1.0, thr)
