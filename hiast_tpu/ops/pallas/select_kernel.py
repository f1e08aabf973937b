"""Pallas TPU kernels: fused pseudo-label selection + confidence histogram.

One VMEM-resident pass over the logits computes what the reference does in
four host-side sweeps (reference: code/workflows/pseudo_label_generator.py:
67-106 — softmax, max/argmax, per-pixel threshold lookup via
``np.apply_along_axis``, ignore-masking, per-class stats):

    per pixel: max-softmax confidence, argmax class, threshold compare,
               255-masking
    per class: selected-pixel counts and confidence sums (VMEM accumulators)

``fused_hist`` is the companion pass for the IAS threshold update: per-class
confidence HISTOGRAM over the stats grid, built as ONE hi/lo-factorized
one-hot matmul per tile ([HIST_HI, T] @ [T, C*lo_n] on the MXU, bin =
hi*lo_n + lo) instead of the XLA per-pixel scatter (scatters serialize on
TPU).  The joint accumulator lives in VMEM across grid steps; both one-hots
are built in VMEM, so the only HBM traffic is the logits read.  The 128-row
hi axis keeps the MXU fully utilized (a direct [C=19, bins] formulation
idles 109/128 rows).

Layout: pixels are flattened to [N, C]; the wrapper pads N up to the tile
size and C is lane-padded by Mosaic.  Rows beyond ``nvalid`` (tile padding
AND the generator's partial-batch pad samples, which are a row suffix by
construction) are masked out of the label output (forced to 255) and of
every accumulator.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiast_tpu.pseudo.policies import HIST_HI, joint_to_class_hist

IGNORE = 255
TILE = 2048


def _argmax_f32(x, t, c):
    """First-max argmax kept ENTIRELY in f32 (class ids < 2^24 are exact):
    the current Mosaic rejects f32->i32 vector casts, which jnp.argmax's
    lowering (and any int conversion of it) requires."""
    class_ids_f = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1).astype(jnp.float32)
    m = jnp.max(x, axis=1, keepdims=True)
    is_max = x >= m  # [T, C]; ties -> smallest id, like jnp.argmax
    return jnp.min(jnp.where(is_max, class_ids_f, float(c)), axis=1), m


def _select_kernel(nvalid_ref, logits_ref, thr_ref, plbl_ref, maxprob_ref, counts_ref, sums_ref):
    i = pl.program_id(0)
    t, c = logits_ref.shape

    x = logits_ref[:].astype(jnp.float32)  # [T, C]
    pred_f, m = _argmax_f32(x, t, c)  # [T] f32
    e = jnp.exp(x - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    maxprob = (1.0 / denom)[:, 0]  # exp(max - max) / sum = 1/sum

    class_ids_f = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1).astype(jnp.float32)
    onehot = (class_ids_f == pred_f[:, None]).astype(jnp.float32)  # [T, C]
    thr = thr_ref[0, :]  # [C]
    thr_pp = jnp.sum(onehot * thr[None, :], axis=1)  # [T]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0] + i * t
    valid = row < nvalid_ref[0]
    selected = (maxprob >= thr_pp) & valid
    plbl = jnp.where(selected, pred_f, float(IGNORE))  # f32; cast in XLA

    plbl_ref[:] = plbl
    maxprob_ref[:] = maxprob

    sel_onehot = onehot * selected[:, None].astype(jnp.float32)  # [T, C]
    tile_counts = jnp.sum(sel_onehot, axis=0, keepdims=True)  # [1, C]
    tile_sums = jnp.sum(sel_onehot * maxprob[:, None], axis=0, keepdims=True)

    # TPU grids run sequentially, so revisiting the same (1, C) output block
    # accumulates correctly across tiles
    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += tile_counts
    sums_ref[:] += tile_sums


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_select(
    logits: jnp.ndarray,
    thresholds: jnp.ndarray,
    nvalid: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Fused selection over [..., C] logits.

    Returns (plbl [...], maxprob [...], counts [C], sums [C]) where counts /
    sums are over SELECTED pixels per class.  ``nvalid`` (traced scalar,
    default: every pixel) masks a row SUFFIX out of the labels and stats —
    the generator's partial-batch pad samples.
    """
    if interpret is None:  # Mosaic has no CPU backend; tests interpret
        interpret = jax.default_backend() == "cpu"
    *batch_shape, c = logits.shape
    n = 1
    for s in batch_shape:
        n *= s
    flat = logits.reshape(n, c).astype(jnp.float32)
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = n_pad // TILE
    nvalid = jnp.full((1,), n, jnp.int32) if nvalid is None else (
        jnp.minimum(jnp.asarray(nvalid, jnp.int32), n).reshape(1)
    )

    plbl, maxprob, counts, sums = pl.pallas_call(
        _select_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(nvalid, flat, thresholds.reshape(1, c).astype(jnp.float32))

    plbl = plbl[:n].reshape(batch_shape).astype(jnp.int32)
    maxprob = maxprob[:n].reshape(batch_shape)
    return plbl, maxprob, counts[0], sums[0]


def fused_select_batched(
    logits: jnp.ndarray,
    thresholds: jnp.ndarray,
    nvalid: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """fused_select returning per-SAMPLE class counts [B, C] as well.

    logits: [B, H, W, C].  The per-sample breakdown comes from a cheap XLA
    one-hot reduce over the kernel's label output.
    """
    from hiast_tpu.pseudo.policies import per_sample_class_counts

    plbl, maxprob, counts, sums = fused_select(
        logits, thresholds, nvalid=nvalid, interpret=interpret
    )
    per_sample = per_sample_class_counts(plbl, logits.shape[-1])
    return plbl, maxprob, per_sample, sums, counts


# ---------------------------------------------------------------------------
# fused confidence histogram (the IAS stats pass)
# ---------------------------------------------------------------------------
def _hist_kernel(nvalid_ref, logits_ref, *refs, num_bins: int, with_pixels: bool):
    if with_pixels:
        maxprob_ref, pred_ref, joint_ref = refs
    else:  # hist-only: don't burn HBM writes on outputs nobody reads
        (joint_ref,) = refs
    i = pl.program_id(0)
    t, c = logits_ref.shape
    lo_n = num_bins // HIST_HI

    x = logits_ref[:].astype(jnp.float32)  # [T, C]
    pred_f, m = _argmax_f32(x, t, c)  # [T] f32
    e = jnp.exp(x - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    maxprob = (1.0 / denom)[:, 0]  # [T]

    if with_pixels:
        maxprob_ref[:] = maxprob
        pred_ref[:] = pred_f  # f32; cast in XLA

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0] + i * t
    valid = (row < nvalid_ref[0]).astype(jnp.float32)  # [T]

    # hi/lo factorized joint histogram: bin = hi * lo_n + lo; ONE
    # [HIST_HI, T] @ [T, C*lo_n] one-hot matmul per tile accumulates the
    # VMEM-resident joint — full 128-row MXU utilization (the previous
    # [C=19, bin-chunk] formulation idled 109/128 MXU rows).
    #
    # All binning stays in the FLOAT domain via range compares: Mosaic
    # cannot legalize f32->i32 vector casts (floor lowers through one).
    # ``s = min(maxprob*nb, nb - 0.5)`` reproduces XLA's
    # clip(int(maxprob*nb), 0, nb-1) incl. the maxprob == 1.0 edge.
    s = jnp.minimum(maxprob * num_bins, num_bins - 0.5)  # [T] in [0, nb)
    f = s / lo_n  # [T] in [0, HIST_HI)
    hi_ids_f = jax.lax.broadcasted_iota(jnp.int32, (t, HIST_HI), 1).astype(jnp.float32)
    onehot_hi = (
        (f[:, None] >= hi_ids_f) & (f[:, None] < hi_ids_f + 1.0)
    ).astype(jnp.float32)  # [T, HI]
    hi_f = jnp.sum(onehot_hi * hi_ids_f, axis=1)  # exact floor(s/lo_n)
    clo = pred_f * lo_n + (s - hi_f * lo_n)  # [T] in [0, C*lo_n)
    clo_ids_f = jax.lax.broadcasted_iota(jnp.int32, (t, c * lo_n), 1).astype(jnp.float32)
    onehot_clo = (
        (clo[:, None] >= clo_ids_f) & (clo[:, None] < clo_ids_f + 1.0)
    ).astype(jnp.float32) * valid[:, None]  # [T, C*lo_n]

    @pl.when(i == 0)
    def _init():
        joint_ref[:] = jnp.zeros_like(joint_ref)

    joint_ref[:] += jax.lax.dot_general(
        onehot_hi.astype(jnp.bfloat16), onehot_clo.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),  # contract over T -> [HI, C*lo_n]
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_bins", "interpret", "with_pixels"))
def fused_hist(
    logits: jnp.ndarray,
    nvalid: jnp.ndarray | None = None,
    num_bins: int = 2048,
    interpret: bool | None = None,
    with_pixels: bool = True,
):
    """Per-class max-softmax-confidence histogram over [..., C] logits.

    Returns (maxprob [...], pred [...], hist [C, num_bins]) — the inputs of
    ``policies.ias_update``/``cbst_thresholds``, with the confidences reusable
    by a downstream selection.  ``num_bins`` must be a multiple of 256 (or a
    power of two below it).  ``with_pixels=False`` returns (None, None, hist)
    and skips the two full-size per-pixel outputs entirely — pallas outputs
    are never DCE'd by XLA, and at batch 8 x 768x1536 they cost ~75 MB of
    HBM writes per batch that the stats-only caller discards.
    """
    if interpret is None:  # Mosaic has no CPU backend; tests interpret
        interpret = jax.default_backend() == "cpu"
    *batch_shape, c = logits.shape
    assert num_bins % HIST_HI == 0 or HIST_HI % num_bins == 0, num_bins
    eff_bins = max(num_bins, HIST_HI)  # tiny-bin configs compute finer + fold
    lo_n = eff_bins // HIST_HI
    n = 1
    for s in batch_shape:
        n *= s
    flat = logits.reshape(n, c).astype(jnp.float32)
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = n_pad // TILE
    nvalid = jnp.full((1,), n, jnp.int32) if nvalid is None else (
        jnp.minimum(jnp.asarray(nvalid, jnp.int32), n).reshape(1)
    )

    kernel = functools.partial(_hist_kernel, num_bins=eff_bins, with_pixels=with_pixels)
    pixel_specs = [
        pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
    ] if with_pixels else []
    pixel_shapes = [
        jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n_pad,), jnp.float32),
    ] if with_pixels else []
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pixel_specs + [
                pl.BlockSpec((HIST_HI, c * lo_n), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=pixel_shapes + [
            jax.ShapeDtypeStruct((HIST_HI, c * lo_n), jnp.float32),
        ],
        interpret=interpret,
    )(nvalid, flat)

    hist = joint_to_class_hist(outs[-1], c, eff_bins)
    if eff_bins != num_bins:
        # bins were computed at eff_bins resolution; fold down exactly
        hist = hist.reshape(c, num_bins, eff_bins // num_bins).sum(-1)
    if not with_pixels:
        return None, None, hist
    maxprob = outs[0][:n].reshape(batch_shape)
    pred = outs[1][:n].reshape(batch_shape).astype(jnp.int32)
    return maxprob, pred, hist
