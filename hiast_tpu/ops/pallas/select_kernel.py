"""Pallas TPU kernels: fused pseudo-label selection + confidence histogram.

One VMEM-resident pass over the logits computes what the reference does in
four host-side sweeps (reference: code/workflows/pseudo_label_generator.py:
67-106 — softmax, max/argmax, per-pixel threshold lookup via
``np.apply_along_axis``, ignore-masking, per-class stats):

    per pixel: max-softmax confidence, argmax class, threshold compare,
               255-masking
    per class: selected-pixel counts and confidence sums (VMEM accumulators)

``fused_hist`` is the companion pass for the IAS threshold update: per-class
confidence HISTOGRAM over the stats grid, built as a sequence of one-hot
MATMULS ([C, T] @ [T, bin-chunk] on the MXU) instead of the XLA per-pixel
scatter (measured ~9 ms on the OS8 grid; scatters serialize on TPU).  The
[C, num_bins] accumulator lives in VMEM across grid steps; bins are chunked
so the [T, chunk] one-hot stays a ~2 MB VMEM tile.

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

IGNORE = 255
TILE = 2048
BIN_CHUNK = 256


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
def _hist_kernel(nvalid_ref, logits_ref, maxprob_ref, pred_ref, hist_ref, num_bins: int):
    i = pl.program_id(0)
    t, c = logits_ref.shape

    x = logits_ref[:].astype(jnp.float32)  # [T, C]
    pred_f, m = _argmax_f32(x, t, c)  # [T] f32
    e = jnp.exp(x - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    maxprob = (1.0 / denom)[:, 0]  # [T]

    maxprob_ref[:] = maxprob
    pred_ref[:] = pred_f  # f32; cast in XLA

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0] + i * t
    valid = (row < nvalid_ref[0]).astype(jnp.float32)  # [T]

    class_ids_f = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1).astype(jnp.float32)
    onehot_c = (class_ids_f == pred_f[:, None]).astype(jnp.float32) * valid[:, None]

    # float-domain binning: Mosaic cannot legalize f32->i32 vector casts (and
    # lowers floor through one), so bin membership is a RANGE COMPARE —
    # pixel x lands in bin j iff scaled in [j, j+1), last bin catching
    # scaled == num_bins (maxprob == 1.0); identical to the XLA path's
    # clip(int(maxprob*nb), 0, nb-1)
    scaled = maxprob * num_bins  # [T], in [0, num_bins]

    @pl.when(i == 0)
    def _init():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    # [C, T] @ [T, chunk] one-hot matmuls accumulate into the VMEM-resident
    # [C, num_bins] histogram — MXU work instead of a per-pixel scatter
    for k in range(num_bins // BIN_CHUNK):
        # int iota -> f32 (Mosaic: iota must be integer; sitofp legalizes)
        bin_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (t, BIN_CHUNK), 1).astype(jnp.float32)
            + float(k * BIN_CHUNK)
        )
        upper = jnp.where(bin_ids >= float(num_bins - 1), jnp.inf, bin_ids + 1.0)
        s = scaled[:, None]
        onehot_b = ((s >= bin_ids) & (s < upper)).astype(jnp.float32)  # [T, chunk]
        chunk = jax.lax.dot_general(
            onehot_c, onehot_b,
            (((0,), (0,)), ((), ())),  # contract over T -> [C, chunk]
            preferred_element_type=jnp.float32,
        )
        sl = pl.dslice(k * BIN_CHUNK, BIN_CHUNK)
        hist_ref[:, sl] += chunk


@functools.partial(jax.jit, static_argnames=("num_bins", "interpret"))
def fused_hist(
    logits: jnp.ndarray,
    nvalid: jnp.ndarray | None = None,
    num_bins: int = 2048,
    interpret: bool | None = None,
):
    """Per-class max-softmax-confidence histogram over [..., C] logits.

    Returns (maxprob [...], pred [...], hist [C, num_bins]) — the inputs of
    ``policies.ias_update``/``cbst_thresholds``, with the confidences reusable
    by a downstream selection.  ``num_bins`` must be a multiple of 256 (or a
    power of two below it).
    """
    if interpret is None:  # Mosaic has no CPU backend; tests interpret
        interpret = jax.default_backend() == "cpu"
    *batch_shape, c = logits.shape
    assert num_bins % BIN_CHUNK == 0 or BIN_CHUNK % num_bins == 0, num_bins
    eff_bins = max(num_bins, BIN_CHUNK)  # tiny-bin configs pad the lane dim
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

    kernel = functools.partial(_hist_kernel, num_bins=eff_bins)
    maxprob, pred, hist = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i, *_: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, eff_bins), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((c, eff_bins), jnp.float32),
        ],
        interpret=interpret,
    )(nvalid, flat)

    maxprob = maxprob[:n].reshape(batch_shape)
    pred = pred[:n].reshape(batch_shape).astype(jnp.int32)
    if eff_bins != num_bins:
        # bins were computed at eff_bins resolution; fold down exactly
        hist = hist.reshape(c, num_bins, eff_bins // num_bins).sum(-1)
    return maxprob, pred, hist
