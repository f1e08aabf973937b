"""Pallas TPU kernel: fused pseudo-label selection pass.

One VMEM-resident pass over the logits computes what the reference does in
four host-side sweeps (reference: code/workflows/pseudo_label_generator.py:
67-106 — softmax, max/argmax, per-pixel threshold lookup via
``np.apply_along_axis``, ignore-masking, per-class stats):

    per pixel: max-softmax confidence, argmax class, threshold compare,
               255-masking
    per class: selected-pixel counts and confidence sums (VMEM accumulators)

The logits tensor is read from HBM exactly once.  The per-class confidence
HISTOGRAM for quantile updates is not in this kernel — it runs on the OS8
stats grid via XLA scatter (64x smaller; see pseudo/generator.py).

Layout: pixels are flattened to [N, C]; the wrapper pads N up to the tile
size and C is lane-padded by Mosaic.  Padded rows are masked out of both the
label output (forced to 255 -> harmless) and the accumulators.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IGNORE = 255
TILE = 2048


def _select_kernel(nvalid_ref, logits_ref, thr_ref, plbl_ref, maxprob_ref, counts_ref, sums_ref):
    i = pl.program_id(0)
    t, c = logits_ref.shape

    x = logits_ref[:].astype(jnp.float32)  # [T, C]
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    maxprob = (1.0 / denom)[:, 0]  # exp(max - max) / sum = 1/sum
    pred = jnp.argmax(x, axis=1).astype(jnp.int32)  # [T]

    class_ids = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    onehot = (class_ids == pred[:, None]).astype(jnp.float32)  # [T, C]
    thr = thr_ref[0, :]  # [C]
    thr_pp = jnp.sum(onehot * thr[None, :], axis=1)  # [T]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0] + i * t
    valid = row < nvalid_ref[0]
    selected = (maxprob >= thr_pp) & valid
    plbl = jnp.where(selected, pred, IGNORE)

    plbl_ref[:] = plbl.astype(jnp.int32)
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
def fused_select(logits: jnp.ndarray, thresholds: jnp.ndarray, interpret: bool = False):
    """Fused selection over [..., C] logits.

    Returns (plbl [...], maxprob [...], counts [C], sums [C]) where counts /
    sums are over SELECTED pixels per class.
    """
    *batch_shape, c = logits.shape
    n = 1
    for s in batch_shape:
        n *= s
    flat = logits.reshape(n, c).astype(jnp.float32)
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = n_pad // TILE

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
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([n], jnp.int32), flat, thresholds.reshape(1, c).astype(jnp.float32))

    plbl = plbl[:n].reshape(batch_shape)
    maxprob = maxprob[:n].reshape(batch_shape)
    return plbl, maxprob, counts[0], sums[0]


def fused_select_batched(logits: jnp.ndarray, thresholds: jnp.ndarray, interpret: bool = False):
    """fused_select returning per-SAMPLE class counts [B, C] as well.

    logits: [B, H, W, C].  The per-sample breakdown comes from a cheap XLA
    one-hot reduce over the kernel's label output.
    """
    from hiast_tpu.pseudo.policies import per_sample_class_counts

    plbl, maxprob, counts, sums = fused_select(logits, thresholds, interpret=interpret)
    per_sample = per_sample_class_counts(plbl, logits.shape[-1])
    return plbl, maxprob, per_sample, sums, counts
