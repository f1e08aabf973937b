"""Fused SRA (spatial-reduction attention) Pallas kernels for SegFormer.

SegFormer's attention (reference counterpart: the torch
``Attention.forward`` einsum chain in its mmseg backbone; our XLA path is
models/segformer.py:EfficientAttention) has a special shape: queries are
long (H*W tokens, 32k at 512x1024 train in stage 1) but K/V are reduced by
sr^2 (all four stages land at ~512 KV tokens at train resolution).  The
XLA path therefore materializes a [B, heads, N_q, N_kv] f32 score tensor in
HBM (0.5 GB for one stage-1 block at batch 8) and reads it back through
softmax and the P@V matmul — pure HBM-bandwidth waste.

Because the WHOLE K/V block fits in VMEM, the fused kernel needs no online
(running-max) softmax: each grid step loads one query tile, computes its
full score row block, softmaxes it in registers/VMEM, and multiplies by V —
the score matrix never touches HBM.  The backward pass (custom_vjp) is the
standard flash-attention backward specialized to resident-KV: one pass over
query tiles recomputes P and accumulates dK/dV in a VMEM-resident block
while emitting dQ tiles, so the backward never materializes scores either.

Numerics match the XLA path: bf16 matmul inputs with f32 accumulation
(``preferred_element_type``), f32 softmax, P cast back to the compute dtype
for the P@V product.  Tested against the einsum path fwd+grad in
tests/test_pallas_attention.py (interpret mode on CPU, like the other
Pallas kernels — Mosaic has no CPU backend).

Partitioning: a raw ``pallas_call`` is opaque to GSPMD/Shardy — inside a
jit over a device mesh it would silently all-gather its operands and run
the GLOBAL batch on every chip.  Both kernels are wrapped in
``custom_partitioning`` with two shardable dims:

- **batch** (dim 0, the flattened B*heads): pure data parallelism — each
  chip runs its local shard, no collectives.
- **query tokens** (dim 1 of q/do/out): spatial parallelism — under
  ``runtime.mesh.space`` the image rows (hence the flattened H*W query
  tokens) are sharded, while K/V are small (<=512 tokens after spatial
  reduction) and stay replicated, so the forward is still embarrassingly
  parallel: each chip attends its local query tile against the full
  resident K/V block.  Only the backward needs communication — the local
  dK/dV partials are one ``psum`` over the query-sharding axes (inserted
  inside the partition lower_fn; custom_partitioning lowers it with all
  mesh axes manual, same as shard_map).

The K/V token dim and the head dim are declared need-replication.  The
``model`` axis would split heads — stage 1 of every MiT variant has a
single head, so there is nothing to split; the builder rejects that
combination loudly (models/deeplab_v2.py:build_seg_model) and the einsum
path serves tensor-parallel meshes.

Backward-precision note: dS is cast to the compute dtype before the dQ/dK
matmuls (standard flash-attention practice — full-MXU-rate bf16 inputs);
the einsum path's autodiff keeps dS in f32 for those two products.  In
bf16 training the gradients therefore agree to bf16 tolerance, not
bit-exactly; tests/test_pallas_attention.py bounds the drift.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

NEG_INF = -1e30


def sra_attention_reference(q, k, v):
    """The plain-XLA einsum path — the exact math the fused kernel must
    match: f32 scores, f32 softmax, P cast back to the compute dtype for
    P@V.  This is the SINGLE copy of the reference math: production
    non-fused attention (models/segformer.py:EfficientAttention), the
    parity tests, and the TPU profiler all call it, so a numerics change
    here cannot leave a stale twin behind.

    q: [B, N_q, H, D]; k, v: [B, N_kv, H, D] -> [B, N_q, H, D] in q's dtype.
    """
    head_dim = q.shape[-1]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * (1.0 / head_dim**0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _pick_tile_q(n_kv_pad: int) -> int:
    # keep the f32 score tiles (fwd: 2, bwd: ~4 live) well inside VMEM
    if n_kv_pad <= 1024:
        return 512
    return 256


def _softmax_rows(s):
    """Row softmax in f32; returns (p, nothing-saved) — KV is resident, no
    online rescaling needed."""
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _scores(q_ref, k_ref, scale, n_kv):
    """[TQ, NKVP] f32 scaled scores with padded KV columns masked to -inf."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    n_kv_pad = s.shape[1]
    if n_kv_pad != n_kv:  # static: mask the pad columns out of the softmax
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_kv, s, NEG_INF)
    return s


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_kv):
    p = _softmax_rows(_scores(q_ref, k_ref, scale, n_kv))
    p_lo = p.astype(v_ref.dtype)  # match the XLA path's post-softmax cast
    o = jax.lax.dot_general(
        p_lo, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, n_kv):
    iq = pl.program_id(1)
    p = _softmax_rows(_scores(q_ref, k_ref, scale, n_kv))  # [TQ, NKVP] f32
    lo = v_ref.dtype
    p_lo = p.astype(lo)
    do = do_ref[0]  # [TQ, D]

    # dV += P^T dO ; dP = dO V^T ; dS = P*(dP - rowsum(P*dP))*scale
    dv_tile = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NKVP, D]
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, NKVP]
    delta = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(lo)

    dq_ref[0] = jax.lax.dot_general(
        ds, k_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_tile = jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NKVP, D]

    # the (bh, 0) dK/dV blocks are revisited across the (inner) query-tile
    # grid axis; TPU grids run sequentially, so accumulate in place
    @pl.when(iq == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    dk_ref[0] += dk_tile
    dv_ref[0] += dv_tile


def _pad_axis1(x, to):
    return x if x.shape[1] == to else jnp.pad(x, ((0, 0), (0, to - x.shape[1]), (0, 0)))


def _flatten_heads(x):
    """[B, N, H, D] -> [B*H, N, D]."""
    b, n, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _unflatten_heads(x, b, h):
    bh, n, d = x.shape
    return x.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _fwd_pallas(q, k, v, interpret):
    (bh, n_q, d), n_kv = q.shape, k.shape[1]
    scale = 1.0 / (d ** 0.5)
    n_kv_pad = -(-n_kv // 128) * 128
    tq = _pick_tile_q(n_kv_pad)
    n_q_pad = -(-n_q // tq) * tq
    qp = _pad_axis1(q, n_q_pad)
    kp, vp = _pad_axis1(k, n_kv_pad), _pad_axis1(v, n_kv_pad)

    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, n_kv=n_kv),
        grid=(bh, n_q_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n_q]


def _bwd_pallas(q, k, v, do, interpret):
    (bh, n_q, d), n_kv = q.shape, k.shape[1]
    scale = 1.0 / (d ** 0.5)
    n_kv_pad = -(-n_kv // 128) * 128
    tq = _pick_tile_q(n_kv_pad)
    n_q_pad = -(-n_q // tq) * tq
    qp, dop = _pad_axis1(q, n_q_pad), _pad_axis1(do, n_q_pad)
    kp, vp = _pad_axis1(k, n_kv_pad), _pad_axis1(v, n_kv_pad)

    qspec = pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, n_kv_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, n_kv=n_kv),
        grid=(bh, n_q_pad // tq),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[
            qspec,
            pl.BlockSpec((1, n_kv_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_kv_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_kv_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop)
    return dq[:, :n_q], dk[:, :n_kv], dv[:, :n_kv]


def _part_axes(part):
    """A PartitionSpec entry -> tuple of mesh axis names."""
    if part is None:
        return ()
    return tuple(part) if isinstance(part, tuple) else (part,)


def _common_shardings(mesh, arg_shapes, q_args):
    """ONE (batch, query-token) sharding pair for every operand and result.

    custom_partitioning hands each operand's propagated sharding
    independently, so q and k/v can arrive with DIFFERENT batch shardings
    (e.g. q data-sharded, k/v still replicated).  Returning those verbatim
    would make GSPMD reshard to exactly them and each chip would pair its
    local q shard with the first shard's k/v rows — silently wrong.  Pick
    the first operand whose batch dim is sharded and apply that spec to all
    operands/results; GSPMD inserts the reshards to match.  The query-token
    dim (dim 1 of the operands listed in ``q_args``) may additionally be
    sharded (spatial parallelism); K/V token and feature dims stay whole
    (the kernel needs resident KV).

    Returns ``(q_sharding, kv_sharding, q_axes)`` where ``q_axes`` are the
    mesh axes sharding the query-token dim (the backward psums dK/dV over
    them)."""
    batch = None
    for s in arg_shapes:
        spec = s.sharding.spec
        if len(spec) and spec[0] is not None:
            batch = spec[0]
            break
    qpart = None
    for i in q_args:
        spec = arg_shapes[i].sharding.spec
        if len(spec) > 1 and spec[1] is not None:
            qpart = spec[1]
            break
    # an axis cannot shard two dims at once: if propagation proposed the
    # same axis for batch and query tokens, the batch sharding wins
    q_axes = tuple(a for a in _part_axes(qpart) if a not in _part_axes(batch))
    if q_axes:
        n_shards = 1
        for a in q_axes:
            n_shards *= mesh.shape[a]
        n_q = arg_shapes[q_args[0]].shape[1]
        if n_q % n_shards:
            raise ValueError(
                f"fused SRA attention: the query-token dim ({n_q} tokens)"
                f" must divide evenly by the spatial sharding"
                f" ({n_shards} shards over mesh axes {q_axes}). Every"
                " attention stage's H*W must be divisible by mesh.space —"
                " pick a crop size whose smallest stage grid (H/32 x W/32"
                " for MiT trunks) is a multiple of mesh.space, or use the"
                " einsum attention path."
            )
    qpart = (q_axes if len(q_axes) > 1 else q_axes[0]) if q_axes else None
    q_sharding = NamedSharding(mesh, PartitionSpec(batch, qpart))
    kv_sharding = NamedSharding(mesh, PartitionSpec(batch))
    return q_sharding, kv_sharding, q_axes


@functools.lru_cache(maxsize=None)
def _fwd_op(interpret: bool):
    impl = functools.partial(_fwd_pallas, interpret=interpret)

    @custom_partitioning
    def fwd(q, k, v):
        return impl(q, k, v)

    def partition(mesh, arg_shapes, result_shape):
        qsh, kvsh, _ = _common_shardings(mesh, arg_shapes, q_args=(0,))
        # forward is embarrassingly parallel over batch AND query tokens
        # (resident K/V replicated): the local impl needs no collectives
        return mesh, impl, qsh, (qsh, kvsh, kvsh)

    def infer(mesh, arg_shapes, result_shape):
        return _common_shardings(mesh, arg_shapes, q_args=(0,))[0]

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # Shardy rule: factor order is first-appearance; need_replication
        # must list factors in that (index) order.  'q' may shard (spatial
        # parallelism); the K/V token and head dims must stay whole.
        sharding_rule="b q d, b k d, b k d -> b q d",
        need_replication_factors=("d", "k"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_op(interpret: bool):
    impl = functools.partial(_bwd_pallas, interpret=interpret)

    @custom_partitioning
    def bwd(q, k, v, do):
        return impl(q, k, v, do)

    def partition(mesh, arg_shapes, result_shape):
        qsh, kvsh, q_axes = _common_shardings(mesh, arg_shapes, q_args=(0, 3))

        def lower(q, k, v, do):
            # dq is local to each query shard; each shard's dk/dv are the
            # PARTIAL sums over its local query tokens — reduce over the
            # query-sharding axes (manual axes here, like shard_map)
            dq, dk, dv = impl(q, k, v, do)
            if q_axes:
                dk = jax.lax.psum(dk, q_axes)
                dv = jax.lax.psum(dv, q_axes)
            return dq, dk, dv

        return mesh, lower, (qsh, kvsh, kvsh), (qsh, kvsh, kvsh, qsh)

    def infer(mesh, arg_shapes, result_shape):
        qsh, kvsh, _ = _common_shardings(mesh, arg_shapes, q_args=(0, 3))
        return (qsh, kvsh, kvsh)

    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b q d, b k d, b k d, b q d -> b q d, b k d, b k d",
        need_replication_factors=("d", "k"),
    )
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sra_attention_flat(q, k, v, interpret):
    return _fwd_op(interpret)(q, k, v)


def _sra_fwd(q, k, v, interpret):
    return _fwd_op(interpret)(q, k, v), (q, k, v)


def _sra_bwd(interpret, res, g):
    q, k, v = res
    dq, dk, dv = _bwd_op(interpret)(q, k, v, g.astype(q.dtype))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_sra_attention_flat.defvjp(_sra_fwd, _sra_bwd)


def sra_attention(q, k, v, interpret: bool | None = None):
    """Fused multi-head attention for resident-KV shapes.

    q: [B, N_q, H, D]; k, v: [B, N_kv, H, D] with N_kv small enough that the
    padded K/V block (rounded up to 128 rows) fits VMEM. Returns
    [B, N_q, H, D] in q's dtype. Differentiable (custom flash-style VJP).

    Spatial parallelism: when the query-token dim is sharded over mesh axes
    (``runtime.mesh.space``), N_q must divide evenly by the product of those
    axis sizes — for MiT trunks that means every stage's H*W token count,
    so the smallest stage grid (H/32 x W/32) must be a multiple of
    mesh.space. Uneven shards fail at partition time with a clear error
    (``_common_shardings``).
    """
    if interpret is None:  # Mosaic has no CPU backend; tests interpret
        interpret = jax.default_backend() == "cpu"
    b, _, h, _ = q.shape
    out = _sra_attention_flat(
        _flatten_heads(q), _flatten_heads(k), _flatten_heads(v), interpret
    )
    return _unflatten_heads(out, b, h)
