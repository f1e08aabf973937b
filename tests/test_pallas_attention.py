"""Fused SRA attention Pallas kernel vs the einsum path (interpret mode).

Covers the forward, the custom flash-style VJP (dq/dk/dv vs jax.grad of the
einsum reference), pad handling (N_q not a tile multiple, N_kv not a
128-multiple), bf16, and the end-to-end SegFormer wiring
(runtime.fused_attention) — same train step, same param tree.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiast_tpu.ops.pallas.attention import sra_attention

# the production XLA path (models/segformer.py:EfficientAttention routes
# through this exact function when fused=False) — the single reference copy
from hiast_tpu.ops.pallas.attention import sra_attention_reference as einsum_attention

RNG = np.random.default_rng(11)


def make_qkv(b, nq, nkv, h, d, dtype):
    q = RNG.normal(size=(b, nq, h, d)).astype(np.float32)
    k = RNG.normal(size=(b, nkv, h, d)).astype(np.float32)
    v = RNG.normal(size=(b, nkv, h, d)).astype(np.float32)
    return tuple(jnp.asarray(x, dtype) for x in (q, k, v))


@pytest.mark.parametrize(
    "b,nq,nkv,h,d",
    [
        (2, 512, 128, 1, 64),     # exact tile fit
        (1, 700, 96, 2, 64),      # nq pad + nkv pad (96 -> 128)
        (2, 1024, 512, 5, 64),    # stage-3-like multi-head
        (1, 300, 1200, 2, 32),    # nkv > 1024 -> smaller q tile; d=32
    ],
)
def test_forward_matches_einsum(b, nq, nkv, h, d):
    q, k, v = make_qkv(b, nq, nkv, h, d, jnp.float32)
    got = sra_attention(q, k, v, interpret=True)
    want = einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_forward_bf16():
    q, k, v = make_qkv(2, 640, 160, 2, 64, jnp.bfloat16)
    got = sra_attention(q, k, v, interpret=True)
    want = einsum_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.02, atol=0.02
    )


@pytest.mark.parametrize("b,nq,nkv,h,d", [(1, 512, 128, 1, 64), (2, 700, 96, 2, 32)])
def test_grads_match_einsum(b, nq, nkv, h, d):
    q, k, v = make_qkv(b, nq, nkv, h, d, jnp.float32)
    # a non-uniform loss weighting so every cotangent row is distinct
    w = jnp.asarray(RNG.normal(size=(b, nq, h, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(sra_attention(q, k, v, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v) * w)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_bf16_grads_within_bf16_tolerance():
    """bf16 is the production dtype; the kernel's backward casts dS to bf16
    before the dQ/dK matmuls (flash-attention practice) where the einsum
    autodiff keeps f32 — bound the drift at bf16 resolution."""
    q, k, v = make_qkv(1, 512, 128, 2, 64, jnp.bfloat16)
    w = jnp.asarray(RNG.normal(size=(1, 512, 2, 64)).astype(np.float32))

    def loss(attn_fn):
        def f(q, k, v):
            return jnp.sum(attn_fn(q, k, v).astype(jnp.float32) * w)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    got = loss(functools.partial(sra_attention, interpret=True))
    want = loss(einsum_attention)
    for g, r, name in zip(got, want, "qkv"):
        g, r = np.asarray(g, np.float32), np.asarray(r, np.float32)
        scale = np.abs(r).max()
        np.testing.assert_allclose(g, r, atol=0.03 * scale, rtol=0.1, err_msg=name)


def test_sharded_batch_stays_sharded():
    """Under a jit over the 8-device 'data' mesh, the custom_partitioning
    wrapper must keep the op per-shard: output sharding preserved (no
    silent all-gather-and-replicate) and values equal to unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v = make_qkv(8, 256, 96, 2, 64, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    s = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, s) for x in (q, k, v))

    f = jax.jit(lambda q, k, v: sra_attention(q, k, v, interpret=True))
    out = f(qs, ks, vs)
    assert out.sharding.spec == P("data"), out.sharding
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f(q, k, v)), rtol=1e-6, atol=1e-6
    )

    # gradients partition too (the backward op has its own sharding rule)
    def loss(q, k, v):
        return jnp.sum(sra_attention(q, k, v, interpret=True) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    gs, gr = g(qs, ks, vs), g(q, k, v)
    for a, b, name in zip(gs, gr, "qkv"):
        assert a.sharding.spec == P("data"), (name, a.sharding)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_mismatched_operand_shardings_agree():
    """custom_partitioning hands each operand's propagated sharding
    independently: with q batch-sharded but k/v replicated the partition
    rule must impose ONE common batch sharding (GSPMD reshards k/v to
    match) — not pair every chip's q shard with the first shard's k/v."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v = make_qkv(8, 256, 96, 2, 64, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    want = np.asarray(jax.jit(lambda q, k, v: sra_attention(q, k, v, interpret=True))(q, k, v))

    f = jax.jit(
        lambda q, k, v: sra_attention(q, k, v, interpret=True),
        in_shardings=(sharded, repl, repl),
    )
    np.testing.assert_allclose(np.asarray(f(q, k, v)), want, rtol=1e-6, atol=1e-6)

    # and the flipped case: q replicated, k/v sharded
    g = jax.jit(
        lambda q, k, v: sra_attention(q, k, v, interpret=True),
        in_shardings=(repl, sharded, sharded),
    )
    np.testing.assert_allclose(np.asarray(g(q, k, v)), want, rtol=1e-6, atol=1e-6)


def test_segformer_fused_step_matches_einsum_step():
    """runtime.fused_attention=True must not change the SegFormer training
    step: identical param tree, matching losses and updated params."""
    from helpers import assert_same_step, make_b0_batch, run_b0_self_training_step

    batch = make_b0_batch(seed=7)

    def run(fused: bool):
        def mutate(cfg):
            cfg.runtime.fused_attention = fused

        return run_b0_self_training_step(batch, mutate)

    # param atol is one Adam-update scale: on ~zero grads m/sqrt(v)
    # amplifies float-associativity noise between the two (equivalent)
    # attention lowerings to a full +/-update sign flip.  The sharp
    # equivalence check is the loss rtol; params bound the trajectory.
    assert_same_step(
        run(False), run(True), "fused_attention",
        loss_rtol=1e-4, param_rtol=5e-3, param_atol=5e-4,
    )


def test_per_stage_fused_mix_matches_einsum_step():
    """runtime.fused_attention as a 4-list routes each MiT stage to fused or
    einsum attention independently (the production mix: stage 4 measured as
    a wash, PERF.md) — same param tree, same step as the all-einsum
    baseline."""
    from helpers import assert_same_step, make_b0_batch, run_b0_self_training_step

    batch = make_b0_batch(seed=11)

    def mutate(cfg):
        cfg.runtime.fused_attention = [True, True, True, False]

    assert_same_step(
        run_b0_self_training_step(batch),
        run_b0_self_training_step(batch, mutate),
        "per_stage_mix",
        loss_rtol=1e-4, param_rtol=5e-3, param_atol=5e-4,
    )


def test_fused_attention_composes_with_block_remat():
    """The production MiT-B5 configuration is per-block remat + fused
    attention together (custom_vjp inside nn.remat): same step as the
    plain einsum/no-remat baseline."""
    from helpers import assert_same_step, make_b0_batch, run_b0_self_training_step

    batch = make_b0_batch(seed=13)

    def mutate(cfg):
        cfg.runtime.remat = True
        cfg.runtime.remat_mode = "blocks"
        cfg.runtime.fused_attention = True

    assert_same_step(
        run_b0_self_training_step(batch),
        run_b0_self_training_step(batch, mutate),
        "blocks+fused",
        loss_rtol=1e-4, param_rtol=5e-3, param_atol=5e-4,
    )


def test_fused_attention_rejects_tensor_parallelism():
    """'model' would split heads; MiT stage 1 has ONE head — nothing to
    split, so the builder fails loudly.  'space' is supported (query-token
    sharding, see test_query_dim_sharded_over_space)."""
    from hiast_tpu.config import default_config
    from hiast_tpu.models.deeplab_v2 import build_seg_model
    from hiast_tpu.registry import populate

    populate()
    cfg = default_config()
    cfg.model.seg_model.type = "SegFormer_B0"
    cfg.runtime.fused_attention = True
    cfg.runtime.mesh.model = 2
    with pytest.raises(ValueError, match="fused_attention"):
        build_seg_model(cfg)

    cfg.runtime.mesh.model = 1
    cfg.runtime.mesh.space = 2
    build_seg_model(cfg)  # spatial parallelism is supported


def test_query_dim_sharded_over_space():
    """Spatial parallelism: query tokens sharded over 'space' (image rows),
    K/V replicated.  Forward must stay per-shard (output keeps the query
    sharding); backward must psum the partial dK/dV over 'space' so the
    gradients equal the unsharded run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v = make_qkv(4, 512, 96, 2, 64, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "space"))
    # [B, N, H, D]: batch over 'data', tokens over 'space'; K/V batch-only
    qsh = NamedSharding(mesh, P("data", "space"))
    kvsh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(q, qsh)
    ks, vs = jax.device_put(k, kvsh), jax.device_put(v, kvsh)

    f = jax.jit(lambda q, k, v: sra_attention(q, k, v, interpret=True))
    out = f(qs, ks, vs)
    # the flat op sees [B*H, N, D]; jit's output here is [B, N, H, D] with
    # tokens on dim 1 — assert tokens stayed sharded over 'space'
    assert out.sharding.spec[1] == "space", out.sharding
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f(q, k, v)), rtol=1e-6, atol=1e-6
    )

    w = jnp.asarray(RNG.normal(size=q.shape).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(sra_attention(q, k, v, interpret=True) * w)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    gs = g(qs, ks, vs)
    gr = g(q, k, v)
    for a, b, name in zip(gs, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_uneven_query_shard_fails_loudly():
    """ADVICE r3: an N_q that does not divide by the spatial sharding must
    surface the clear builder-facing message, not an opaque XLA error.
    Exercised at the partition-callback level: a direct device_put of an
    uneven sharding is already rejected by JAX upstream, but GSPMD
    propagation inside a program can still propose one."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hiast_tpu.ops.pallas import attention as A

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "space"))

    class FakeArg:
        def __init__(self, shape, spec):
            self.shape = shape
            self.sharding = NamedSharding(mesh, spec)

    args = [
        FakeArg((2, 510, 64), P("data", "space")),  # 510 % 4 != 0
        FakeArg((2, 96, 64), P("data")),
        FakeArg((2, 96, 64), P("data")),
    ]
    with pytest.raises(ValueError, match="divide evenly"):
        A._common_shardings(mesh, args, q_args=(0,))

    # and the even case still returns the query-token sharding
    args[0] = FakeArg((2, 512, 64), P("data", "space"))
    qsh, kvsh, q_axes = A._common_shardings(mesh, args, q_args=(0,))
    assert q_axes == ("space",)
