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

RNG = np.random.default_rng(11)


def einsum_attention(q, k, v):
    """The XLA path from models/segformer.py:EfficientAttention, verbatim
    math: f32 scores + softmax, compute-dtype P@V."""
    head_dim = q.shape[-1]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * (1.0 / head_dim**0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


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


def test_segformer_fused_step_matches_einsum_step():
    """runtime.fused_attention=True must not change the SegFormer training
    step: identical param tree, matching losses and updated params."""
    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_self_training_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    batch = {
        "t_img": RNG.integers(0, 255, size=(2, 64, 128, 3)).astype(np.uint8),
        "t_plbl": RNG.integers(0, 19, size=(2, 64, 128)).astype(np.int32),
    }

    def run(fused: bool):
        cfg = default_config()
        cfg.model.type = "SelfTrainingSegmentor"
        cfg.model.seg_model.type = "SegFormer_B0"
        cfg.runtime.fused_attention = fused
        segmentor = build_segmentor(cfg, dtype=jnp.float32)
        variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, 64, 128, 3))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        step = jax.jit(make_self_training_step(segmentor, tx))
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        return new_state, losses

    ref_state, ref_losses = run(False)
    got_state, got_losses = run(True)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(got_state.params)
    assert [p for p, _ in got_leaves] == [p for p, _ in ref_leaves]
    for name in ref_losses:
        np.testing.assert_allclose(
            float(got_losses[name]), float(ref_losses[name]), rtol=1e-4, err_msg=name
        )
    for (path, a), (_, b) in zip(ref_leaves, got_leaves):
        # atol is one Adam-update scale: on ~zero grads m/sqrt(v) amplifies
        # float-associativity noise between the two (equivalent) attention
        # lowerings to a full +/-update sign flip.  The sharp equivalence
        # check is the loss comparison above; this bounds the trajectory.
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_attention_rejects_model_parallelism():
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
