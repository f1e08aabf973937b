"""Shared test fixtures: the SegFormer-B0 self-training step harness.

Several equivalence tests (remat modes, fused attention) run the SAME
jitted SelfTrainingSegmentor step under different runtime configs and
compare trajectories; this is the single copy of that harness.
"""
import jax
import jax.numpy as jnp
import numpy as np


def make_b0_batch(seed: int = 3, b: int = 2, h: int = 64, w: int = 128):
    rng = np.random.default_rng(seed)
    return {
        "t_img": rng.integers(0, 255, size=(b, h, w, 3)).astype(np.uint8),
        "t_plbl": rng.integers(0, 19, size=(b, h, w)).astype(np.int32),
    }


def run_b0_self_training_step(batch, cfg_mutator=None, dtype=jnp.float32):
    """Build a SegFormer-B0 SelfTrainingSegmentor, run ONE jitted
    self-training step (fixed seeds), return (new_state, losses).

    ``cfg_mutator(cfg)`` tweaks runtime/model keys before the build.
    """
    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_self_training_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = "SegFormer_B0"
    if cfg_mutator is not None:
        cfg_mutator(cfg)
    segmentor = build_segmentor(cfg, dtype=dtype)
    h, w = batch["t_img"].shape[1:3]
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    step = jax.jit(make_self_training_step(segmentor, tx))
    return step(state, batch, jax.random.PRNGKey(1))


def assert_same_step(ref, got, label, loss_rtol=1e-5, param_rtol=2e-4, param_atol=1e-7):
    """Assert two (state, losses) step results share the param tree and
    match to tolerance."""
    ref_state, ref_losses = ref
    got_state, got_losses = got
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(got_state.params)
    assert [p for p, _ in got_leaves] == [p for p, _ in ref_leaves], label
    for k in ref_losses:
        np.testing.assert_allclose(
            float(got_losses[k]), float(ref_losses[k]), rtol=loss_rtol,
            err_msg=f"{label}/{k}",
        )
    for (path, a), (_, b) in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=param_rtol, atol=param_atol,
            err_msg=f"{label}/{jax.tree_util.keystr(path)}",
        )
