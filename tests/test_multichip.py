"""Multi-device semantics tests (8 virtual CPU devices):

- IAS pseudo-label generation over a sharded batch produces EXACTLY the
  state/labels of the unsharded run (the histogram reduction is global under
  jit — the SURVEY §7 'sequential EMA dependence' hard part).
- sharded validation step matches unsharded IoU areas.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiast_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from hiast_tpu.pseudo import policies as P

RNG = np.random.default_rng(5)
C, BINS = 19, 512


def ias_step(logits, state):
    maxprob, pred = P.confidences(logits)
    hist = P.class_prob_histogram(maxprob, pred, C, BINS)
    new_thr = P.ias_update(state, hist, 0.5, 0.9, 8.0)
    plbl = P.select_pseudo_labels(maxprob, pred, new_thr)
    counts = P.per_sample_class_counts(plbl, C)
    sums, totals = P.class_prob_sums(plbl, maxprob, C)
    new_cmp = P.update_class_mean_probs(state.class_mean_probs, sums, totals, 0.99)
    return plbl, counts, P.IASState(new_thr, new_cmp)


def test_sharded_ias_equals_unsharded(eight_devices):
    mesh = make_mesh()
    logits = RNG.normal(size=(8, 16, 24, C)).astype(np.float32) * 3
    state = P.IASState(jnp.full((C,), 0.9), jnp.zeros((C,)))

    step = jax.jit(ias_step)
    plbl_ref, counts_ref, state_ref = step(jnp.asarray(logits), state)

    sharded_logits = jax.device_put(jnp.asarray(logits), batch_sharding(mesh))
    sharded_state = replicate(mesh, state)
    plbl_s, counts_s, state_s = step(sharded_logits, sharded_state)

    np.testing.assert_array_equal(np.asarray(plbl_s), np.asarray(plbl_ref))
    np.testing.assert_array_equal(np.asarray(counts_s), np.asarray(counts_ref))
    np.testing.assert_allclose(
        np.asarray(state_s.thresholds), np.asarray(state_ref.thresholds), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state_s.class_mean_probs),
        np.asarray(state_ref.class_mean_probs),
        atol=1e-6,
    )


def test_spatially_sharded_ias_equals_unsharded(eight_devices):
    """Pseudo-label generation with image ROWS sharded over 'space' (the
    generation-beyond-one-chip path, cli/generate_pseudo_labels.py) is
    bit-identical to the unsharded run."""
    from hiast_tpu.config import default_config
    from hiast_tpu.parallel.mesh import spatial_sharding

    cfg = default_config()
    cfg.runtime.mesh.space = 2
    cfg.train.batch_size = 4
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 4, "space": 2, "model": 1}
    logits = RNG.normal(size=(4, 16, 24, C)).astype(np.float32) * 3
    state = P.IASState(jnp.full((C,), 0.9), jnp.zeros((C,)))

    step = jax.jit(ias_step)
    plbl_ref, counts_ref, state_ref = step(jnp.asarray(logits), state)
    plbl_s, counts_s, state_s = step(
        jax.device_put(jnp.asarray(logits), spatial_sharding(mesh)),
        replicate(mesh, state),
    )
    np.testing.assert_array_equal(np.asarray(plbl_s), np.asarray(plbl_ref))
    np.testing.assert_array_equal(np.asarray(counts_s), np.asarray(counts_ref))
    np.testing.assert_allclose(
        np.asarray(state_s.thresholds), np.asarray(state_ref.thresholds), atol=1e-6
    )


def test_spatial_partition_step_matches_data_parallel(eight_devices):
    """Full HIAST consistency step on a (data=4, space=2) mesh — image rows
    sharded over chips, GSPMD halo exchanges — matches the pure-DP (data=8)
    run: same losses, same updated params (up to reduction-order noise)."""
    from tests.test_steps import init_state, make_batch, tiny_cfg
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import shard_batch
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_consistency_step

    populate()
    # SGD: the param diff then IS the gradient diff. (Adam's first step is
    # sign-like — m̂/√v̂ ≈ sign(g) from zero-init moments — so benign
    # reduction-order noise on near-zero grads would flip into 2·lr jumps.)
    cfg = tiny_cfg(**{
        "cst_training.is_enabled": True,
        "cst_training.cst_loss.weight": 0.5,
        "train.optimizer": "SGD",
    })
    segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
    state, tx, _ = init_state(cfg, segmentor, with_ema=True)
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug="CCA"))
    batch = make_batch(("t_img", "t_plbl"))
    key = jax.random.PRNGKey(3)

    results = {}
    for name, space in (("dp", 1), ("dp_sp", 2)):
        cfg.runtime.mesh.space = space
        mesh = make_mesh(cfg)
        assert mesh.shape["space"] == space
        new_state, losses = step(
            replicate(mesh, state), shard_batch(mesh, dict(batch)), key
        )
        results[name] = (
            {k: float(v) for k, v in losses.items()},
            np.asarray(new_state.params["aspp"]["conv2d_list_0"]["kernel"]),
        )

    for k, v in results["dp"][0].items():
        assert abs(results["dp_sp"][0][k] - v) < 1e-4, (k, v, results["dp_sp"][0][k])
    np.testing.assert_allclose(results["dp_sp"][1], results["dp"][1], atol=1e-6)


def test_segformer_spatially_sharded_forward_matches(eight_devices):
    """SegFormer under spatial sharding: the SRA attention's token dimension
    is the flattened sharded rows — GSPMD must still produce the unsharded
    numbers (collectives for the attention contractions)."""
    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import spatial_sharding
    from hiast_tpu.registry import populate

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = "SegFormer_B0"
    cfg.runtime.mesh.space = 2
    cfg.train.batch_size = 4
    segmentor = build_segmentor(cfg, dtype=jnp.float32)
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    img = jnp.asarray(RNG.normal(size=(4, 32, 64, 3)).astype(np.float32))

    fwd = jax.jit(lambda v, x: segmentor.forward(v, x, train=False)["logits"])
    want = np.asarray(fwd(variables, img))
    mesh = make_mesh(cfg)
    got = np.asarray(
        fwd(replicate(mesh, variables), jax.device_put(img, spatial_sharding(mesh)))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_segformer_fused_attention_sharded_step_matches(eight_devices):
    """The production SegFormer config (per-block remat + fused Pallas
    attention) through the FULL jitted self-training step on a data=8 mesh:
    the custom_partitioning op runs inside nn.remat under GSPMD and must
    reproduce the unsharded step (losses and updated params)."""
    from tests.test_steps import init_state, make_batch, tiny_cfg
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import shard_batch
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_self_training_step

    populate()
    # SGD for the same reason as the spatial test: the param diff then IS
    # the gradient diff, immune to Adam's first-step sign amplification.
    cfg = tiny_cfg(**{
        "model.seg_model.type": "SegFormer_B0",
        "train.optimizer": "SGD",
        "runtime.remat": True,
        "runtime.remat_mode": "blocks",
        "runtime.fused_attention": True,
    })
    segmentor = build_segmentor(cfg, dtype=jnp.float32)
    state, tx, _ = init_state(cfg, segmentor)
    step = jax.jit(make_self_training_step(segmentor, tx))
    batch = make_batch(("t_img", "t_plbl"))
    key = jax.random.PRNGKey(5)

    want_state, want_losses = step(state, dict(batch), key)
    mesh = make_mesh(cfg)
    assert mesh.shape["data"] == 8, mesh.shape
    got_state, got_losses = step(
        replicate(mesh, state), shard_batch(mesh, dict(batch)), key
    )

    for k, v in want_losses.items():
        assert abs(float(got_losses[k]) - float(v)) < 1e-4, (k, float(v))
    k_ref = np.asarray(
        want_state.params["backbone"]["block1_0"]["attn"]["q"]["kernel"]
    )
    k_got = np.asarray(
        got_state.params["backbone"]["block1_0"]["attn"]["q"]["kernel"]
    )
    np.testing.assert_allclose(k_got, k_ref, atol=1e-6)


def test_segformer_spatial_step_partitions_cleanly(eight_devices, capfd):
    """The SegFormer dp x sp backward must partition WITHOUT the GSPMD
    "Involuntary full rematerialization" fallback (a full gradient-tensor
    replicate + repartition per step on real hardware).  Pinned by the SRA
    K/V replication constraint (parallel/hints.py) — this test regresses the
    round-4 defect by compiling the step fresh and scanning the partitioner's
    stderr."""
    from tests.test_steps import init_state, make_batch, tiny_cfg
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import shard_batch
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_self_training_step

    populate()
    cfg = tiny_cfg(**{
        "model.seg_model.type": "SegFormer_B0",
        "train.optimizer": "SGD",
        "train.batch_size": 4,
        "runtime.mesh.space": 2,
        "runtime.remat": True,
        "runtime.remat_mode": "blocks",
        "runtime.fused_attention": True,
    })
    segmentor = build_segmentor(cfg, dtype=jnp.float32)
    mesh = make_mesh(cfg)  # publishes the hint the constraint reads at trace
    assert mesh.shape == {"data": 4, "space": 2, "model": 1}
    state, tx, _ = init_state(cfg, segmentor)
    batch = make_batch(("t_img", "t_plbl"), batch=4)
    step = jax.jit(make_self_training_step(segmentor, tx))
    capfd.readouterr()  # drop setup noise; capture the compile only
    _, losses = step(replicate(mesh, state), shard_batch(mesh, dict(batch)),
                     jax.random.PRNGKey(7))
    assert np.isfinite(float(losses["target_seg_loss"]))
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]


def test_tensor_parallel_step_matches_data_parallel(eight_devices):
    """Full HIAST consistency step on a (data=4, model=2) mesh — parameters,
    EMA, and optimizer moments channel-sharded over 'model'
    (mesh.shard_state), GSPMD-inserted collectives — matches the pure-DP
    (data=8) run: same losses, same updated params."""
    from tests.test_steps import init_state, make_batch, tiny_cfg
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import shard_batch, shard_state
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_consistency_step

    populate()
    # SGD for the same reason as the spatial test above: reduction-order
    # noise must not be amplified by Adam's sign-like first step.
    cfg = tiny_cfg(**{
        "cst_training.is_enabled": True,
        "cst_training.cst_loss.weight": 0.5,
        "train.optimizer": "SGD",
    })
    segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
    state, tx, _ = init_state(cfg, segmentor, with_ema=True)
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug="CCA"))
    batch = make_batch(("t_img", "t_plbl"))
    key = jax.random.PRNGKey(3)

    results = {}
    for name, model in (("dp", 1), ("dp_tp", 2)):
        cfg.runtime.mesh.model = model
        mesh = make_mesh(cfg)
        assert mesh.shape["model"] == model
        placed = shard_state(mesh, state)
        if model > 1:
            # the placement must actually split channels across devices
            kernel = placed.params["backbone"]["conv1"]["kernel"]
            shard = kernel.addressable_shards[0].data
            assert shard.shape[-1] * model == kernel.shape[-1], (
                shard.shape, kernel.shape
            )
            # the SGD chain is (add_decayed_weights, trace, ...): index 1
            mu = placed.opt_state[1].trace["backbone"]["conv1"]["kernel"]
            assert mu.addressable_shards[0].data.shape == shard.shape
        new_state, losses = step(placed, shard_batch(mesh, dict(batch)), key)
        results[name] = (
            {k: float(v) for k, v in losses.items()},
            np.asarray(new_state.params["backbone"]["conv1"]["kernel"]),
        )

    for k, v in results["dp"][0].items():
        assert abs(results["dp_tp"][0][k] - v) < 1e-4, (k, v, results["dp_tp"][0][k])
    np.testing.assert_allclose(results["dp_tp"][1], results["dp"][1], atol=1e-6)


def test_segformer_tensor_parallel_forward_matches(eight_devices):
    """SegFormer with channel-sharded params (the backbone family tensor
    parallelism exists FOR — attention qkv/mlp dense kernels split over
    'model'): GSPMD must still produce the unsharded numbers."""
    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.parallel.mesh import shard_batch, shard_state
    from hiast_tpu.registry import populate

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = "SegFormer_B0"
    cfg.runtime.mesh.model = 2
    cfg.train.batch_size = 4
    segmentor = build_segmentor(cfg, dtype=jnp.float32)
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    img = jnp.asarray(RNG.normal(size=(4, 32, 64, 3)).astype(np.float32))

    fwd = jax.jit(lambda v, x: segmentor.forward(v, x, train=False)["logits"])
    want = np.asarray(fwd(variables, img))
    mesh = make_mesh(cfg)
    assert mesh.shape["model"] == 2
    placed = shard_state(mesh, variables)
    # at least one dense kernel must actually be split
    flat = jax.tree_util.tree_leaves_with_path(placed["params"])
    split = [
        x for _, x in flat
        if x.ndim >= 2 and x.addressable_shards[0].data.shape[-1] < x.shape[-1]
    ]
    assert split, "no parameter was model-sharded"
    got = np.asarray(fwd(placed, shard_batch(mesh, img)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_validator_and_pseudo_forward_on_model_mesh(eight_devices):
    """The standalone Validator and the pseudo-gen forward accept the same
    tensor-parallel mesh configs as training (weights channel-sharded via
    mesh.shard_state) and produce the unsharded numbers — TP is uniform
    across every entry point, not a train-only mode."""
    from hiast_tpu.cli.generate_pseudo_labels import make_forward
    from hiast_tpu.config import default_config
    from hiast_tpu.evaluation import Validator
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate

    populate()
    cfg = default_config()
    cfg.model.type = "SourceOnlySegmentor"
    cfg.validate.resize_sizes = [[16, 32]]
    cfg.validate.batch_size = 4
    cfg.pseudo_policy.batch_size = 4
    seg = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
    v = seg.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}

    img = RNG.integers(0, 255, size=(4, 32, 64, 3)).astype(np.uint8)
    lbl = RNG.integers(0, C, size=(4, 32, 64)).astype(np.uint8)

    def data_iter():
        yield {
            "images": img,
            "labels": lbl,
            "image_paths": [f"{i}.png" for i in range(4)],
        }

    val, gen = {}, {}
    for model in (1, 2):
        cfg.runtime.mesh.model = model
        validator = Validator(cfg, seg, variables)
        assert validator.mesh.shape["model"] == model
        if model > 1:
            kernel = validator.variables["params"]["backbone"]["conv1"]["kernel"]
            shard = kernel.addressable_shards[0].data
            assert shard.shape[-1] * model == kernel.shape[-1]
        val[model] = validator.run(data_iter())
        gen[model] = np.asarray(make_forward(cfg, seg, variables)(img)["full"])

    np.testing.assert_allclose(val[2]["iou"], val[1]["iou"], atol=1e-6)
    assert val[2]["miou"] == pytest.approx(val[1]["miou"], abs=1e-6)
    np.testing.assert_allclose(gen[2], gen[1], atol=1e-4)


def test_model_axis_validated(eight_devices):
    from hiast_tpu.config import default_config

    cfg = default_config()
    cfg.runtime.mesh.model = 16  # more than the 8 devices
    with pytest.raises(ValueError, match="model"):
        make_mesh(cfg)

    # jointly too large even though each axis fits individually: must be a
    # descriptive ValueError, not ZeroDivisionError from the data auto-size
    cfg2 = default_config()
    cfg2.runtime.mesh.space = 4
    cfg2.runtime.mesh.model = 4
    cfg2.train.batch_size = 8
    with pytest.raises(ValueError, match="exceeds"):
        make_mesh(cfg2)


def test_sharded_validation_matches(eight_devices):
    from hiast_tpu.ops.metrics import intersection_and_union

    mesh = make_mesh()
    pred = RNG.integers(0, C, size=(8, 32, 32)).astype(np.int32)
    target = np.where(
        RNG.random(size=(8, 32, 32)) < 0.2, 255, RNG.integers(0, C, size=(8, 32, 32))
    ).astype(np.int32)
    fn = jax.jit(lambda p, t: intersection_and_union(p, t, C))
    i_ref, u_ref = fn(jnp.asarray(pred), jnp.asarray(target))
    sharding = batch_sharding(mesh)
    i_s, u_s = fn(jax.device_put(jnp.asarray(pred), sharding), jax.device_put(jnp.asarray(target), sharding))
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_ref))
