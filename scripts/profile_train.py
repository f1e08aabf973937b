"""Ablate the HIAST consistency train step on the real TPU: time each
variant to attribute cost (teacher fwd, CCA aug, full-res losses, backward)
AND its MFU (XLA cost-analysis FLOPs / wall / chip peak) — the per-variant
MFU decomposition is the headroom proof: if the fwd+bwd-only step already
runs at the measured per-conv ceiling, the full step's lower MFU is
arithmetic dilution by the teacher forward (fewer FLOPs/s by nature: no
backward to amortize its bandwidth) and the zero-FLOP CCA pass, not
unclaimed compute.

Run: python scripts/profile_train.py  (one TPU process at a time)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, iters=10, windows=3):
    fn()
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            fn()
        best = min(best, (time.time() - t0) / iters)
    return best


def timeit_pipelined(dispatch, fetch, iters=10, windows=3):
    """Time with async dispatch: enqueue ``iters`` programs back-to-back,
    sync ONCE by fetching a scalar from the last output (``fetch``).

    ``timeit`` syncs per call, so every iteration carries the tunnel's
    ~25 ms scalar-fetch roundtrip — dominating sub-50 ms programs.  The
    production loops and the bench windows dispatch one step deep and
    fetch behind; this measures the same pattern.  Programs execute in
    dispatch order, so fetching the last output syncs the whole window.
    """
    out = dispatch()
    fetch(out)  # warm (compile + first load)
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = dispatch()
        fetch(out)
        best = min(best, (time.time() - t0) / iters)
    return best


def flops_of(jitted, *args):
    from bench import _compiled_flops  # ONE copy of the cost-analysis idiom

    return _compiled_flops(jitted, *args)[0]  # (flops, hbm) -> flops


def measure(report, tag, jitted, run, *flop_args):
    from hiast_tpu.runtime_init import chip_peak_flops

    dt = timeit(run)
    report[tag] = dt
    flops = flops_of(jitted, *flop_args)
    peak = chip_peak_flops()
    if flops and peak:
        report[f"{tag}_mfu"] = flops / dt / peak


def main(batch_size=8, h=512, w=1024):
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain import steps as S
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    report = {"batch": batch_size, "hw": [h, w]}
    rng = np.random.default_rng(0)
    batch = {
        "t_img": jnp.asarray(rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8)),
        "t_plbl": jnp.asarray(
            np.where(
                rng.random(size=(batch_size, h, w)) < 0.4,
                255,
                rng.integers(0, 19, size=(batch_size, h, w)),
            ).astype(np.int32)
        ),
    }
    s_batch = {"s_img": batch["t_img"], "s_lbl": jnp.asarray(np.minimum(np.asarray(batch["t_plbl"]), 18))}
    key = jax.random.PRNGKey(1)

    def build(loss_res="full"):
        cfg = default_config()
        cfg.model.type = "SelfTrainingSegmentor"
        cfg.cst_training.is_enabled = True
        cfg.cst_training.cst_loss.weight = 0.5
        cfg.train.batch_size = batch_size
        cfg.train.lr = 3e-6
        cfg.train.total_iter = 8000
        cfg.train.loss_resolution = loss_res
        segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
        variables = segmentor.init_variables(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            ema_params=jax.tree.map(jnp.copy, variables["params"]),
        )
        return cfg, segmentor, tx, state, variables

    cfg, segmentor, tx, state, variables = build()

    # 1) full consistency step (bench baseline)
    step_full = jax.jit(S.make_consistency_step(segmentor, tx, strong_aug="CCA"))
    measure(report, "consistency_cca_full", step_full,
            lambda: sync(step_full(state, batch, key)[1]["target_seg_loss"]),
            state, batch, key)

    # 2) consistency without on-device CCA (weak==strong)
    step_nocca = jax.jit(S.make_consistency_step(segmentor, tx, strong_aug=None))
    measure(report, "consistency_nocca", step_nocca,
            lambda: sync(step_nocca(state, batch, key)[1]["target_seg_loss"]),
            state, batch, key)

    # 3) plain self-training step (no teacher fwd, no cst loss)
    step_st = jax.jit(S.make_self_training_step(segmentor, tx))
    measure(report, "self_training", step_st,
            lambda: sync(step_st(state, batch, key)[1]["target_seg_loss"]),
            state, batch, key)

    # 4) source-only step (plain CE only — no KLD/entropy region losses)
    cfg2, seg2, tx2, state2, _ = build()
    seg2.cfg.model.type = "SourceOnlySegmentor"
    from hiast_tpu.models.segmentors import SourceOnlySegmentor

    seg_so = SourceOnlySegmentor(cfg2, dtype=jnp.bfloat16)
    seg_so.module = seg2.module
    step_so = jax.jit(S.make_source_only_step(seg_so, tx2))
    measure(report, "source_only", step_so,
            lambda: sync(step_so(state2, s_batch, key)[1]["seg_loss"]),
            state2, s_batch, key)

    # 5) eval forward only (teacher-cost proxy)
    fwd = jax.jit(S.make_eval_forward(segmentor))
    measure(report, "fwd_only", fwd,
            lambda: sync(fwd(state.params, state.batch_stats, batch["t_img"])[0, 0, 0, 0]),
            state.params, state.batch_stats, batch["t_img"])

    # 6) consistency at loss_resolution=os8 (fast mode)
    cfg3, seg3, tx3, state3, _ = build(loss_res="os8")
    step_os8 = jax.jit(S.make_consistency_step(seg3, tx3, strong_aug="CCA"))
    measure(report, "consistency_cca_os8", step_os8,
            lambda: sync(step_os8(state3, batch, key)[1]["target_seg_loss"]),
            state3, batch, key)

    print("PROFILE " + json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in report.items()}))


if __name__ == "__main__":
    main()
