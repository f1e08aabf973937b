"""Benchmark: HIAST self-training step throughput on one TPU chip.

Runs the FULL flagship train step — DeepLab-v2 ResNet-101 (bf16, NHWC),
EMA-teacher forward, on-device CCA strong view, all HIAST losses, Adam
update, EMA update — on synthetic 512x1024 batches, and the IAS
pseudo-label generation pass at 768x1536, and prints ONE JSON line.

vs_baseline: the reference repo publishes NO throughput numbers (SURVEY §6);
the denominator used here is a DOCUMENTED ESTIMATE of the reference PyTorch
loop: DeepLab-v2 R101 fp16(O1) train step at 512x1024 runs ~5 imgs/s per
V100-class GPU (the reference's 2-GPU rig, code/utils/default_config.py:110).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_TRAIN_IMGS_PER_SEC_PER_GPU = 5.0  # documented estimate, see module docstring


def _sync(x) -> float:
    """Force a scalar D2H transfer — the only reliable sync on the tunneled
    TPU platform (block_until_ready returns early there)."""
    return float(np.asarray(x).ravel()[0])


def _chip_peak_flops() -> float | None:
    from hiast_tpu.runtime_init import chip_peak_flops

    return chip_peak_flops()


def _compiled_flops(jitted, *args) -> tuple[float | None, float | None]:
    """(per-execution FLOPs, peak HBM in GB) from the compiled program —
    one lower+compile (a jit-cache hit after the timed run).  HBM =
    temps + arguments + outputs: the quantity the remat modes trade
    against step time.  Either element is None if unavailable."""
    flops = hbm = None
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", float("nan")))
        flops = f if np.isfinite(f) and f > 0 else None
        ma = compiled.memory_analysis()
        total = (
            float(ma.temp_size_in_bytes)
            + float(ma.argument_size_in_bytes)
            + float(ma.output_size_in_bytes)
        )
        hbm = total / 1e9 if total > 0 else None
    except Exception:  # noqa: BLE001 - optional diagnostics
        pass
    return flops, hbm


def bench_train_step(batch_size: int, iters: int = 20, seg_model: str = "DeepLab_V2",
                     remat: bool = False, remat_mode: str = "full",
                     fused_attention: bool = False):
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_consistency_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = seg_model
    cfg.cst_training.is_enabled = True
    cfg.cst_training.cst_loss.weight = 0.5
    cfg.train.batch_size = batch_size
    cfg.train.lr = 3e-6
    cfg.train.total_iter = 8000
    cfg.runtime.remat = remat
    cfg.runtime.remat_mode = remat_mode
    cfg.runtime.fused_attention = fused_attention

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    h, w = 512, 1024
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
    )
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
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug="CCA"), donate_argnums=0)
    key = jax.random.PRNGKey(1)

    state, losses = step(state, batch, key)  # compile
    _sync(losses["target_seg_loss"])
    for _ in range(2):  # warm
        state, losses = step(state, batch, key)
        _sync(losses["target_seg_loss"])

    # fetch the loss every iteration (the training loop does — recorder);
    # un-fetched outputs queue pathologically on the tunneled platform.
    # best-of-3 windows: the shared tunnel has large transient slowdowns.
    best = float("inf")
    for _window in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, losses = step(state, batch, key)
            _sync(losses["target_seg_loss"])
        best = min(best, (time.time() - t0) / iters)

    flops, hbm = _compiled_flops(step, state, batch, key)
    peak = _chip_peak_flops()
    mfu = (flops / best / peak) if (flops and peak) else None
    return batch_size / best, best, mfu, hbm


def bench_pseudo_gen(batch_size: int = 8, iters: int = 10):
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.pseudo import policies as P
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import normalize_image

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    h, w = 768, 1536
    variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    from hiast_tpu.ops.resize import bilinear_resize

    @jax.jit
    def gen_step(variables, images, state):
        img = normalize_image(images)
        out = segmentor.module.apply(variables, img.astype(jnp.bfloat16), train=False)
        low = out["logits"].astype(jnp.float32)
        full = bilinear_resize(low, images.shape[1], images.shape[2])
        # thresholds from the OS8 stats grid; selection at full res
        s_maxprob, s_pred = P.confidences(low)
        hist = P.class_prob_histogram(s_maxprob, s_pred, 19, 2048)
        new_thr = P.ias_update(state, hist, 0.5, 0.9, 8.0)
        maxprob, pred = P.confidences(full)
        plbl = P.select_pseudo_labels(maxprob, pred, new_thr)
        counts = P.per_sample_class_counts(plbl, 19)
        sums, totals = P.class_prob_sums(plbl, maxprob, 19)
        new_cmp = P.update_class_mean_probs(state.class_mean_probs, sums, totals, 0.99)
        return plbl.astype(jnp.uint8), counts, P.IASState(new_thr, new_cmp)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8))
    state = P.IASState(jnp.full((19,), 0.9), jnp.zeros((19,)))

    plbl, counts, state = gen_step(variables, images, state)
    np.asarray(plbl)
    # production fetches the label maps every batch (PNG writing), pipelined
    # one batch deep exactly as pseudo/generator.py:_run_select_loop does:
    # dispatch batch k+1, then fetch batch k — the D2H of the label maps
    # (the measured bottleneck on the tunneled platform) overlaps compute.
    # best-of-5 windows against transient tunnel slowdowns (the label-map
    # D2H dominates here and the tunnel's bandwidth swings 15-50 MB/s).
    best = float("inf")
    for _window in range(5):
        t0 = time.time()
        prev = None
        for _ in range(iters):
            plbl, counts, state = gen_step(variables, images, state)
            if prev is not None:
                np.asarray(prev[0])
                np.asarray(prev[1])
            prev = (plbl, counts)
        np.asarray(prev[0])
        np.asarray(prev[1])
        best = min(best, (time.time() - t0) / iters)

    flops, _hbm = _compiled_flops(gen_step, variables, images, state)
    peak = _chip_peak_flops()
    mfu = (flops / best / peak) if (flops and peak) else None
    return batch_size / best, best, mfu


def bench_eval(batch_size: int = 8, iters: int = 20):
    """Validation/serving forward at the reference eval size (768x1536,
    single scale, no flip — configs/validate.yaml): throughput at
    ``batch_size`` plus batch-1 latency (the serving-relevant number)."""
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_eval_forward

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    h, w = 768, 1536
    v = segmentor.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    fwd = jax.jit(make_eval_forward(segmentor))
    rng = np.random.default_rng(0)

    def run(bs, n):
        imgs = jnp.asarray(rng.integers(0, 255, size=(bs, h, w, 3), dtype=np.uint8))
        out = fwd(variables["params"], variables["batch_stats"], imgs)
        _sync(out[0, 0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                out = fwd(variables["params"], variables["batch_stats"], imgs)
                _sync(out[0, 0, 0, 0])
            best = min(best, (time.time() - t0) / n)
        return best

    dt_batch = run(batch_size, iters)
    dt_one = run(1, iters)
    return batch_size / dt_batch, dt_batch, dt_one


def _run_in_subprocess(fn_name: str, *args):
    """Each benchmark in its own process: the train step's donated HBM
    buffers and jit cache otherwise degrade the pseudo-gen measurement."""
    import subprocess
    import sys

    code = (
        "import json, bench; "
        f"r = bench.{fn_name}(*{args!r}); "
        "print('BENCH_RESULT ' + json.dumps(list(r)))"
    )
    out = subprocess.run(
        [sys.executable, "-u", "-c", code], capture_output=True, text=True, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(f"{fn_name} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    train_ips = None
    for bs in (8, 4, 2):
        try:
            train_ips, train_dt, train_mfu, train_hbm = _run_in_subprocess("bench_train_step", bs)
            train_bs = bs
            break
        except Exception as e:  # noqa: BLE001 - fall back on OOM
            last_err = e
    if train_ips is None:
        raise last_err

    pseudo_ips, pseudo_dt, pseudo_mfu = _run_in_subprocess("bench_pseudo_gen")

    eval_ips = eval_dt1 = None
    try:
        eval_ips, _eval_dt, eval_dt1 = _run_in_subprocess("bench_eval")
    except Exception as e:  # noqa: BLE001 - optional metric
        import sys

        print(f"bench_eval failed (metric omitted): {e}", file=sys.stderr)

    # stretch backbone (BASELINE.json): SegFormer MiT-B5 consistency step
    # with remat, same shapes — proves the transformer flagship is
    # train-ready at production size, not just unit-tested
    sf_ips = sf_dt = sf_mfu = sf_hbm = None
    for bs in (8, 4, 2):
        try:
            sf_ips, sf_dt, sf_mfu, sf_hbm = _run_in_subprocess(
                "bench_train_step", bs, 10, "SegFormer_B5", True
            )
            sf_bs = bs
            break
        except Exception as e:  # noqa: BLE001 - OOM fallback / optional metric
            import sys

            print(f"bench_train_step SegFormer_B5 bs={bs} failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "self-train imgs/sec/chip (HIAST consistency step, R101 512x1024 bf16)",
                "value": round(train_ips, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(train_ips / REFERENCE_TRAIN_IMGS_PER_SEC_PER_GPU, 2),
                "details": {
                    "train_batch": train_bs,
                    "train_s_per_iter": round(train_dt, 4),
                    "train_mfu": round(train_mfu, 4) if train_mfu else None,
                    "train_peak_hbm_gb": round(train_hbm, 2) if train_hbm else None,
                    "pseudo_gen_imgs_per_sec": round(pseudo_ips, 2),
                    "pseudo_gen_s_per_iter": round(pseudo_dt, 4),
                    "pseudo_gen_mfu": round(pseudo_mfu, 4) if pseudo_mfu else None,
                    "eval_imgs_per_sec_768x1536": round(eval_ips, 2) if eval_ips else None,
                    "eval_batch1_latency_s": round(eval_dt1, 4) if eval_dt1 else None,
                    "segformer_b5_imgs_per_sec": round(sf_ips, 2) if sf_ips else None,
                    "segformer_b5_batch": sf_bs if sf_ips else None,
                    "segformer_b5_mfu": round(sf_mfu, 4) if (sf_ips and sf_mfu) else None,
                    "segformer_b5_peak_hbm_gb": round(sf_hbm, 2) if (sf_ips and sf_hbm) else None,
                    "mfu_note": "XLA cost-analysis FLOPs / wall time / chip bf16 peak; pseudo-gen includes tunnel D2H of label maps in wall time",
                    "baseline_note": "vs documented estimate of 5 imgs/s/GPU for the reference fp16 PyTorch loop",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
