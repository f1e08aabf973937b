"""IAS selection-machinery microbenchmark: XLA path vs Pallas kernels.

Isolates `_ias_step` (histogram -> threshold update -> selection -> stats)
on device-resident random logits at the production generation shape
(batch 8, 768x1536, OS8 stats grid), dispatching N steps back-to-back and
fetching one scalar at the end (the tunnel's ~25 ms scalar fetch would
otherwise dominate a per-step sync).

Run on the real chip:  python scripts/profile_pallas_select.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 8, 768, 1536, 19
LH, LW = H // 8, W // 8
N_STEPS = 10


def bench(stats_source: str, use_pallas: bool, tmp="/tmp/pallas_prof") -> float:
    import jax
    import jax.numpy as jnp

    from hiast_tpu.config import default_config
    from hiast_tpu.pseudo import policies as P
    from hiast_tpu.pseudo.generator import IASGenerator

    cfg = default_config()
    cfg.pseudo_policy.type = "IAS"
    cfg.pseudo_policy.save_dir = os.path.join(tmp, f"{stats_source}_{use_pallas}", "g")
    cfg.pseudo_policy.stats_source = stats_source
    cfg.pseudo_policy.use_pallas_select = use_pallas
    gen = IASGenerator(cfg, lambda x: x, lambda: iter(()))

    key = jax.random.PRNGKey(0)
    logits_full = jax.random.normal(key, (B, H, W, C), jnp.float32) * 4
    logits_stats = (
        logits_full[:, ::8, ::8] if stats_source == "low" else logits_full
    )
    valid = jnp.ones((B,), jnp.float32)
    state = P.IASState(jnp.full((C,), 0.9), jnp.zeros((C,)))

    # warm + compile
    plbl, counts, state = gen._ias_step(logits_full, logits_stats, state, valid)
    float(np.asarray(state.thresholds[0]))

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(N_STEPS):
            plbl, counts, state = gen._ias_step(
                logits_full, logits_stats, state, valid
            )
        float(np.asarray(state.thresholds[0]))  # one scalar sync
        best = min(best, (time.time() - t0) / N_STEPS)
    return best


def bench_hist(stats_source: str, impl: str) -> float:
    """Isolate JUST the class-prob histogram at the stats shape.

    impl: 'scatter' | 'matmul' (policies.class_prob_histogram methods, input
    = precomputed maxprob/pred) | 'pallas' (fused_hist hist-only: logits in,
    so it additionally folds the confidences pass).
    """
    import jax
    import jax.numpy as jnp

    from hiast_tpu.pseudo import policies as P

    key = jax.random.PRNGKey(0)
    shape = (B, H, W, C) if stats_source == "full" else (B, LH, LW, C)
    logits = jax.random.normal(key, shape, jnp.float32) * 4

    if impl == "pallas":
        from hiast_tpu.ops.pallas.select_kernel import fused_hist

        fn = jax.jit(
            lambda lg: fused_hist(lg, num_bins=2048, with_pixels=False)[2]
        )
        args = (logits,)
    else:
        maxprob, pred = jax.jit(P.confidences)(logits)
        maxprob.block_until_ready()
        fn = jax.jit(
            lambda mp, pr: P.class_prob_histogram(mp, pr, C, 2048, method=impl)
        )
        args = (maxprob, pred)

    h = fn(*args)
    float(np.asarray(h[0, 0]))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(N_STEPS):
            h = fn(*args)
        float(np.asarray(h[0, 0]))
        best = min(best, (time.time() - t0) / N_STEPS)
    return best


def main():
    for stats_source in ("low", "full"):
        for impl in ("scatter", "matmul", "pallas"):
            dt = bench_hist(stats_source, impl)
            print(
                f"hist-only stats={stats_source:4s} impl={impl:7s}: "
                f"{dt*1e3:8.2f} ms", flush=True,
            )
    for stats_source in ("low", "full"):
        for use_pallas in (False, True):
            dt = bench(stats_source, use_pallas)
            print(
                f"stats={stats_source:4s} pallas={use_pallas!s:5s}: "
                f"{dt*1e3:8.2f} ms/step  ({B/dt:.1f} imgs/s selection-only)",
                flush=True,
            )


if __name__ == "__main__":
    main()
