"""CPU-normalized torch-vs-JAX step-time ratio (falsifiability check).

The reference publishes NO throughput numbers (SURVEY §6), so bench.py's
vs_baseline divides by a documented estimate (5 imgs/s/GPU for the fp16
PyTorch loop).  This script makes that estimate falsifiable in-environment:
it runs the SAME HIAST consistency step — identical tiny trunk, losses,
Adam, EMA, train-mode BN (the torch twin from tests/test_train_parity.py) —
through torch and through the jit'd JAX step on this host's CPU and reports
the per-step ratio.  Same algorithm, same math: if the JAX step were doing
less work than the reference loop, the ratio would expose it.

    python scripts/benchmark_torch_ratio.py [--iters 6] [--hw 128 192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 192))
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    torch.set_num_threads(max(os.cpu_count() - 0, 1))

    import test_train_parity as TP

    h, w = args.hw
    cfg = TP.parity_cfg()
    twin = TP.randomized_twin()
    init_variables = TP.torch_state_dict_to_flax(twin.state_dict_reference_names())
    rng = np.random.default_rng(7)
    batch = {
        "t_img": rng.integers(0, 255, size=(args.batch, h, w, 3), dtype=np.uint8),
        "t_plbl": np.where(
            rng.random(size=(args.batch, h, w)) < 0.4,
            255,
            rng.integers(0, 19, size=(args.batch, h, w)),
        ).astype(np.uint8),
    }

    # torch side
    harness = TP.TorchHarness(cfg, twin)
    harness.step(batch)  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        harness.step(batch)
    t_torch = (time.perf_counter() - t0) / args.iters

    # jax side (same init, same batch, fp32 like torch)
    import jax.numpy as jnp

    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.selftrain.steps import make_consistency_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=TP.LAYERS)
    params = jax.tree.map(jnp.asarray, init_variables["params"])
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=jax.tree.map(jnp.asarray, init_variables["batch_stats"]),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug=None), donate_argnums=0)
    state, losses = step(state, batch, jax.random.PRNGKey(0))  # compile
    float(np.asarray(losses["target_seg_loss"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = step(state, batch, jax.random.PRNGKey(0))
        float(np.asarray(losses["target_seg_loss"]))
    t_jax = (time.perf_counter() - t0) / args.iters

    print(f"shape: batch {args.batch} x {h}x{w}, tiny (1,1,1,1) trunk, fp32, CPU")
    print(f"torch consistency step: {t_torch*1e3:9.1f} ms/iter")
    print(f"jax   consistency step: {t_jax*1e3:9.1f} ms/iter")
    print(f"ratio torch/jax       : {t_torch/t_jax:9.2f}x")


if __name__ == "__main__":
    main()
