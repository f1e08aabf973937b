"""Decompose bench_pseudo_gen's 640-900 s "compile_load" phase (round 5).

Three consecutive bench runs on a degraded tunnel put 640/901/728 s into
the pseudo stage's first-call phase even on a compile-cache HIT, while the
gen_step executable is only ~5 MB (load should be ~20 s at the measured
3-4 s/MB) and the steady-state compute rate is healthy (61.7 imgs/s).
This probe splits the first call into trace / AOT-compile(-or-cache-hit) /
first-execute(+load) / first-fetch so the cost is attributable.

Run: python scripts/probe_pseudo_startup.py   (one TPU process at a time)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from hiast_tpu.runtime_init import init_runtime

    init_runtime()
    import jax
    import jax.numpy as jnp

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.pseudo import policies as P
    from hiast_tpu.pseudo.packing import pack_labels
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import normalize_image
    from hiast_tpu.ops.resize import bilinear_resize

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 1)
        print(f"{name}: {t[name]} s", flush=True)
        return time.time()

    t0 = time.time()
    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    h, w, batch_size = 768, 1536, 8
    variables = segmentor.init_variables(jax.random.PRNGKey(0))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    t0 = mark("init_variables", t0)

    @jax.jit
    def gen_step(variables, images, state):
        img = normalize_image(images)
        out = segmentor.module.apply(variables, img.astype(jnp.bfloat16), train=False)
        low = out["logits"].astype(jnp.float32)
        full = bilinear_resize(low, images.shape[1], images.shape[2])
        s_maxprob, s_pred = P.confidences(low)
        hist = P.class_prob_histogram(s_maxprob, s_pred, 19, 2048)
        new_thr = P.ias_update(state, hist, 0.5, 0.9, 8.0)
        maxprob, pred = P.confidences(full)
        plbl = P.select_pseudo_labels(maxprob, pred, new_thr)
        counts = P.per_sample_class_counts(plbl, 19)
        sums, totals = P.class_prob_sums(plbl, maxprob, 19)
        new_cmp = P.update_class_mean_probs(state.class_mean_probs, sums, totals, 0.99)
        return pack_labels(plbl), counts, P.IASState(new_thr, new_cmp)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8))
    jax.block_until_ready(images)
    state = P.IASState(jnp.full((19,), 0.9), jnp.zeros((19,)))
    t0 = mark("h2d_inputs", t0)

    lowered = gen_step.lower(variables, images, state)
    t0 = mark("trace_lower", t0)
    compiled = lowered.compile()
    t0 = mark("compile_or_cache_hit", t0)

    plbl, counts, new_state = compiled(variables, images, state)
    # sync on the tiny scalar first: isolates load+execute from the big D2H
    float(np.asarray(new_state.thresholds)[0])
    t0 = mark("first_execute_and_load", t0)
    buf = np.asarray(plbl)
    t0 = mark("first_fetch_packed", t0)
    print(f"packed bytes: {buf.nbytes/1e6:.1f} MB")

    # second call, warm: steady-state dispatch+execute+fetch
    plbl, counts, new_state = gen_step(variables, images, state)
    float(np.asarray(new_state.thresholds)[0])
    t0 = mark("warm_execute", t0)
    np.asarray(plbl)
    t0 = mark("warm_fetch_packed", t0)

    print("PROBE_PSEUDO_STARTUP " + json.dumps(t))


if __name__ == "__main__":
    main()
