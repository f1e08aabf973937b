"""Probe: does a threaded np.asarray fetch stay on the tunnel's fast D2H
path, letting pseudo-gen overlap transfer with the next batch's compute?"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch_size=8, h=768, w=1536, iters=10):
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.ops.resize import bilinear_resize
    from hiast_tpu.pseudo import policies as P
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import normalize_image

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

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
        return plbl.astype(jnp.uint8), counts, P.IASState(new_thr, new_cmp)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8))
    state = P.IASState(jnp.full((19,), 0.9), jnp.zeros((19,)))

    # warm
    plbl, counts, state = gen_step(variables, images, state)
    np.asarray(plbl)

    # sequential baseline
    best_seq = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            plbl, counts, st = gen_step(variables, images, state)
            np.asarray(plbl)
            np.asarray(counts)
        best_seq = min(best_seq, (time.time() - t0) / iters)

    # overlapped: fetch batch k-1 on a worker thread while batch k computes
    pool = ThreadPoolExecutor(max_workers=1)
    best_ovl = float("inf")
    for _ in range(3):
        t0 = time.time()
        pending = None
        for _ in range(iters):
            plbl, counts, st = gen_step(variables, images, state)
            if pending is not None:
                pending.result()
            pending = pool.submit(lambda p=plbl, c=counts: (np.asarray(p), np.asarray(c)))
        pending.result()
        best_ovl = min(best_ovl, (time.time() - t0) / iters)

    # async-dispatch pipeline: dispatch step k+1, THEN fetch step k's outputs
    # (no threads; relies on jax async dispatch + concurrent tunnel transfer)
    best_pipe = float("inf")
    for _ in range(3):
        t0 = time.time()
        prev = None
        for _ in range(iters):
            cur = gen_step(variables, images, state)
            if prev is not None:
                np.asarray(prev[0])
                np.asarray(prev[1])
            prev = cur
        np.asarray(prev[0])
        np.asarray(prev[1])
        best_pipe = min(best_pipe, (time.time() - t0) / iters)

    print(
        f"RESULT batch={batch_size} seq={best_seq:.4f}s ({batch_size/best_seq:.1f} img/s) "
        f"overlap={best_ovl:.4f}s ({batch_size/best_ovl:.1f} img/s) "
        f"pipe={best_pipe:.4f}s ({batch_size/best_pipe:.1f} img/s)"
    )


if __name__ == "__main__":
    main(batch_size=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
