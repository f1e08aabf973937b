"""Profile the IAS pseudo-gen pass on the real TPU: split model-forward /
selection-compute / D2H-transfer time, and probe XLA cost_analysis for MFU.

Run: python scripts/profile_pseudo.py  (one TPU process at a time)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, iters=8, windows=3):
    fn()  # warm
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            fn()
        best = min(best, (time.time() - t0) / iters)
    return best


def main(batch_size=4, h=768, w=1536):
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
    def fwd_only(variables, images):
        img = normalize_image(images)
        out = segmentor.module.apply(variables, img.astype(jnp.bfloat16), train=False)
        return out["logits"].astype(jnp.float32)

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

    report = {"batch": batch_size, "hw": [h, w]}

    # (a) model forward only, scalar fetch
    logits = fwd_only(variables, images)
    report["fwd_only_s"] = timeit(lambda: sync(fwd_only(variables, images)[0, 0, 0, 0]))

    # (b) full gen step, scalar fetch only (no big D2H)
    def compute_only():
        plbl, counts, st = gen_step(variables, images, state)
        sync(counts)

    report["gen_compute_s"] = timeit(compute_only)

    # (c) full gen step + plbl D2H (what production PNG writing needs)
    def with_d2h():
        plbl, counts, st = gen_step(variables, images, state)
        np.asarray(plbl)
        np.asarray(counts)

    report["gen_with_d2h_s"] = timeit(with_d2h)

    # (d) raw D2H bandwidth of one plbl-sized buffer
    plbl, counts, _ = gen_step(variables, images, state)
    nbytes = batch_size * h * w
    t = timeit(lambda: np.asarray(plbl))
    report["d2h_plbl_s"] = t
    report["d2h_MBps"] = nbytes / t / 1e6

    # (e) XLA cost analysis (for MFU)
    try:
        ca = gen_step.lower(variables, images, state).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        report["gen_flops"] = float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        report["gen_flops_error"] = repr(e)[:200]

    print("PROFILE " + json.dumps(report))


if __name__ == "__main__":
    import sys

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(batch_size=bs)
