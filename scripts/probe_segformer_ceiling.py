"""Is SegFormer-B5's 24.5% train model-MFU irreducible on this chip, or
recoverable?  The B5 analog of probe_matmul_ceiling.py: measure, at the
MiT-B5 512x1024 batch-8 working shapes, what the SAME chip does on each
non-matmul component IN ISOLATION — LayerNorm, GELU, the Mix-FFN depthwise
3x3, the attention einsum pair + softmax — against two empirical ceilings
measured first: the practical bf16 matmul peak and the practical HBM copy
bandwidth.  Then pin the whole-step verdict with a roofline: XLA's own cost
analysis (flops + bytes accessed) of the production B5 train step, divided
by the measured peaks, gives the minimal time the chip could possibly need;
the gap to the measured step time is the recoverable headroom.

Stage-3 shapes dominate (40 of 52 blocks); components are probed there.
Every probe is chained DEEP inside one jit via lax.fori_loop and synced
with one scalar fetch (CLAUDE.md tunnel protocol); each program reduces to
one scalar on device (abs-sum — not factorable through the last op).

Run: python scripts/probe_segformer_ceiling.py   (one TPU process at a time)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = 50
WINDOWS = 3
CALLS = 3

# MiT-B5 at 512x1024, batch 8 (bench.py stretch stage)
B = 8
STAGE3 = dict(h=32, w=64, c=320, heads=5, sr=2, mlp=4)


def sync(x):
    return float(np.asarray(x).ravel()[0])


def bench_loop(jitted, args, name, report, flops=None, bytes_moved=None,
               peak_flops=None, peak_bw=None):
    out = jitted(*args)  # compile
    sync(out)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.time()
        for _ in range(CALLS):
            sync(jitted(*args))
        best = min(best, (time.time() - t0) / CALLS / DEPTH)
    row = {"ms_per_op": round(best * 1e3, 4)}
    line = f"{name:26s} {best*1e3:8.3f} ms/op"
    if flops:
        row["tflops"] = round(flops / best / 1e12, 2)
        line += f"  {flops/best/1e12:6.2f} TF/s"
        if peak_flops:
            row["vs_matmul_peak"] = round(flops / best / peak_flops, 3)
            line += f"  ({100*flops/best/peak_flops:4.1f}% of matmul peak)"
    if bytes_moved:
        row["gbps"] = round(bytes_moved / best / 1e9, 1)
        line += f"  {bytes_moved/best/1e9:7.1f} GB/s"
        if peak_bw:
            row["vs_copy_bw"] = round(bytes_moved / best / peak_bw, 3)
            line += f"  ({100*bytes_moved/best/peak_bw:4.1f}% of copy bw)"
    report[name] = row
    print(line, flush=True)
    return best


def main():
    from hiast_tpu.runtime_init import init_runtime

    init_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    report = {}
    key = jax.random.PRNGKey(0)

    # ---- ceiling 1: practical bf16 matmul peak ------------------------------
    n = 4096
    w_sq = (jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)).astype(jnp.bfloat16)
    x_sq = jax.random.normal(key, (n, n), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_square(x, w):
        def body(_, c):
            return (c @ w).astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)).sum().astype(jnp.float32)

    t = bench_loop(run_square, (x_sq, w_sq), "matmul_4096_peak", report,
                   flops=2.0 * n**3)
    peak_flops = 2.0 * n**3 / t

    # ---- ceiling 2: practical HBM copy bandwidth ----------------------------
    # y = x * a + b over 512 MB: one read + one write per element per iter.
    big = jax.random.normal(key, (256 * 1024 * 1024 // 4 // 2, 2), jnp.float32)

    @jax.jit
    def run_copy(x):
        def body(i, c):
            return c * 1.0000001 + 1e-9
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)[0, :]).sum()

    nbytes = big.size * 4 * 2  # read + write
    t = bench_loop(run_copy, (big,), "hbm_copy_512MB", report, bytes_moved=nbytes)
    peak_bw = nbytes / t

    # ---- stage-3 component probes -------------------------------------------
    h, w, c, heads, sr, mlp = (STAGE3[k] for k in ("h", "w", "c", "heads", "sr", "mlp"))
    ntok = h * w
    hidden = c * mlp

    # LayerNorm [B, ntok, c] bf16 with scale/bias (bandwidth-bound)
    x_ln = jax.random.normal(key, (B, ntok, c), jnp.float32).astype(jnp.bfloat16)
    g_ln = jnp.ones((c,), jnp.bfloat16)
    b_ln = jnp.zeros((c,), jnp.bfloat16)

    @jax.jit
    def run_ln(x, g, b):
        def body(_, cur):
            m = cur.mean(-1, keepdims=True)
            v = ((cur - m) ** 2).mean(-1, keepdims=True)
            return ((cur - m) * lax.rsqrt(v + 1e-6) * g + b).astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)).sum().astype(jnp.float32)

    ln_bytes = x_ln.size * 2 * 2  # in + out, bf16
    bench_loop(run_ln, (x_ln, g_ln, b_ln), "layernorm_s3", report,
               bytes_moved=ln_bytes, peak_bw=peak_bw)

    # GELU at the Mix-FFN hidden width (bandwidth-bound)
    x_gelu = jax.random.normal(key, (B, ntok, hidden), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_gelu(x):
        def body(_, cur):
            return jax.nn.gelu(cur).astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)).sum().astype(jnp.float32)

    bench_loop(run_gelu, (x_gelu,), "gelu_s3_hidden", report,
               bytes_moved=x_gelu.size * 2 * 2, peak_bw=peak_bw)

    # depthwise 3x3 at the hidden width (bandwidth-bound: 9 MACs/element)
    x_dw = jax.random.normal(key, (B, h, w, hidden), jnp.float32).astype(jnp.bfloat16)
    w_dw = (jax.random.normal(key, (3, 3, 1, hidden), jnp.float32) / 3.0).astype(jnp.bfloat16)

    @jax.jit
    def run_dw(x, w_):
        def body(_, cur):
            y = lax.conv_general_dilated(
                cur, w_, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=hidden,
                preferred_element_type=jnp.bfloat16)
            return y.astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)).sum().astype(jnp.float32)

    bench_loop(run_dw, (x_dw, w_dw), "dwconv3x3_s3_hidden", report,
               flops=2.0 * B * h * w * hidden * 9,
               bytes_moved=x_dw.size * 2 * 2, peak_bw=peak_bw)

    # Mix-FFN dense pair (flops-bound): [M,c]@[c,4c] then [M,4c]@[4c,c]
    M = B * ntok
    w_f1 = (jax.random.normal(key, (c, hidden), jnp.float32) / np.sqrt(c)).astype(jnp.bfloat16)
    w_f2 = (jax.random.normal(key, (hidden, c), jnp.float32) / np.sqrt(hidden)).astype(jnp.bfloat16)
    x_fc = jax.random.normal(key, (M, c), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_ffn_pair(x, w1, w2):
        def body(_, cur):
            y = (cur @ w1).astype(jnp.bfloat16)
            return (y @ w2).astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, x)).sum().astype(jnp.float32)

    bench_loop(run_ffn_pair, (x_fc, w_f1, w_f2), "ffn_dense_pair_s3", report,
               flops=2.0 * 2 * M * c * hidden, peak_flops=peak_flops)

    # attention einsum pair + softmax at stage-3 shapes: q [B,ntok,heads,d],
    # k/v [B,nkv,heads,d], scores [B,heads,ntok,nkv]
    d = c // heads
    nkv = (h // sr) * (w // sr)
    q0 = jax.random.normal(key, (B, ntok, heads, d), jnp.float32).astype(jnp.bfloat16)
    k0 = jax.random.normal(key, (B, nkv, heads, d), jnp.float32).astype(jnp.bfloat16)
    v0 = jax.random.normal(key, (B, nkv, heads, d), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_attn(q, k, v):
        def body(_, cur):
            s = jnp.einsum("bqhd,bkhd->bhqk", cur, k) / np.sqrt(d)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
            return o.astype(jnp.bfloat16)
        return jnp.abs(lax.fori_loop(0, DEPTH, body, q)).sum().astype(jnp.float32)

    attn_flops = 2.0 * 2 * B * heads * ntok * nkv * d
    bench_loop(run_attn, (q0, k0, v0), "attention_einsum_s3", report,
               flops=attn_flops, peak_flops=peak_flops)

    # ---- whole-step roofline -------------------------------------------------
    # XLA's own cost analysis of the production B5 train step: flops + bytes
    # accessed vs the two measured peaks -> the minimal feasible step time.
    print("building the production B5 step for cost analysis...", flush=True)
    from hiast_tpu.config import default_config
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain.steps import make_consistency_step
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = "SegFormer_B5"
    cfg.cst_training.is_enabled = True
    cfg.cst_training.cst_loss.weight = 0.5
    cfg.train.batch_size = B
    cfg.runtime.fused_attention = True

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=jax.jit(tx.init)(variables["params"]),
        ema_params=jax.jit(lambda p: jax.tree.map(jnp.copy, p))(variables["params"]),
    )
    rng = np.random.default_rng(0)
    batch = {
        "t_img": jnp.asarray(rng.integers(0, 255, size=(B, 512, 1024, 3), dtype=np.uint8)),
        "t_plbl": jnp.asarray(rng.integers(0, 19, size=(B, 512, 1024)).astype(np.int32)),
    }
    step = jax.jit(make_consistency_step(segmentor, tx, strong_aug="CCA"), donate_argnums=0)
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    acc_bytes = float(ca.get("bytes accessed", float("nan")))
    t_flops = flops / peak_flops
    t_bytes = acc_bytes / peak_bw
    report["step_roofline"] = {
        "model_gflops": round(flops / 1e9, 1),
        "bytes_accessed_gb": round(acc_bytes / 1e9, 2),
        "t_if_matmul_bound_ms": round(t_flops * 1e3, 1),
        "t_if_bandwidth_bound_ms": round(t_bytes * 1e3, 1),
        "roofline_ms": round(max(t_flops, t_bytes) * 1e3, 1),
        "measured_peak_tflops": round(peak_flops / 1e12, 1),
        "measured_copy_gbps": round(peak_bw / 1e9, 1),
    }
    print(
        f"step roofline: {flops/1e12:.2f} TFLOP, {acc_bytes/1e9:.1f} GB accessed -> "
        f"matmul-bound {t_flops*1e3:.0f} ms | bandwidth-bound {t_bytes*1e3:.0f} ms "
        f"(chip: {peak_flops/1e12:.0f} TF/s, {peak_bw/1e9:.0f} GB/s)", flush=True
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
