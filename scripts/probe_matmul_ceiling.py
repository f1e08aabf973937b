"""Is the 44% per-conv rate a hardware ceiling or an XLA conv-lowering
ceiling?  Measure, at the OS8 working shapes, what the SAME chip does on:

  1. a big square matmul (the chip's practical bf16 peak through one jit),
  2. a 1x1-conv-shaped matmul   [B*H*W, C] @ [C, C],
  3. an im2col-shaped matmul    [B*H*W, 9C] @ [9C, C] (alternating with its
     transpose partner so the chain stays shape-stable),
  4. XLA's dilated 3x3 conv (reproduces the 44% conv-ceiling number),
  5. the same conv decomposed into 9 shifted [BHW,C]@[C,C] matmuls summed
     (jnp.roll shifts — boundary-wrong but perf-identical; if this wins,
     the production version uses proper zero padding).

Every variant is chained DEEP inside one jit program via lax.fori_loop and
synced with one scalar fetch (CLAUDE.md tunnel protocol: a per-call probe
measures only the ~25 ms roundtrip).  Each program REDUCES its final array
to one scalar on device — fetching the raw [M,C] output would move ~32 MB
through the ~20-50 MB/s tunnel and dominate the timing (first run of this
probe made exactly that mistake: 7.8 "TF/s" for a 4096^2 matmul).  The
reduction is abs-sum, which XLA cannot factor through the last matmul the
way it could a plain slice (slice(C@w) = C[0,:]@w) or sum (sum(C@w) =
C@(w@1)).  FLOPs are computed analytically.

Run: python scripts/probe_matmul_ceiling.py   (one TPU process at a time)
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


def sync(x):
    return float(np.asarray(x).ravel()[0])


def bench_loop(jitted, args, flops_per_iter, name, report):
    from hiast_tpu.runtime_init import chip_peak_flops

    out = jitted(*args)  # compile
    sync(out)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.time()
        for _ in range(CALLS):
            sync(jitted(*args))
        best = min(best, (time.time() - t0) / CALLS / DEPTH)
    peak = chip_peak_flops() or 197e12
    report[name] = {
        "ms_per_op": round(best * 1e3, 4),
        "tflops": round(flops_per_iter / best / 1e12, 1),
        "mfu": round(flops_per_iter / best / peak, 4),
    }
    print(f"{name:24s} {best*1e3:8.3f} ms/op  "
          f"{flops_per_iter/best/1e12:6.1f} TF/s  "
          f"MFU {flops_per_iter/best/peak:.3f}", flush=True)


def main():
    from hiast_tpu.runtime_init import init_runtime

    init_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    report = {}
    key = jax.random.PRNGKey(0)

    # ---- 1. square matmul peak -------------------------------------------
    n = 4096
    w_sq = (jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)).astype(jnp.bfloat16)
    x_sq = jax.random.normal(key, (n, n), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_square(x, w):
        def body(_, c):
            return (c @ w).astype(jnp.bfloat16)
        out = lax.fori_loop(0, DEPTH, body, x)
        return jnp.abs(out).sum().astype(jnp.float32)

    bench_loop(run_square, (x_sq, w_sq), 2.0 * n * n * n, "matmul_4096_sq", report)

    # ---- working shapes: OS8 trunk, batch 8, 64x128 spatial ---------------
    B, H, W, C = 8, 64, 128, 256
    M = B * H * W

    # ---- 2. 1x1-conv-shaped matmul ----------------------------------------
    w_1x1 = (jax.random.normal(key, (C, C), jnp.float32) / np.sqrt(C)).astype(jnp.bfloat16)
    x_m = jax.random.normal(key, (M, C), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_1x1(x, w):
        def body(_, c):
            return (c @ w).astype(jnp.bfloat16)
        out = lax.fori_loop(0, DEPTH, body, x)
        return jnp.abs(out).sum().astype(jnp.float32)

    bench_loop(run_1x1, (x_m, w_1x1), 2.0 * M * C * C, "matmul_1x1_shape", report)

    # ---- 2b. wide-K 1x1 (layer3/4 bottleneck reduce: 1024 -> 256) ----------
    K2 = 1024
    w_a = (jax.random.normal(key, (K2, C), jnp.float32) / np.sqrt(K2)).astype(jnp.bfloat16)
    w_b = (jax.random.normal(key, (C, K2), jnp.float32) / np.sqrt(C)).astype(jnp.bfloat16)
    x_k2 = jax.random.normal(key, (M, K2), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_wide(x, wa, wb):
        def body(_, c):
            y = (c @ wa).astype(jnp.bfloat16)      # [M,1024]@[1024,256]
            return (y @ wb).astype(jnp.bfloat16)   # [M,256]@[256,1024]
        out = lax.fori_loop(0, DEPTH, body, x)
        return jnp.abs(out).sum().astype(jnp.float32)

    bench_loop(run_wide, (x_k2, w_a, w_b), 2.0 * 2 * M * K2 * C,
               "matmul_1024x256_pair", report)

    # ---- 3. im2col-shaped matmul pair --------------------------------------
    K9 = 9 * C
    w_f = (jax.random.normal(key, (K9, C), jnp.float32) / np.sqrt(K9)).astype(jnp.bfloat16)
    w_g = (jax.random.normal(key, (C, K9), jnp.float32) / np.sqrt(C)).astype(jnp.bfloat16)
    x_9 = jax.random.normal(key, (M, K9), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run_im2col(x, wf, wg):
        def body(_, c):
            y = (c @ wf).astype(jnp.bfloat16)
            return (y @ wg).astype(jnp.bfloat16)
        out = lax.fori_loop(0, DEPTH, body, x)
        return jnp.abs(out).sum().astype(jnp.float32)

    bench_loop(run_im2col, (x_9, w_f, w_g), 2.0 * 2 * M * K9 * C,
               "matmul_im2col_pair", report)

    # ---- 4. XLA dilated conv (the 44% reference point) ----------------------
    x_img = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
    w_conv = (jax.random.normal(key, (3, 3, C, C), jnp.float32) / np.sqrt(9 * C)
              ).astype(jnp.bfloat16)
    conv_flops = 2.0 * M * 9 * C * C

    def make_conv(dil):
        @jax.jit
        def run(x, w):
            def body(_, c):
                y = lax.conv_general_dilated(
                    c, w, window_strides=(1, 1), padding="SAME",
                    rhs_dilation=(dil, dil),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                return y.astype(jnp.bfloat16)
            out = lax.fori_loop(0, DEPTH, body, x)
            return jnp.abs(out).sum().astype(jnp.float32)
        return run

    bench_loop(make_conv(2), (x_img, w_conv), conv_flops, "conv3x3_dil2_xla", report)
    bench_loop(make_conv(4), (x_img, w_conv), conv_flops, "conv3x3_dil4_xla", report)

    # ---- 5. shifted-matmul decomposition of the dilated conv ---------------
    def make_shifted(dil):
        @jax.jit
        def run(x, w):
            def body(_, c):
                flat = c.reshape(M, C)
                acc = flat @ w[1, 1]
                for i in (-1, 0, 1):
                    for j in (-1, 0, 1):
                        if i == 0 and j == 0:
                            continue
                        xs = jnp.roll(c, (i * dil, j * dil), axis=(1, 2))
                        acc = acc + xs.reshape(M, C) @ w[i + 1, j + 1]
                return acc.astype(jnp.bfloat16).reshape(B, H, W, C)
            out = lax.fori_loop(0, DEPTH, body, x)
            return jnp.abs(out).sum().astype(jnp.float32)
        return run

    bench_loop(make_shifted(2), (x_img, w_conv), conv_flops, "conv3x3_dil2_shifted", report)
    bench_loop(make_shifted(4), (x_img, w_conv), conv_flops, "conv3x3_dil4_shifted", report)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
