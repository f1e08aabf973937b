"""Fused Pallas SRA attention vs the XLA einsum path on the real chip.

Two parts:
  1. parity — fwd + grad max-abs-diff at a training shape (bf16), so the
     interpret-mode CPU tests are backed by a compiled-Mosaic check;
  2. microbench — per-call time for each SegFormer stage shape at 512x1024
     batch 8, einsum vs fused, fwd-only and fwd+bwd.

Timing protocol (CLAUDE.md): the op is chained N-deep inside ONE jitted
program (out feeds back as q — softmax keeps magnitudes bounded, so the
chain is numerically stable) and synced with a single scalar fetch;
best-of-3 windows.

Run from the repo root:  python scripts/profile_attention.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(smoke: bool = False):
    import jax

    if smoke:  # mechanics check off-TPU: the env force-appends the axon
        # platform, so override AFTER import like tests/conftest.py does
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.ops.pallas.attention import (
        sra_attention,
        sra_attention_reference as einsum_attention,  # the production XLA path
    )

    def sync(x):
        return float(np.asarray(jnp.sum(x).astype(jnp.float32)))

    rng = np.random.default_rng(0)

    # ---- parity on compiled Mosaic (stage-2-like shape, bf16) ----
    def mk(b, n, h, d):
        return jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.bfloat16)

    pn = 512 if smoke else 8192
    q, k, v = mk(2, pn, 2, 64), mk(2, 512, 2, 64), mk(2, 512, 2, 64)
    w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    def loss(attn_fn, q, k, v):
        return jnp.sum(attn_fn(q, k, v).astype(jnp.float32) * w)

    f_fused = jax.jit(lambda q, k, v: sra_attention(q, k, v))
    f_ein = jax.jit(einsum_attention)
    out_f, out_e = np.asarray(f_fused(q, k, v), np.float32), np.asarray(f_ein(q, k, v), np.float32)
    fwd_diff = float(np.abs(out_f - out_e).max())
    g_f = jax.jit(jax.grad(lambda *a: loss(sra_attention, *a), argnums=(0, 1, 2)))(q, k, v)
    g_e = jax.jit(jax.grad(lambda *a: loss(einsum_attention, *a), argnums=(0, 1, 2)))(q, k, v)
    grad_diff = {
        name: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for name, a, b in zip("qkv", g_f, g_e)
    }
    print(f"parity bf16: fwd max|diff|={fwd_diff:.4f} grad max|diff|={grad_diff}")

    # ---- microbench: SegFormer stage shapes at 512x1024, batch 8 ----
    STAGES = [  # (label, n_q, n_kv, heads, head_dim)
        ("stage1", 128 * 256, 512, 1, 64),
        ("stage2", 64 * 128, 512, 2, 64),
        ("stage3", 32 * 64, 512, 5, 64),
        ("stage4", 16 * 32, 512, 8, 64),
    ]
    if smoke:  # CPU mechanics check only (interpret-mode pallas is slow)
        STAGES = [("stage4", 16 * 32, 512, 1, 64)]
    CHAIN = 2 if smoke else 10
    WINDOWS = 1 if smoke else 3
    results = {}

    def bench(fn_one, q, k, v, tag):
        def chained(q, k, v):
            def body(_, x):
                return fn_one(x, k, v)

            return jax.lax.fori_loop(0, CHAIN, body, q)

        f = jax.jit(chained)
        sync(f(q, k, v))  # compile
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.time()
            sync(f(q, k, v))
            best = min(best, (time.time() - t0) / CHAIN)
        return best

    for label, n_q, n_kv, h, d in STAGES:
        q, k, v = mk(8, n_q, h, d), mk(8, n_kv, h, d), mk(8, n_kv, h, d)
        for tag, one in (("einsum", einsum_attention), ("fused", lambda q, k, v: sra_attention(q, k, v))):
            # fwd-only
            t_f = bench(one, q, k, v, tag)

            # fwd+bwd: chain grad-of-sum steps (dq feeds back as q; grads of a
            # softmax mix are bounded like the values are).  Differentiate
            # w.r.t. ALL of (q, k, v): grad-of-q-only would let XLA skip the
            # einsum path's dK/dV matmuls (~half its backward) while the
            # fused custom-VJP pallas_call always computes all three — a
            # biased comparison.  dk/dv are folded in at 1e-30 (not 0.0,
            # which XLA would constant-fold and then DCE the producers).
            def one_step(x, k, v, one=one):
                dq, dk, dv = jax.grad(
                    lambda xx, kk, vv: jnp.sum(one(xx, kk, vv).astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2),
                )(x, k, v)
                return dq + 1e-30 * (jnp.sum(dk) + jnp.sum(dv)).astype(dq.dtype)

            t_fb = bench(one_step, q, k, v, tag)
            results[f"{label}/{tag}"] = {"fwd_ms": round(t_f * 1e3, 3), "fwdbwd_ms": round(t_fb * 1e3, 3)}
            print(f"{label}/{tag}: fwd {t_f * 1e3:.3f} ms  fwd+bwd {t_fb * 1e3:.3f} ms")

    print("ATTENTION_BENCH " + json.dumps({"fwd_parity_maxdiff": fwd_diff, "grad_parity_maxdiff": grad_diff, "stages": results}))


if __name__ == "__main__":
    import sys

    main(smoke="--smoke" in sys.argv)
