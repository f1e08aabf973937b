#!/usr/bin/env bash
# One-shot TPU measurement batch for the SegFormer/attention work:
#   1. probe the tunnel (fail fast if it is down),
#   2. remat-mode x fused-attention ablation (profile_segformer_remat.py),
#   3. attention kernel Mosaic parity + per-stage microbench
#      (profile_attention.py),
#   4. full bench.py refresh.
# Sequential on purpose: ONE TPU client at a time (CLAUDE.md). Each stage
# tees into $OUT so a partial run still leaves its numbers behind.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_measurements_$(date +%Y%m%d_%H%M%S)}
mkdir -p "$OUT"
echo "writing to $OUT"

echo "== probe =="
timeout 240 python - <<'EOF' || { echo "TUNNEL DOWN — aborting"; exit 1; }
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((1024, 1024), jnp.bfloat16)
print("probe ok:", float(np.asarray((x @ x).sum())), f"{time.time()-t0:.1f}s")
EOF

echo "== remat/fused ablation (SegFormer B5) =="
timeout 14400 python scripts/profile_segformer_remat.py 2>&1 | tee "$OUT/remat_ablation.log"

echo "== attention microbench =="
timeout 3600 python scripts/profile_attention.py 2>&1 | tee "$OUT/attention_bench.log"

echo "== protocol micro-validates (Oxford 9-class, SYNTHIA 16/13) =="
timeout 1800 python scripts/validate_protocols_tpu.py 2>&1 | tee "$OUT/protocols.log"

echo "== e2e rounds: SegFormer (fused attention + block remat) =="
timeout 3600 python scripts/e2e_rounds_tpu.py --seg_model SegFormer_B0 2>&1 | tee "$OUT/e2e_segformer.log"

echo "== bench.py (self-budgeted: BENCH_BUDGET_S, default 1200 s) =="
timeout 3600 python bench.py 2>&1 | tee "$OUT/bench.log"

echo "DONE — results in $OUT"
