"""Per-stage fused/einsum attention mix on MiT-B5 (real chip).

The round-4 per-stage table (PERF.md) showed the fused Pallas SRA kernel
winning 23-41% on stages 1-3 in isolation but WASHING on stage 4 (sr=1,
8 heads, 16x32 token grid at 512x1024) — this measures whether routing
stage 4 back to the einsum path helps the full production step
(runtime.fused_attention as a per-stage list, models/segformer.py).

Settings = the round-4 winner (no remat, batch 8).  Each variant in its
own subprocess (same protocol as profile_segformer_remat.py).

Run from the repo root:  python scripts/profile_segformer_attnmix.py
"""
from __future__ import annotations

import json
import subprocess
import sys

VARIANTS = [
    ("fused_all", True),
    ("fused_123_einsum_4", [True, True, True, False]),
]


def run_one(fused):
    code = (
        "import json, bench; "
        f"r = bench.bench_train_step(8, 10, 'SegFormer_B5', False, 'full', "
        f"fused_attention={fused!r}); "
        "print('BENCH_RESULT ' + json.dumps(list(r)))"
    )
    out = subprocess.run(
        [sys.executable, "-u", "-c", code], capture_output=True, text=True, timeout=5400
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(f"failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main():
    results = {}
    for label, fused in VARIANTS:
        try:
            ips, dt, mfu, hbm, phases = run_one(fused)
            results[label] = {
                "imgs_per_sec": round(ips, 2),
                "s_per_iter": round(dt, 4),
                "mfu": round(mfu, 4) if mfu else None,
                "peak_hbm_gb": round(hbm, 2) if hbm else None,
                "phases_s": phases,
            }
            print(f"{label}: {ips:.2f} imgs/s  {dt:.4f} s/iter  mfu={mfu}  hbm={hbm} GB")
        except Exception as e:  # noqa: BLE001
            results[label] = {"error": str(e)[-300:]}
            print(f"{label}: FAILED ({str(e)[-200:]})")
    print("ATTNMIX_ABLATION " + json.dumps(results))


if __name__ == "__main__":
    main()
