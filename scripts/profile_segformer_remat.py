"""SegFormer MiT-B5 remat-mode ablation on the real chip.

Measures the full HIAST consistency step (bf16, 512x1024) under each
``runtime.remat_mode`` — and with remat off where it fits — to pick the
bench/default mode.  Each variant runs in its own subprocess (isolates OOM
and donated-buffer HBM state; same protocol as bench.py).

Run from the repo root:  python scripts/profile_segformer_remat.py
"""
from __future__ import annotations

import json
import subprocess
import sys

VARIANTS = [
    # (label, remat on, mode, batch, fused_attention)
    ("no_remat_bs8", False, "full", 8, False),
    ("full_bs8", True, "full", 8, False),
    ("dots_bs8", True, "dots", 8, False),
    ("blocks_bs8", True, "blocks", 8, False),
    ("blocks_dots_bs8", True, "blocks_dots", 8, False),
    ("blocks_fusedattn_bs8", True, "blocks", 8, True),
    ("blocks_dots_fusedattn_bs8", True, "blocks_dots", 8, True),
    ("no_remat_fusedattn_bs8", False, "full", 8, True),
]


def run_one(remat: bool, mode: str, batch: int, fused: bool = False):
    code = (
        "import json, bench; "
        f"r = bench.bench_train_step({batch}, 10, 'SegFormer_B5', {remat!r}, {mode!r}, "
        f"fused_attention={fused!r}); "
        "print('BENCH_RESULT ' + json.dumps(list(r)))"
    )
    # fused variants compile up to 8 Mosaic kernels (4 stage shapes, fwd+bwd)
    # at 100-350 s each through the tunnel on a cold cache — give the first
    # run room; warm-cache reruns take minutes.
    out = subprocess.run(
        [sys.executable, "-u", "-c", code], capture_output=True, text=True, timeout=5400
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(f"failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main():
    results = {}
    for label, remat, mode, batch, fused in VARIANTS:
        try:
            ips, dt, mfu, hbm, _phases = run_one(remat, mode, batch, fused)
            results[label] = {
                "imgs_per_sec": round(ips, 2),
                "s_per_iter": round(dt, 4),
                "mfu": round(mfu, 4) if mfu else None,
                "peak_hbm_gb": round(hbm, 2) if hbm else None,
            }
            print(f"{label}: {ips:.2f} imgs/s  {dt:.4f} s/iter  mfu={mfu}  hbm={hbm} GB")
        except Exception as e:  # noqa: BLE001 - OOM etc; record and continue
            results[label] = {"error": str(e)[-300:]}
            print(f"{label}: FAILED ({str(e)[-200:]})")
    print("REMAT_ABLATION " + json.dumps(results))


if __name__ == "__main__":
    main()
