"""One-off round-4 probe: larger-batch SegFormer fused variants (blocks bs16,
no-remat bs12) to see if batch scaling beats the bs8 sweep winner."""
import json
import subprocess
import sys

VARIANTS = [
    ("blocks_fusedattn_bs16", True, "blocks", 16, True),
    ("no_remat_fusedattn_bs12", False, "full", 12, True),
]
for label, remat, mode, batch, fused in VARIANTS:
    code = (
        "import json, bench; "
        f"r = bench.bench_train_step({batch}, 10, 'SegFormer_B5', {remat!r}, {mode!r}, "
        f"fused_attention={fused!r}); "
        "print('BENCH_RESULT ' + json.dumps(list(r)))"
    )
    try:
        out = subprocess.run([sys.executable, "-u", "-c", code],
                             capture_output=True, text=True, timeout=5400)
        for line in out.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                ips, dt, mfu, hbm = json.loads(line[len("BENCH_RESULT "):])
                print(f"{label}: {ips:.2f} imgs/s  {dt:.4f} s/iter  mfu={mfu}  hbm={hbm} GB", flush=True)
                break
        else:
            print(f"{label}: FAILED\n{out.stdout[-800:]}\n{out.stderr[-800:]}", flush=True)
    except Exception as e:
        print(f"{label}: FAILED ({str(e)[-200:]})", flush=True)
print("SWEEP2_DONE", flush=True)
