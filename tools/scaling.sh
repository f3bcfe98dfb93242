#!/usr/bin/env bash
# Two-parallelism scaling evidence → BENCH/BASELINE.md
# Each JVM is pinned to its core budget with taskset, so a local[N] run
# cannot borrow idle host cores for GC/JIT — the in-sandbox stand-in for
# separate executors (BASELINE.md protocol).
set -euo pipefail
cd "$(dirname "$0")/.."

# default sized to finish inside a 10-minute window on this VM (the
# committed BENCH/BASELINE.md was produced at 16000000; pass it explicitly
# to reproduce)
PAGES="${1:-8000000}"

run() { # cores cpuset
  taskset -c "$2" sbt -batch "runMain graft.ScalingBench $1 $PAGES" 2>/dev/null \
    | grep -o '{"cores".*}' | tail -1
}

echo "[scaling] machine calibration (pure-CPU multiprocessing)..."
CAL=$(python3 - <<'EOF'
import multiprocessing as mp, time, json
def burn(n):
    s=0
    for i in range(n): s+=i*i
    return s
def bench(procs, work=30_000_000):
    with mp.Pool(procs) as p:
        t0=time.time(); p.map(burn, [work]*procs*4); dt=time.time()-t0
    return procs*4*work/dt
r2,r8,r32=bench(2),bench(8),bench(32)
print(json.dumps({"cal_2_to_8":(r8/8)/(r2/2),"cal_8_to_32":(r32/32)/(r8/8)}))
EOF
)
echo "[scaling] $CAL"

echo "[scaling] pinned local[2] ..."; R2=$(run 2 0-1);   echo "$R2"
echo "[scaling] pinned local[8] ..."; R8=$(run 8 0-7);   echo "$R8"
echo "[scaling] pinned local[32]..."; R32=$(run 32 0-31); echo "$R32"

python3 - "$R2" "$R8" "$R32" "$CAL" "$PAGES" <<'EOF'
import json, sys
r2, r8, r32, cal = (json.loads(a) for a in sys.argv[1:5])
pages = int(sys.argv[5])
pc = lambda r: r["pps"] / r["cores"]
e28 = pc(r8) / pc(r2)
e832 = pc(r32) / pc(r8)
md = f"""# BENCH — north-star metric + two-parallelism scaling evidence

Workload: flagship geocode (Common-Crawl-style pages parquet scan →
geoparse → admin-hierarchy spatial join via cell-cover + exact PIP →
tile → kNN building snap), {pages/1e6:.0f}M pages, seed 42, identical
input at every parallelism level. Protocol: each JVM pinned to its core
budget with `taskset` (a local[N] run must not borrow idle host cores —
the in-sandbox stand-in for N separate executors), min of 5 timed runs
after warmup, generation + cache warming outside the timed region.

| metric | value | config |
|---|---|---|
| pages geocoded+tiled /s @ local[2] (pinned) | {r2['pps']:.0f} | {r2['seconds']:.2f} s |
| pages geocoded+tiled /s @ local[8] (pinned) | {r8['pps']:.0f} | {r8['seconds']:.2f} s |
| pages geocoded+tiled /s @ local[32] (pinned) | {r32['pps']:.0f} | {r32['seconds']:.2f} s |
| scaling efficiency N=2 → 4N=8 (per-core-normalized) | {e28:.3f} | target ≥ 0.8 |
| scaling efficiency N=8 → 4N=32 | {e832:.3f} | see machine ceiling below |

Machine context: this sandbox is a shared-host 32-vCPU VM. A pure-CPU
multiprocessing calibration (no JVM, no Spark) scales at
{cal['cal_2_to_8']:.2f} (2→8) and {cal['cal_8_to_32']:.2f} (8→32) —
the hardware itself cannot deliver 1.0 at full saturation. Relative to
that ceiling the Spark job achieves {e28/cal['cal_2_to_8']:.2f} (2→8)
and {e832/cal['cal_8_to_32']:.2f} (8→32) of the machine's achievable
scaling.

Reference single-thread equivalent: ≈3.1k bigraph nodes/s (Berlin
build, BASELINE.md). Flagship per-core throughput at local[2]:
{pc(r2):.0f} pages geocoded+tiled/s/core.
"""
import pathlib
pathlib.Path("BENCH").mkdir(exist_ok=True)
pathlib.Path("BENCH/BASELINE.md").write_text(md)
print(md)
EOF
