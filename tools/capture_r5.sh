#!/bin/bash
# One coherent five-config capture (VERDICT r4 #5): all BENCH_MODEs
# back-to-back in a single session/window, JSONs collected under
# /tmp/capture_r5/. Run AFTER tools/repop_cache.sh so every config loads
# warm; ONE TPU process at a time (the script is sequential on purpose).
set -x
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/capture_r5}
mkdir -p "$OUT"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
run() {
  name=$1; shift
  echo "=== $name start $(stamp) ===" >> "$OUT/progress.log"
  timeout 3600 env "$@" python -u bench.py > "$OUT/$name.log" 2>&1
  rc=$?
  grep -h '^{"metric' "$OUT/$name.log" | tail -1 > "$OUT/$name.json"
  echo "=== $name rc=$rc end $(stamp) ===" >> "$OUT/progress.log"
}
run featurized
run static BENCH_MODE=static
run gauss BENCH_MODE=gauss
run cv BENCH_MODE=cv
run sweep BENCH_MODE=sweep
run sweepfeat BENCH_MODE=sweep BENCH_SWEEP_FEAT=1
echo "CAPTURE DONE $(stamp)" >> "$OUT/progress.log"
