#!/bin/bash
# Repopulate .jax_cache for the current code and trace which entries the
# bench workloads actually load, so stale generations can be pruned:
#
#   bash tools/repop_cache.sh            # ~30-60 min on a healthy tunnel
#   python tools/prune_cache.py /tmp/cache_keys.txt          # dry run
#   python tools/prune_cache.py /tmp/cache_keys.txt --delete
#   git add .jax_cache && git commit
#
# Run whenever a committed change touches a jitted/pallas program (pallas
# cache keys embed call-site tracebacks, so even a line shift in
# qp/fusedfeat.py or ops/pallas_gram.py invalidates those entries).
# Sequential on purpose: ONE TPU process at a time (concurrent runs corrupt
# each other's timings and can wedge the tunnel).
set -x
cd "$(dirname "$0")/.."
TRACE=${AGGFORCE_TRACE_CACHE:-/tmp/cache_keys.txt}
: > "$TRACE"
export AGGFORCE_TRACE_CACHE=$TRACE

run() {
  name=$1; shift
  echo "=== $name start $(date) ===" >> /tmp/repop_progress.log
  timeout 3600 env "$@" python -u bench.py > "/tmp/repop_${name}.log" 2>&1
  echo "=== $name rc=$? end $(date) ===" >> /tmp/repop_progress.log
}

# Headline (featurized) entries FIRST so an interrupted repop still leaves
# the north-star path warm: first run compiles/repopulates, second measures
# warm, third is the fresh-process warm end-to-end check.
run feat1
run feat2
run feat3
run static BENCH_MODE=static
run gauss BENCH_MODE=gauss
run cv BENCH_MODE=cv
run sweep BENCH_MODE=sweep
run sweepstreamed BENCH_MODE=sweep BENCH_SWEEP_STREAMED=1
run sweepfeat BENCH_MODE=sweep BENCH_SWEEP_FEAT=1
echo "ALL DONE $(date)" >> /tmp/repop_progress.log
