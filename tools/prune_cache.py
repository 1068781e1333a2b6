"""Prune .jax_cache to the entries live bench/tool runs actually load.

Usage:
  1. Run the workloads with tracing on (appends to the keep-list):
       AGGFORCE_TRACE_CACHE=/tmp/cache_keys.txt python bench.py
       AGGFORCE_TRACE_CACHE=/tmp/cache_keys.txt BENCH_MODE=gauss python bench.py
       ...
  2. python tools/prune_cache.py /tmp/cache_keys.txt [--delete]

Without --delete it only reports what would go. Cache filenames are
`<name>-<key>-cache`; the trace records bare keys.
"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(repo, ".jax_cache")

keys = set()
for path in sys.argv[1:]:
    if path == "--delete":
        continue
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if parts:
                keys.add(parts[0])

delete = "--delete" in sys.argv
if delete and len(keys) < 10:
    sys.exit(
        f"refusing --delete with only {len(keys)} traced keys — the trace "
        "looks incomplete (a bench run that aborted before fitting traces "
        "nothing and would prune the whole cache); run the workloads first"
    )
keep, drop = [], []
for fname in sorted(os.listdir(cache_dir)):
    full = os.path.join(cache_dir, fname)
    if any(k in fname for k in keys):
        keep.append(fname)
    else:
        drop.append(fname)

total_drop = sum(os.path.getsize(os.path.join(cache_dir, f)) for f in drop)
print(f"keep {len(keep)} entries; drop {len(drop)} ({total_drop/1e6:.1f} MB)")
for f in drop:
    print("  drop", f)
    if delete:
        os.remove(os.path.join(cache_dir, f))
if not delete:
    print("(dry run; pass --delete to remove)")
