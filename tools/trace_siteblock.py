"""Perfetto device trace of one sweep site-block program, summarized.

Runs `_fit_coefs_siteblock_e2e` warm at the BENCH_SWEEP_FEAT geometry under
`jax.profiler.trace`, then parses the emitted trace and prints the top XLA
ops by accumulated device time — the tool that found the 81M-element
layout gather in round 5 (ARCHITECTURE.md "Sweep-scale featurized fits").

Usage: python tools/trace_siteblock.py [frames] [atoms] [site_block]
Output: top-N table to stdout; raw trace dir under /tmp/siteblock_trace.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aggforce_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    _fit_coefs_siteblock_e2e,
    _prepare_fused_setup,
)
from aggforce_tpu.trajectory import Trajectory  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_trajectory_device  # noqa: E402

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
n_atoms = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
sb = int(sys.argv[3]) if len(sys.argv) > 3 else 6

rng = np.random.default_rng(0)
base = rng.normal(scale=1.5, size=(n_atoms, 3))
groups = [frozenset((i, i + 1)) for i in range(0, n_atoms // 2, 2)]
coords, forces = synthesize_trajectory_device(base, groups, frames, seed=1)
jax.block_until_ready((coords, forces))
cmap = LinearMap(
    [[i] for i in range(0, n_atoms, max(1, n_atoms // 64))],
    n_fg_sites=n_atoms,
)
spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)
traj = Trajectory(coords=coords, forces=forces)
setup = _prepare_fused_setup(traj, cmap, spec, set(groups), 256, None, False)
dtype = jnp.float32
cmap_np = np.asarray(cmap.standard_matrix, dtype=np.float32)
cmap_blk = jnp.asarray(cmap_np[:sb], dtype)
args = (
    jnp.asarray(setup["group_mean"], dtype),
    jnp.asarray(setup["onehot"], dtype),
    jnp.asarray(setup["counts"], dtype),
    jnp.asarray(setup["centers"], dtype),
)
kbt = jnp.asarray(0.7, dtype)
t_pad = setup["t_pad"]
frame_rng = np.random.default_rng(3)
frame_idx = jnp.asarray(frame_rng.choice(frames, size=20, replace=False))
sel = np.zeros((sb, cmap.n_cg_sites), dtype=np.float32)
sel[np.arange(sb), np.arange(sb)] = 1.0
common = (jnp.asarray(cmap_np, dtype), *args, kbt, jnp.asarray(1e3, dtype))
t_blk = 512
t_pad_pal = -(-t_pad // t_blk) * t_blk
k_exp = spec.n_basis * setup["onehot"].shape[1] + setup["onehot"].shape[1]
print(f"geometry: {frames}x{n_atoms}, K_exp={k_exp}, Sb={sb}")


def run_once():
    out = _fit_coefs_siteblock_e2e(
        coords, forces, frame_idx, cmap_blk, jnp.asarray(sel), *common,
        spec=spec, n_chunks=setup["n_chunks"], t_pad=t_pad_pal,
        solver_delta=jnp.asarray(1e-6, dtype), solver_iters=40,
        use_pallas=True, t_block=t_blk,
    )
    jax.block_until_ready(out)
    # force a value: block_until_ready alone can return before remote
    # execution finishes (CLAUDE.md gotcha)
    float(jnp.sum(out[0]))
    return out


t0 = time.perf_counter()
run_once()
print(f"warm-up call: {time.perf_counter() - t0:.3f} s")
t0 = time.perf_counter()
run_once()
print(f"steady call: {time.perf_counter() - t0:.3f} s")

trace_dir = "/tmp/siteblock_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    run_once()

# --- parse: accumulate device-stream event durations by op name ----------
paths = glob.glob(
    os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
)
if not paths:
    print("no trace emitted", file=sys.stderr)
    sys.exit(1)
with gzip.open(sorted(paths)[-1], "rt") as fh:
    trace = json.load(fh)

# device-thread pids: TPU device streams are labeled with "TPU" / "/device:"
proc_name = {}
for ev in trace.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        proc_name[ev["pid"]] = ev["args"].get("name", "")

by_op = defaultdict(float)
total = 0.0
for ev in trace.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    pname = proc_name.get(ev.get("pid"), "")
    if "TPU" not in pname and "device" not in pname.lower():
        continue
    dur = ev.get("dur", 0) / 1e6  # us -> s
    by_op[ev.get("name", "?")] += dur
    total += dur

print(f"\ndevice events total {total:.3f} s across {len(by_op)} op names")
for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{dur:8.4f} s  {100 * dur / max(total, 1e-9):5.1f}%  {name[:100]}")
