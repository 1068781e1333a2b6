"""Batch-fit window-size scaling probe (real TPU).

Times fused_gb_linear_map_batch at several flush windows on the bench
fixture; per-fit wall clock decomposes as
(window-fixed: Gram pass + site factorization + dispatch/fetch transport)
/ B + per-fit (assembly + Schur solve). Larger windows amortize the fixed
part — this probe measures where it saturates and what HBM allows.

Usage: python tools/probe_batch_window.py [frames] [windows...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses fixture + cache enablement)

bench._enable_compile_cache()

import numpy as np  # noqa: E402

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
windows = [int(w) for w in sys.argv[2:]] or [16, 32, 64]

from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    fused_gb_linear_map_batch,
)

spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)
fix, cmap = bench.build_fixture(frames)
constraints = set(fix["constraint_groups"])
kbt = float(fix["kbt"])
traj = bench._staged_device_traj(fix)

for w in windows:
    common = dict(
        kbt=kbt, spec=spec, constraints=constraints,
        l2_regularization=1e3, chunk_size=2048, flush_every=w,
    )
    # warm (compile/cache-load) pass
    fused_gb_linear_map_batch(traj, cmap, seeds=range(900, 900 + w), **common)
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        fused_gb_linear_map_batch(
            traj, cmap, seeds=range(rep * w, (rep + 1) * w), **common
        )
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        f"window {w:3d}: {t:7.3f}s  ({t / w * 1e3:6.2f} ms/fit, "
        f"{w * frames / t:9.0f} frames/s)  runs="
        f"{['%.3f' % x for x in times]}"
    )
