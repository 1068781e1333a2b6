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

# --- multi-window pipelined timing: the one-window software pipeline
# overlaps window w's fetch+packaging with window w+1's device compute,
# so many-seed (bootstrap) runs should approach program-only ms/fit ---
N_WINDOWS = int(os.environ.get("PROBE_N_WINDOWS", "4"))
for w in windows:
    common = dict(
        kbt=kbt, spec=spec, constraints=constraints,
        l2_regularization=1e3, chunk_size=2048, flush_every=w,
    )
    n = N_WINDOWS * w
    fused_gb_linear_map_batch(traj, cmap, seeds=range(900, 900 + w), **common)
    times = []
    for rep in range(2):
        t0 = time.perf_counter()
        fused_gb_linear_map_batch(
            traj, cmap, seeds=range(rep * n, (rep + 1) * n), **common
        )
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        f"pipelined {N_WINDOWS}x window {w:3d}: {t:7.3f}s  "
        f"({t / n * 1e3:6.2f} ms/fit, {n * frames / t:9.0f} frames/s)  "
        f"runs={['%.3f' % x for x in times]}"
    )

# --- device-program-only timing (isolates wrapper/host-side per-fit cost) ---
import jax
import jax.numpy as jnp

from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    _fit_coefs_batch_e2e,
    _prepare_fused_setup,
    group_factorization,
)
from aggforce_tpu.trajectory import Trajectory  # noqa: E402

spec2 = spec
setup = _prepare_fused_setup(traj, cmap, spec2, constraints, 2048, None, "auto")
dtype = jnp.float32
common = (
    jnp.asarray(cmap.standard_matrix, dtype=dtype),
    jnp.asarray(setup["group_mean"], dtype=dtype),
    jnp.asarray(setup["onehot"], dtype=dtype),
    jnp.asarray(setup["counts"], dtype=dtype),
    jnp.asarray(setup["centers"], dtype=dtype),
    jnp.asarray(kbt, dtype=dtype),
    jnp.asarray(1e3, dtype=dtype),
)
rng = np.random.default_rng(0)
for w in windows:
    fidx = jnp.asarray(
        np.stack([rng.choice(frames, 20, replace=False) for _ in range(w)])
    )
    kw = dict(
        spec=spec2, n_chunks=setup["n_chunks"],
        t_pad=-(-setup["t_pad"] // setup["t_blk"]) * setup["t_blk"]
        if setup["use_pallas"] else setup["t_pad"],
        solver_delta=jnp.asarray(1e-6, dtype=dtype), solver_iters=40,
        use_pallas=setup["use_pallas"], t_block=setup["t_blk"],
    )
    # out = (per-fit coef slices, resid_b, finite_b, gram); force resid_b
    # (depends on every fit's solve) so the timing covers real execution
    out = _fit_coefs_batch_e2e(traj.coords, traj.forces, fidx, *common, **kw)
    jax.block_until_ready(out)
    float(jnp.sum(out[1]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = _fit_coefs_batch_e2e(traj.coords, traj.forces, fidx, *common, **kw)
        float(jnp.sum(out[1]))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        f"program-only window {w:3d}: {t:7.3f}s  ({t / w * 1e3:6.2f} ms/fit)"
        f"  runs={['%.3f' % x for x in times]}"
    )
