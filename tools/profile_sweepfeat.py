"""Stage decomposition of the site-blocked sweep-scale featurized fit.

Times, at BENCH_SWEEP_FEAT geometry, (a) one site-block's Gram scan alone,
(b) the per-site factorization + explicit inverse at K_exp ~ 9000,
(c) the full block program — attributing the 52 s fit between the
HBM-bound design construction, the MXU Gram, and the blocked-Cholesky
solver whose panels are latency-bound at this n.

Usage: python tools/profile_sweepfeat.py [frames] [atoms] [site_block]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aggforce_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.ops.blocked_chol import cholesky_blocked, spd_inv_from_chol  # noqa: E402
from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    _assemble_constraint_system,
    _scan_gram,
    _prepare_fused_setup,
)
from aggforce_tpu.trajectory import Trajectory  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_trajectory_device  # noqa: E402

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
n_atoms = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
sb = int(sys.argv[3]) if len(sys.argv) > 3 else 4

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
pad = t_pad - frames
coords_p = jnp.pad(coords, ((0, pad), (0, 0), (0, 0)))
forces_p = jnp.pad(forces, ((0, pad), (0, 0), (0, 0)))
mask = (jnp.arange(t_pad) < frames).astype(dtype)
k_exp = spec.n_basis * setup["onehot"].shape[1] + setup["onehot"].shape[1]
print(f"geometry: {frames}x{n_atoms}, K_exp={k_exp}, Sb={sb}, "
      f"n_chunks={setup['n_chunks']}")


def timed(name, fn, nrep=2):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / nrep
    print(f"{name:<44s} {dt:8.3f} s")
    return out


gram_jit = jax.jit(
    lambda c, f, m, cb: _scan_gram(
        c, f, m, cb, *args, kbt, spec, setup["n_chunks"]
    )
)
gram = timed("one block gram scan (Sb sites)", lambda: gram_jit(
    coords_p, forces_p, mask, cmap_blk))

chol_jit = jax.jit(lambda g: jax.vmap(cholesky_blocked)(
    g + 1e3 * jnp.eye(k_exp, dtype=dtype)))
chol = timed("blocked cholesky (Sb, K, K)", lambda: chol_jit(gram))
inv_jit = jax.jit(lambda c: jax.vmap(spd_inv_from_chol)(c))
timed("blocked explicit inverse (Sb, K, K)", lambda: inv_jit(chol))

# --- full site-block program: scan vs Gram-tiled pallas ---------------------
from aggforce_tpu.qp.fusedfeat import _fit_coefs_siteblock_e2e  # noqa: E402

frame_rng = np.random.default_rng(3)
frame_idx = jnp.asarray(frame_rng.choice(frames, size=20, replace=False))
sel = np.zeros((sb, cmap.n_cg_sites), dtype=np.float32)
sel[np.arange(sb), np.arange(sb)] = 1.0
common = (
    jnp.asarray(cmap_np, dtype),
    *args,
    kbt,
    jnp.asarray(1e3, dtype),
)

from aggforce_tpu.ops.pallas_gram import pallas_site_grams_tiled, pack_operands  # noqa: E402

gpos, cgp, fgp, _, _ = pack_operands(
    coords_p, forces_p, mask, cmap_blk, args[0], args[1], args[2], kbt,
    spec.n_basis, args[3],
)
jax.block_until_ready((gpos, cgp, fgp))
g_dim = setup["onehot"].shape[1]
g_pad = gpos.shape[2]
kbt_counts = jnp.pad(kbt * jnp.asarray(setup["counts"], dtype), (0, g_pad - g_dim))
t_blk_pal = 512 if (frames >= 4096 and g_pad <= 1536) else 256
t_pad_pal = -(-t_pad // t_blk_pal) * t_blk_pal
timed("tiled pallas gram (Sb sites)", lambda: pallas_site_grams_tiled(
    gpos, cgp, fgp, mask, args[3], kbt_counts, n_basis=spec.n_basis,
    width=spec.width, clip=spec.clip, t_block=t_blk_pal))

for up, tp in ((False, t_pad), (True, t_pad_pal)):
    name = "full block program " + ("(pallas)" if up else "(scan)")
    timed(name, lambda up=up, tp=tp: _fit_coefs_siteblock_e2e(
        coords, forces, frame_idx, cmap_blk, jnp.asarray(sel), *common,
        spec=spec, n_chunks=setup["n_chunks"], t_pad=tp,
        solver_delta=jnp.asarray(1e-6, dtype), solver_iters=40,
        use_pallas=up, t_block=t_blk_pal))
