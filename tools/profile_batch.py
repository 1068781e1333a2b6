"""Stage decomposition of the shared-Gram batch fit on the live device.

Times, with amortized (queue-N, sync-once) dispatches:
  1. the Gram pass alone (Pallas kernel path),
  2. the per-fit constraint assembly alone,
  3. the shared-factor batched solve alone,
  4. the whole one-program batch fit,
so the marginal per-fit cost can be attributed between assembly, solve,
and the amortized Gram/transport share.

Usage: python tools/profile_batch.py [frames] [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.ops.eqp import batched_eqp_solve_shared  # noqa: E402
from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    _assemble_constraint_system,
    _fit_coefs_batch_e2e,
    _pallas_fit_parts,
    group_factorization,
)
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_protein_fixture  # noqa: E402

PDB = "/root/reference/tests/data/cln025.pdb"
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

fix = synthesize_protein_fixture(PDB, n_frames=frames, seed=2024)
cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
constraints = set(fix["constraint_groups"])
kbt = float(fix["kbt"])
spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)
geom = group_factorization(cmap, spec, constraints)
dtype = jnp.float32

t_blk = 1024
t_pad = -(-frames // t_blk) * t_blk
pad = ((0, t_pad - frames), (0, 0), (0, 0))
coords = jnp.pad(jnp.asarray(fix["coords"], dtype), pad)
forces = jnp.pad(jnp.asarray(fix["forces"], dtype), pad)
mask = jnp.asarray(
    np.concatenate([np.ones(frames), np.zeros(t_pad - frames)]), dtype
)
common = (
    jnp.asarray(cmap.standard_matrix, dtype),
    jnp.asarray(geom["group_mean"], dtype),
    jnp.asarray(geom["onehot"], dtype),
    jnp.asarray(geom["counts"], dtype),
    jnp.asarray(geom["centers"], dtype),
    jnp.asarray(kbt, dtype),
    jnp.asarray(1e3, dtype),
)
idx = np.stack(
    [
        np.random.default_rng(s).choice(frames, size=20, replace=False)
        for s in range(batch)
    ]
)
idx_dev = jnp.asarray(idx)
jax.block_until_ready((coords, forces, idx_dev))


def timed(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # warm/compile fence
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<36s} {dt * 1e3:8.2f} ms  ({dt / batch * 1e3:6.2f} ms/fit)")
    return out


cm, gm, oh, ct, cen, kbt_d, l2 = common
gram, a1, b1 = _pallas_fit_parts(
    coords, forces, mask, coords[:1], cm, gm, oh, ct, cen, kbt_d, l2, spec,
    t_block=t_blk,
)
jax.block_until_ready(gram)

timed("gram (pallas parts)", lambda: _pallas_fit_parts(
    coords, forces, mask, coords[:1], cm, gm, oh, ct, cen, kbt_d, l2, spec,
    t_block=t_blk)[0])

assemble = jax.jit(
    lambda idx_b: jax.vmap(
        lambda i: _assemble_constraint_system(
            coords[i], cm, gm, oh, ct, cen, spec, dtype
        )
    )(idx_b)
)
rows_b, b_b = timed("constraint assembly (B fits)", lambda: assemble(idx_dev))

timed("shared solve (B x S problems)", lambda: batched_eqp_solve_shared(
    gram, rows_b, b_b[..., None], iters=40, return_resid=True)[0])

timed("whole batch program", lambda: _fit_coefs_batch_e2e(
    jnp.asarray(fix["coords"], dtype), jnp.asarray(fix["forces"], dtype),
    idx_dev, *common, spec, 5, t_pad, jnp.asarray(1e-6, dtype), 40, True,
    t_block=t_blk)[0])
