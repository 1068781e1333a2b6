"""Profile the fused featurized fit: phase breakdown on the live device.

Usage: python tools/profile_fused.py [frames]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from aggforce_tpu import LinearMap  # noqa: E402
from aggforce_tpu.qp.fusedfeat import (  # noqa: E402
    GBFeatSpec,
    _constraint_rows,
    _scan_gram,
    group_factorization,
)
from aggforce_tpu.ops.eqp import batched_eqp_solve_auglag  # noqa: E402
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_protein_fixture  # noqa: E402

PDB = "/root/reference/tests/data/cln025.pdb"
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

fix = synthesize_protein_fixture(PDB, n_frames=frames, seed=2024)
cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
constraints = set(fix["constraint_groups"])
spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)

geom = group_factorization(cmap, spec, constraints)
onehot, group_mean = geom["onehot"], geom["group_mean"]
counts, centers = geom["counts"], geom["centers"]
G = onehot.shape[1]
print(f"N={cmap.n_fg_sites} S={cmap.n_cg_sites} G={G} "
      f"K_exp={spec.n_basis*G + G}")

chunk = 2048
n_chunks = max(1, -(-frames // chunk))
chunk = -(-frames // n_chunks)
t_pad = chunk * n_chunks
pad = t_pad - frames
coords = np.concatenate([fix["coords"], np.zeros((pad, cmap.n_fg_sites, 3), np.float32)])
forces = np.concatenate([fix["forces"], np.zeros((pad, cmap.n_fg_sites, 3), np.float32)])
mask = np.concatenate([np.ones(frames), np.zeros(pad)]).astype(np.float32)


def _fence(out) -> None:
    # block_until_ready can return before remote execution finishes
    # (CLAUDE.md gotchas); force a value DERIVED from the output so the
    # fence holds even if independent executables ever overlap
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.ravel(leaf)[:1]))


def timed(name, fn, n=3):
    out = fn()
    _fence(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _fence(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<28s} {best*1e3:9.2f} ms")
    return out


args_np = dict(
    cmap_mat=jnp.asarray(cmap.standard_matrix, jnp.float32),
    group_mean=jnp.asarray(group_mean),
    onehot=jnp.asarray(onehot),
    counts=jnp.asarray(counts, jnp.float32),
    centers=jnp.asarray(centers),
)

h2d = timed("h2d transfer", lambda: (
    jnp.asarray(coords), jnp.asarray(forces), jnp.asarray(mask)))
cd, fd, md = h2d

gram_fn = jax.jit(
    lambda c, f, m: _scan_gram(
        c, f, m, args_np["cmap_mat"], args_np["group_mean"], args_np["onehot"],
        args_np["counts"], args_np["centers"], jnp.float32(0.6955215), spec,
        n_chunks,
    )
)
gram = timed("gram scan", lambda: gram_fn(cd, fd, md))

rng = np.random.default_rng(7)
cidx = rng.choice(frames, size=20, replace=False)
ccoords = jnp.asarray(fix["coords"][cidx])


def rows_fn():
    cg = jnp.einsum("sj,tjd->tsd", args_np["cmap_mat"], ccoords)
    return _constraint_rows(ccoords, cg, args_np["cmap_mat"],
                            args_np["group_mean"], args_np["onehot"],
                            args_np["counts"], args_np["centers"], spec)


rows = timed("constraint rows", rows_fn)

S = cmap.n_cg_sites
k_exp = gram.shape[-1]
gram_l2 = gram + 1e3 * jnp.eye(k_exp)
b = np.zeros((S, rows.shape[1], 1), np.float32)
tc = 20
for s in range(S):
    b[s, np.arange(tc) * S + s, 0] = 1.0
b = jnp.asarray(b)
solve = timed("batched auglag solve", lambda: batched_eqp_solve_auglag(
    gram_l2, rows, b, iters=40))  # production solver_iters=40
print("coef finite:", bool(jnp.isfinite(solve).all()))
