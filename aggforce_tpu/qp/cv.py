r"""Single-pass cross validation for force-map fits.

The reference CV driver refits from scratch for every (grid point, fold)
pair and re-maps the holdout data to score it (reference agg.py:204-231) —
k * n_grid full passes over the trajectory. On TPU the whole procedure
collapses algebraically:

  * the train-fold Gram is ``G_total - G_heldout[fold]`` — so one pass over
    the data (accumulating per-fold heldout Grams) yields every fold's
    training problem;
  * the l2 grid only shifts the Gram diagonal — so every (fold, l2) fit is
    one more tiny batched Cholesky solve on the same Grams;
  * the holdout score itself is a Gram quadratic form: for a linear map with
    per-site reduced coefficients x_i,

        force_smoothness(mapped holdout forces)
            = sum_i x_i^T G_heldout x_i / (3 * T_fold * S)

    (and identically for featurized maps with the featurized Gram), so no
    data is ever re-mapped.

Net cost: one trajectory pass + (n_folds * n_l2) solves of K x K systems —
versus the reference's (n_folds * n_l2) full passes + solver runs.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints
from ..map import LinearMap
from ..ops.eqp import batched_eqp_solve_auglag
from ..trajectory import Trajectory
from .qplinear import make_bond_constraint_matrix


def _fold_segments(
    n_frames: int, n_folds: int, rng: Optional[np.random.Generator]
) -> List[np.ndarray]:
    """Shuffled frame-index folds (same construction as the generic driver)."""
    frames = np.arange(n_frames)
    (rng if rng is not None else np.random.default_rng()).shuffle(frames)
    return np.array_split(frames, n_folds)


@jax.jit
def _masked_design_gram(
    forces: jax.Array,  # (L, N, 3) one fold's (padded) frames
    mask: jax.Array,  # (L,)
    con_mat: jax.Array,  # (N, R)
) -> jax.Array:
    """C-reduced force Gram of the masked frames: (R, R)."""
    f = forces * mask[:, None, None]
    l, n, d = f.shape
    flat = jnp.swapaxes(f, 1, 2).reshape(l * d, n)
    design = jnp.matmul(flat, con_mat, precision="highest")
    return jnp.matmul(design.T, design, precision="highest")


@jax.jit
def _fold_quad_scores(grams: jax.Array, x: jax.Array) -> jax.Array:
    """Per-fold quadratic forms, batched over leading fold (+site) axes.

    grams (k, ..., K, K), x (k, ..., K[, S]) -> (k,). Keeping this one jitted
    call per l2 value (instead of a python float() per fold) means the whole
    CV grid dispatches asynchronously and syncs to the host exactly once.
    """
    gx = jnp.einsum("...ij,...j->...i", grams, x, precision="highest")
    return jnp.sum(x * gx, axis=tuple(range(1, x.ndim)))


def _score_table(l2_values, qf_all: np.ndarray, denoms: np.ndarray):
    """{l2: (mean, sd, k)} from per-(l2, fold) quadratic forms and denoms."""
    out = {}
    for i, l2 in enumerate(l2_values):
        scores = qf_all[i] / denoms
        mean = float(scores.mean())
        sd = float(scores.std(ddof=1)) if scores.size > 1 else None
        out[float(l2)] = (mean, sd, int(scores.size))
    return out


def linear_map_cv(
    coords: np.ndarray,
    forces: np.ndarray,
    coord_map: LinearMap,
    constraints: Constraints,
    l2_values: Sequence[float],
    n_folds: int = 5,
    rng: Optional[np.random.Generator] = None,
) -> Dict[float, Tuple[Optional[float], Optional[float], int]]:
    """K-fold CV of the optimal linear map over an l2 grid, in one pass.

    Returns {l2: (mean holdout score, sample sd, n_folds)} with scores
    identical (to float precision) to refitting per fold and evaluating
    ``force_smoothness`` on the mapped holdout forces.
    """
    del coords  # constraints are supplied explicitly; coords unused
    con_mat = make_bond_constraint_matrix(coord_map.n_fg_sites, constraints)
    folds = _fold_segments(forces.shape[0], n_folds, rng)

    dtype = jnp.float32
    con_dev = jnp.asarray(con_mat, dtype)
    forces_dev = (
        forces if isinstance(forces, jax.Array) else jnp.asarray(forces, dtype)
    )
    # per-fold heldout Grams: one total pass over the trajectory
    pad_len = max(len(f) for f in folds)
    grams = []
    for idx in folds:
        sel = np.concatenate([idx, np.zeros(pad_len - len(idx), dtype=int)])
        mask = np.concatenate(
            [np.ones(len(idx)), np.zeros(pad_len - len(idx))]
        )
        grams.append(
            _masked_design_gram(
                forces_dev[jnp.asarray(sel)],
                jnp.asarray(mask, dtype),
                con_dev,
            )
        )
    grams = jnp.stack(grams)  # (k, R, R)
    g_total = jnp.sum(grams, axis=0)

    a_mat = jnp.asarray(coord_map.standard_matrix, dtype) @ con_dev
    basis = jnp.eye(coord_map.n_cg_sites, dtype=dtype)
    ridge = jnp.matmul(con_dev.T, con_dev, precision="highest")

    a_batch = jnp.broadcast_to(a_mat, (n_folds,) + a_mat.shape)
    b_batch = jnp.broadcast_to(basis, (n_folds,) + basis.shape)
    qf_per_l2 = []
    for l2 in l2_values:
        p_batch = (g_total - grams) + l2 * ridge
        x = batched_eqp_solve_auglag(p_batch, a_batch, b_batch)  # (k, R, S)
        # x^T G x per fold, summed over sites: einsum with x as (k, R*S)
        xs = jnp.swapaxes(x, 1, 2)  # (k, S, R)
        qf_per_l2.append(_fold_quad_scores(grams[:, None], xs))
    # one host sync for the whole grid (every solve above is async)
    qf_all = np.asarray(jnp.stack(qf_per_l2))  # (n_l2, k)
    denoms = np.array(
        [3 * len(idx) * coord_map.n_cg_sites for idx in folds], dtype=np.float64
    )
    return _score_table(l2_values, qf_all, denoms)


def fused_gb_cv(
    coords: np.ndarray,
    forces: np.ndarray,
    coord_map: LinearMap,
    constraints: Constraints,
    kbt: float,
    spec,
    l2_values: Sequence[float],
    n_folds: int = 5,
    n_constraint_frames: int = 20,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
) -> Dict[float, Tuple[Optional[float], Optional[float], int]]:
    """K-fold CV of the canonical featurized map over an l2 grid, one pass.

    Uses the fused per-group Gram machinery: per-fold heldout featurized
    Grams accumulate in a single trajectory pass, train Grams come from
    subtraction, the (fold x site) constrained solves are one batched
    Cholesky per l2 value, and holdout scores are Gram quadratic forms.
    With ``mesh`` (1-D, axis "frames") each fold's Gram pass shards its
    frames over the devices with a psum reduction.
    """
    from .featlinearmap import id_feat
    from .fusedfeat import (
        _basis_centers,
        _constraint_rows,
        _scan_gram,
        _sharded_scan_gram,
    )

    if rng is None:
        rng = np.random.default_rng()
    t = forces.shape[0]
    folds = _fold_segments(t, n_folds, rng)
    s_dim = coord_map.n_cg_sites

    ids = id_feat(coords, coord_map, constraints, return_ids=True)
    n_channels = int(ids.max()) + 1
    onehot = np.zeros((coord_map.n_fg_sites, n_channels), dtype=np.float32)
    onehot[np.arange(coord_map.n_fg_sites), ids] = 1.0
    counts = onehot.sum(axis=0)
    group_mean = (onehot / np.maximum(counts, 1.0)).T.astype(np.float32)
    centers = _basis_centers(spec).astype(np.float32)

    dtype = jnp.float32
    cmap_mat = jnp.asarray(coord_map.standard_matrix, dtype)
    gm = jnp.asarray(group_mean)
    oh = jnp.asarray(onehot)
    ct = jnp.asarray(counts, dtype)
    cen = jnp.asarray(centers)
    kbt_dev = jnp.asarray(kbt, dtype)
    coords_dev = (
        coords if isinstance(coords, jax.Array) else jnp.asarray(coords, dtype)
    )
    forces_dev = (
        forces if isinstance(forces, jax.Array) else jnp.asarray(forces, dtype)
    )

    # per-fold heldout Grams — one total pass, identical program per fold
    chunk = 1024
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    pad_len = max(len(f) for f in folds)
    n_chunks = n_dev * max(1, -(-pad_len // (n_dev * chunk)))
    pad_len = n_chunks * (-(-pad_len // n_chunks))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        frame_sharding = NamedSharding(mesh, P("frames"))
    grams = []
    for idx in folds:
        sel = np.concatenate([idx, np.zeros(pad_len - len(idx), dtype=int)])
        mask = np.concatenate(
            [np.ones(len(idx)), np.zeros(pad_len - len(idx))]
        ).astype(np.float32)
        cc = coords_dev[jnp.asarray(sel)]
        fc = forces_dev[jnp.asarray(sel)]
        mc = jnp.asarray(mask)
        if mesh is None:
            grams.append(
                _scan_gram(
                    cc, fc, mc, cmap_mat, gm, oh, ct, cen, kbt_dev, spec,
                    n_chunks,
                )
            )
        else:
            cc = jax.device_put(cc, frame_sharding)
            fc = jax.device_put(fc, frame_sharding)
            mc = jax.device_put(mc, frame_sharding)
            grams.append(
                _sharded_scan_gram(
                    cc, fc, mc, cmap_mat, gm, oh, ct, cen, kbt_dev, spec,
                    n_chunks, mesh,
                )
            )
    grams = jnp.stack(grams)  # (k, S, K, K)
    g_total = jnp.sum(grams, axis=0)

    # per-fold constraint systems from train-set frame samples
    rows_list, b_list = [], []
    eye = np.eye(s_dim, dtype=np.float32)
    for f, idx in enumerate(folds):
        train_idx = np.concatenate(
            [x for j, x in enumerate(folds) if j != f]
        )
        sample = rng.choice(train_idx, size=n_constraint_frames, replace=False)
        cc = coords_dev[jnp.asarray(sample)]
        cg = jnp.einsum("sj,tjd->tsd", cmap_mat, cc, precision="highest")
        rows_list.append(
            _constraint_rows(cc, cg, cmap_mat, gm, oh, ct, cen, spec)
        )
        b = np.broadcast_to(
            eye[:, None, :], (s_dim, n_constraint_frames, s_dim)
        ).reshape(s_dim, -1)
        b_list.append(b)
    rows = jnp.stack(rows_list)  # (k, S, m, K)
    b_all = jnp.asarray(np.stack(b_list), dtype)  # (k, S, m)

    k_exp = grams.shape[-1]
    qf_per_l2 = []
    for l2 in l2_values:
        p = (g_total[None] - grams) + l2 * jnp.eye(k_exp, dtype=dtype)
        flat_p = p.reshape(n_folds * s_dim, k_exp, k_exp)
        flat_a = rows.reshape(n_folds * s_dim, rows.shape[2], k_exp)
        flat_b = b_all.reshape(n_folds * s_dim, -1, 1)
        x = batched_eqp_solve_auglag(flat_p, flat_a, flat_b)[..., 0]
        x = x.reshape(n_folds, s_dim, k_exp)
        qf_per_l2.append(_fold_quad_scores(grams, x))
    # one host sync for the whole grid (every solve above is async)
    qf_all = np.asarray(jnp.stack(qf_per_l2))  # (n_l2, k)
    denoms = np.array(
        [3 * len(idx) * s_dim for idx in folds], dtype=np.float64
    )
    return _score_table(l2_values, qf_all, denoms)
