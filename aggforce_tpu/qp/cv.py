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

Numerical contract: the batched f32 solves report their max equilibrated
constraint violation; cells exceeding ``resid_tol`` are recomputed with
the float64 oracle from the same device Grams. Note one
irreducible sensitivity (any implementation, including the reference's
refit loop): at severely under-regularized grid points the holdout
quadratic form amplifies Gram rounding by the train system's condition
number — f32 Gram accumulation then carries O(cond * eps) score noise
(~10% observed at cond ~1e6). Such points are exactly the unstable fits CV
exists to reject; their relative ordering against well-conditioned points
is unaffected.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints
from ..map import LinearMap
from ..ops.eqp import batched_eqp_solve_auglag
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
def _linear_solve_scores(
    grams: jax.Array,  # (k, R, R) heldout Grams
    a_mat: jax.Array,  # (S, R)
    basis: jax.Array,  # (S, S)
    ridge: jax.Array,  # (R, R)
    l2_vec: jax.Array,  # (n_l2,)
):
    """Every (l2, fold) linear-map fit + holdout score in ONE device call.

    Returns the (n_l2, k) holdout quadratic forms x^T G_heldout x plus the
    per-cell equilibrated constraint violations (the convergence diagnostic
    — callers escalate individual cells to float64 when they exceed
    tolerance). Batching the whole grid into a single dispatch matters on
    remote-attached devices, where each call carries transport latency.
    """
    k = grams.shape[0]
    n_l2 = l2_vec.shape[0]
    g_total = jnp.sum(grams, axis=0)
    p_all = (g_total - grams)[None] + l2_vec[:, None, None, None] * ridge
    flat_p = p_all.reshape(n_l2 * k, *grams.shape[1:])
    flat_a = jnp.broadcast_to(a_mat, (n_l2 * k,) + a_mat.shape)
    flat_b = jnp.broadcast_to(basis, (n_l2 * k,) + basis.shape)
    x, resids = batched_eqp_solve_auglag(
        flat_p, flat_a, flat_b, iters=40, return_resid=True
    )  # (n_l2*k, R, S)
    x = x.reshape(n_l2, k, *x.shape[1:])
    gx = jnp.einsum("fij,lfjs->lfis", grams, x, precision="highest")
    qf = jnp.sum(x * gx, axis=(2, 3))
    return qf, resids.reshape(n_l2, k)  # both (n_l2, k)


@jax.jit
def _featurized_solve_scores(
    grams: jax.Array,  # (k, S, K, K) heldout featurized Grams
    rows: jax.Array,  # (k, S, m, K) constraint rows
    b_all: jax.Array,  # (k, S, m)
    l2_vec: jax.Array,  # (n_l2,)
):
    """Every (l2, fold, site) featurized fit + holdout score in ONE call.

    Returns the (n_l2, k) score table plus per-cell equilibrated
    constraint violations (convergence diagnostic for f64 escalation)."""
    k, s_dim, k_exp = grams.shape[0], grams.shape[1], grams.shape[-1]
    n_l2 = l2_vec.shape[0]
    g_total = jnp.sum(grams, axis=0)
    eye = jnp.eye(k_exp, dtype=grams.dtype)
    p_all = (g_total - grams)[None] + l2_vec[:, None, None, None, None] * eye
    flat = n_l2 * k * s_dim
    flat_p = p_all.reshape(flat, k_exp, k_exp)
    flat_a = jnp.broadcast_to(rows, (n_l2,) + rows.shape).reshape(
        flat, rows.shape[2], k_exp
    )
    flat_b = jnp.broadcast_to(b_all, (n_l2,) + b_all.shape).reshape(
        flat, -1, 1
    )
    x, resids = batched_eqp_solve_auglag(
        flat_p, flat_a, flat_b, iters=40, return_resid=True
    )
    x = x[..., 0].reshape(n_l2, k, s_dim, k_exp)
    gx = jnp.einsum("fsij,lfsj->lfsi", grams, x, precision="highest")
    qf = jnp.sum(x * gx, axis=(2, 3))
    # per-(l2, fold) convergence: worst site in the cell
    resid_cells = jnp.max(resids.reshape(n_l2, k, s_dim), axis=2)
    return qf, resid_cells  # both (n_l2, k)


def _host_linear_scores(
    grams: np.ndarray,  # (k, R, R) heldout Grams
    a_mat: np.ndarray,  # (S, R)
    basis: np.ndarray,  # (S, S)
    ridge: np.ndarray,  # (R, R)
    l2_values: Sequence[float],
    qf: np.ndarray,  # (n_l2, k) device scores, overwritten where cells fail
    cells: np.ndarray,  # (n_l2, k) bool: True -> recompute this cell
) -> np.ndarray:
    """Float64 oracle for failing (l2, fold) cells (escalation path)."""
    from ..ops.eqp import eqp_solve_host

    g_total = grams.sum(axis=0, dtype=np.float64)
    for i, l2 in enumerate(l2_values):
        for f in range(grams.shape[0]):
            if not cells[i, f]:
                continue
            p = g_total - grams[f] + float(l2) * ridge.astype(np.float64)
            x = eqp_solve_host(p, a_mat, basis)  # (R, S)
            qf[i, f] = np.einsum(
                "rs,rq,qs->", x, grams[f].astype(np.float64), x
            )
    return qf


def _host_featurized_scores(
    grams: np.ndarray,  # (k, S, K, K)
    rows: np.ndarray,  # (k, S, m, K)
    b_all: np.ndarray,  # (k, S, m)
    l2_values: Sequence[float],
    qf: np.ndarray,  # (n_l2, k) device scores, overwritten where cells fail
    cells: np.ndarray,  # (n_l2, k) bool: True -> recompute this cell
) -> np.ndarray:
    """Float64 oracle for failing featurized (l2, fold) cells."""
    from ..ops.eqp import eqp_solve_host

    k, s_dim, k_exp = grams.shape[0], grams.shape[1], grams.shape[-1]
    g_total = grams.sum(axis=0, dtype=np.float64)
    eye = np.eye(k_exp)
    for i, l2 in enumerate(l2_values):
        for f in range(k):
            if not cells[i, f]:
                continue
            total = 0.0
            for s in range(s_dim):
                p = g_total[s] - grams[f, s] + float(l2) * eye
                x = eqp_solve_host(p, rows[f, s], b_all[f, s][:, None])[:, 0]
                total += x @ grams[f, s].astype(np.float64) @ x
            qf[i, f] = total
    return qf


def _l2_blocks(
    n_l2: int, per_system_bytes: int, n_systems_per_l2: int
) -> int:
    """How many l2 values fit per solve dispatch under ~4 GiB of factors.

    ``per_system_bytes`` must account the direct solver's full live set
    (augmented operator + two-level batched Cholesky + Z + Schur factors),
    not just the Gram; 4 GiB leaves headroom beside the trajectory and
    fold Grams on a 16 GB chip.
    """
    budget = 4 << 30
    per_l2 = max(1, per_system_bytes * n_systems_per_l2)
    return max(1, min(n_l2, budget // per_l2))


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
    mesh=None,
    resid_tol: float = 1e-4,
) -> Dict[float, Tuple[Optional[float], Optional[float], int]]:
    """K-fold CV of the optimal linear map over an l2 grid, in one pass.

    Returns {l2: (mean holdout score, sample sd, n_folds)} with scores
    identical (to float precision) to refitting per fold and evaluating
    ``force_smoothness`` on the mapped holdout forces. With ``mesh`` (1-D,
    axis "frames") the per-fold frame axis is sharded and XLA's SPMD
    partitioner distributes the Gram GEMMs (no explicit collectives needed
    for this small kernel).

    Convergence is checked per (l2, fold) cell: cells whose batched f32
    solve reports an equilibrated constraint violation above ``resid_tol``
    are recomputed with the float64 oracle (small systems — the Gram pass,
    the expensive part, is reused).
    """
    del coords  # constraints are supplied explicitly; coords unused
    con_mat = make_bond_constraint_matrix(coord_map.n_fg_sites, constraints)
    folds = _fold_segments(forces.shape[0], n_folds, rng)

    dtype = jnp.float32
    con_dev = jnp.asarray(con_mat, dtype)
    forces_dev = (
        forces if isinstance(forces, jax.Array) else jnp.asarray(forces, dtype)
    )
    # per-fold heldout Grams: one total pass, one vmapped dispatch
    pad_len = max(len(f) for f in folds)
    if mesh is not None:
        # the sharded frame axis must divide evenly over the devices;
        # masked pad frames contribute nothing to the Grams
        n_dev = int(mesh.devices.size)
        pad_len = -(-pad_len // n_dev) * n_dev
    sel_all = np.stack(
        [
            np.concatenate([idx, np.zeros(pad_len - len(idx), dtype=int)])
            for idx in folds
        ]
    )
    mask_all = np.stack(
        [
            np.concatenate([np.ones(len(idx)), np.zeros(pad_len - len(idx))])
            for idx in folds
        ]
    )
    fold_forces = forces_dev[jnp.asarray(sel_all)]
    fold_masks = jnp.asarray(mask_all, dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fold_forces = jax.device_put(
            fold_forces, NamedSharding(mesh, P(None, "frames"))
        )
        fold_masks = jax.device_put(
            fold_masks, NamedSharding(mesh, P(None, "frames"))
        )
    grams = jax.vmap(_masked_design_gram, in_axes=(0, 0, None))(
        fold_forces, fold_masks, con_dev
    )  # (k, R, R)

    a_mat = jnp.asarray(coord_map.standard_matrix, dtype) @ con_dev
    basis = jnp.eye(coord_map.n_cg_sites, dtype=dtype)
    ridge = jnp.matmul(con_dev.T, con_dev, precision="highest")

    # every (l2, fold) fit + score is one dispatch per memory-bounded block
    r = con_mat.shape[1]
    # per-problem live factors: the augmented operator + its two-level
    # batched Cholesky (~3 r^2 floats) plus Z and the small Schur factors
    block = _l2_blocks(len(l2_values), 4 * 4 * r * r, n_folds)
    qf_blocks = []
    resids = []
    for i in range(0, len(l2_values), block):
        l2_vec = jnp.asarray(list(l2_values[i : i + block]), dtype)
        qf, resid = _linear_solve_scores(grams, a_mat, basis, ridge, l2_vec)
        qf_blocks.append(qf)
        resids.append(resid)
    # one host sync for the whole grid (every call above is async)
    qf_all, resid_all = jax.device_get(
        (jnp.concatenate(qf_blocks, axis=0), jnp.concatenate(resids, axis=0))
    )
    qf_all = np.array(qf_all)  # (n_l2, k); copy — device_get views are
    # read-only and the escalation path writes failing cells in place
    resid_all = np.asarray(resid_all)
    bad = ~(resid_all <= resid_tol)  # NaN-aware
    if bad.any():
        # f32 solve did not converge on SOME (l2, fold) cells: redo exactly
        # those with the float64 oracle, reusing the device Grams
        qf_all = _host_linear_scores(
            np.asarray(grams, dtype=np.float64),
            np.asarray(a_mat, dtype=np.float64),
            np.asarray(basis, dtype=np.float64),
            np.asarray(ridge, dtype=np.float64),
            l2_values,
            qf_all,
            bad,
        )
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
    resid_tol: float = 1e-4,
) -> Dict[float, Tuple[Optional[float], Optional[float], int]]:
    """K-fold CV of the canonical featurized map over an l2 grid, one pass.

    Uses the fused per-group Gram machinery: per-fold heldout featurized
    Grams accumulate in a single trajectory pass, train Grams come from
    subtraction, the (fold x site) constrained solves are one batched
    Cholesky per l2 value, and holdout scores are Gram quadratic forms.
    With ``mesh`` (1-D, axis "frames") each fold's Gram pass shards its
    frames over the devices with a psum reduction. Unconverged f32 solves
    (equilibrated constraint violation above ``resid_tol``) escalate
    exactly those (l2, fold) cells to the float64 oracle, reusing the
    device Grams.
    """
    from .fusedfeat import (
        _constraint_rows,
        _scan_gram,
        _sharded_scan_gram,
        group_factorization,
    )

    if rng is None:
        rng = np.random.default_rng()
    t = forces.shape[0]
    folds = _fold_segments(t, n_folds, rng)
    s_dim = coord_map.n_cg_sites

    # group factorization from the shared helper (single source of truth
    # for channel allocation / dtype policy)
    geom = group_factorization(coord_map, spec, constraints)
    onehot, group_mean, counts, centers = (
        geom["onehot"], geom["group_mean"], geom["counts"], geom["centers"],
    )

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
    sel_all = np.stack(
        [
            np.concatenate([idx, np.zeros(pad_len - len(idx), dtype=int)])
            for idx in folds
        ]
    )
    mask_all = np.stack(
        [
            np.concatenate([np.ones(len(idx)), np.zeros(pad_len - len(idx))])
            for idx in folds
        ]
    ).astype(np.float32)
    if mesh is None:
        # all fold Grams in one vmapped dispatch
        def _one_fold(sel_f, mask_f):
            return _scan_gram(
                coords_dev[sel_f], forces_dev[sel_f], mask_f, cmap_mat, gm,
                oh, ct, cen, kbt_dev, spec, n_chunks,
            )

        grams = jax.vmap(_one_fold)(
            jnp.asarray(sel_all), jnp.asarray(mask_all)
        )  # (k, S, K, K)
    else:
        grams = []
        for f in range(n_folds):
            cc = jax.device_put(
                coords_dev[jnp.asarray(sel_all[f])], frame_sharding
            )
            fc = jax.device_put(
                forces_dev[jnp.asarray(sel_all[f])], frame_sharding
            )
            mc = jax.device_put(jnp.asarray(mask_all[f]), frame_sharding)
            grams.append(
                _sharded_scan_gram(
                    cc, fc, mc, cmap_mat, gm, oh, ct, cen, kbt_dev, spec,
                    n_chunks, mesh,
                )
            )
        grams = jnp.stack(grams)  # (k, S, K, K)

    # per-fold constraint systems from train-set frame samples, one dispatch;
    # short trajectories cannot supply more distinct frames than the smallest
    # train set holds, so clamp (matching the fit paths' min(n_cf, t))
    eye = np.eye(s_dim, dtype=np.float32)
    min_train = min(t - len(idx) for idx in folds)
    n_constraint_frames = min(n_constraint_frames, min_train)
    samples = np.stack(
        [
            rng.choice(
                np.concatenate([x for j, x in enumerate(folds) if j != f]),
                size=n_constraint_frames,
                replace=False,
            )
            for f in range(n_folds)
        ]
    )

    def _one_rows(sample_f):
        cc = coords_dev[sample_f]
        cg = jnp.einsum("sj,tjd->tsd", cmap_mat, cc, precision="highest")
        return _constraint_rows(cc, cg, cmap_mat, gm, oh, ct, cen, spec)

    rows = jax.vmap(_one_rows)(jnp.asarray(samples))  # (k, S, m, K)
    b = np.broadcast_to(
        eye[:, None, :], (s_dim, n_constraint_frames, s_dim)
    ).reshape(s_dim, -1)
    b_all = jnp.asarray(
        np.broadcast_to(b, (n_folds,) + b.shape).copy(), dtype
    )  # (k, S, m)

    # every (l2, fold, site) fit + score: one dispatch per memory block.
    # Per-problem live factors in the direct solver: the augmented operator
    # and its two-level batched Cholesky (~3 K^2), Z (K x m), and three
    # m x m Schur factors — m = n_constraint_frames * s_dim can exceed K
    k_exp = grams.shape[-1]
    m_rows = int(rows.shape[2])
    per_problem = 4 * (4 * k_exp * k_exp + k_exp * m_rows + 3 * m_rows * m_rows)
    block = _l2_blocks(len(l2_values), per_problem, n_folds * s_dim)
    qf_blocks = []
    resids = []
    for i in range(0, len(l2_values), block):
        l2_vec = jnp.asarray(list(l2_values[i : i + block]), dtype)
        qf, resid = _featurized_solve_scores(grams, rows, b_all, l2_vec)
        qf_blocks.append(qf)
        resids.append(resid)
    # one host sync for the whole grid (every call above is async)
    qf_all, resid_all = jax.device_get(
        (jnp.concatenate(qf_blocks, axis=0), jnp.concatenate(resids, axis=0))
    )
    qf_all = np.array(qf_all)  # (n_l2, k); copy — device_get views are
    # read-only and the escalation path writes failing cells in place
    resid_all = np.asarray(resid_all)
    bad = ~(resid_all <= resid_tol)  # NaN-aware
    if bad.any():
        # f32 solve unconverged on SOME (l2, fold) cells (ill-conditioned
        # featurized Grams): redo exactly those with the float64 oracle
        qf_all = _host_featurized_scores(
            np.asarray(grams, dtype=np.float64),
            np.asarray(rows, dtype=np.float64),
            np.asarray(b_all, dtype=np.float64),
            l2_values,
            qf_all,
            bad,
        )
    denoms = np.array(
        [3 * len(idx) * s_dim for idx in folds], dtype=np.float64
    )
    return _score_table(l2_values, qf_all, denoms)


def fused_gb_cv_grid(
    coords: np.ndarray,
    forces: np.ndarray,
    coord_map: LinearMap,
    constraints: Constraints,
    kbt: float,
    specs: Sequence,
    l2_values: Sequence[float],
    n_folds: int = 5,
    n_constraint_frames: int = 20,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
) -> Dict[Tuple[int, float], Tuple[Optional[float], Optional[float], int]]:
    """K-fold CV over a (featurizer spec x l2) grid, one Gram pass per spec.

    The reference's canonical CV sweeps featurizer hyperparameters AND l2
    (reference examples/cv_feat.py:178): its driver refits from scratch for
    every (spec, l2, fold) triple. Different specs genuinely need their own
    featurized Grams (the features differ), so the irreducible work is one
    trajectory pass per spec; everything else — the (fold x l2) fits and
    holdout scores per spec — reuses those Grams algebraically exactly as
    :func:`fused_gb_cv` does. Folds and constraint-frame samples are shared
    across specs so scores are comparable.

    Returns {(spec_index, l2): (mean score, sample sd, n_folds)}.
    """
    if rng is None:
        rng = np.random.default_rng()
    # replay the caller's generator state for every spec: folds and
    # constraint samples are then identical across specs AND identical to
    # what the generic refit driver would draw from the same rng
    state = rng.bit_generator.state
    out: Dict[Tuple[int, float], Tuple[Optional[float], Optional[float], int]] = {}
    for i, spec in enumerate(specs):
        replay = np.random.default_rng()
        replay.bit_generator.state = state
        table = fused_gb_cv(
            coords,
            forces,
            coord_map,
            constraints,
            kbt=kbt,
            spec=spec,
            l2_values=l2_values,
            n_folds=n_folds,
            n_constraint_frames=n_constraint_frames,
            rng=replay,
            mesh=mesh,
        )
        for l2, stats in table.items():
            out[(i, float(l2))] = stats
    return out
