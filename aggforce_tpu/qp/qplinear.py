"""Optimal static linear force maps via constrained least squares.

Behavior parity target: reference qp/qplinear.py:30-164. The optimization
problem is identical — for each cg site i,

    minimize  x^T P x,   P = (F C)^T (F C) [+ l2 * C^T C]
    s.t.      (M C) x = e_i

with F the (3T, n_fg) stacked forces, M the coordinate map matrix, and C the
constraint duplication matrix tying constrained atoms to shared coefficients.

TPU-first redesign (same math, different execution):

  * the Gram matrix P is ONE large MXU matmul over the whole (sharded) frame
    axis instead of a host-side numpy product;
  * all n_cg per-site QPs share (P, A): they are solved simultaneously by a
    single factorize-once multi-RHS KKT solve (:mod:`aggforce_tpu.ops.eqp`)
    instead of n_cg serial OSQP invocations (reference qp/qplinear.py:79-86);
  * the entire fit — reshape, Gram, KKT, re-expansion C @ X — is a single
    jitted function; a float64 host path is available for
    accuracy-critical/oracle use.
"""

from functools import partial
from typing import Optional, Tuple, TypedDict, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints, constraint_lookup_dict, reduce_constraint_sets
from ..map import LinearMap, SeperableTMap
from ..ops.core import qp_form
from ..ops.eqp import eqp_solve_auglag, eqp_solve_host
from ..trajectory import ForcesTrajectory


class SolverOptions(TypedDict, total=False):
    """Knobs for the constrained solvers.

    ``backend``: "device" (jitted f32 augmented-Lagrangian path), "host"
    (float64 LAPACK KKT), "native" (in-tree C++), or "auto". ``delta``:
    diagonal regularization after equilibration. ``refine_iters``: dual /
    refinement iterations of the chosen solver. ``resid_tol``: max
    equilibrated constraint violation tolerated from the f32 device solve
    before escalating to the float64 host oracle. Unknown keys (e.g. the
    reference's OSQP options such as "solver", "eps_abs", "max_iter",
    "polish") are accepted and ignored so reference call sites keep working.
    """

    backend: str
    delta: float
    refine_iters: int
    resid_tol: float


DEFAULT_SOLVER_OPTIONS: SolverOptions = {
    "backend": "auto",
}

# refinement defaults are per-backend (the host LU twin converges in a few
# sweeps; the device direct solver's while_loop early-exits on measured
# convergence, so its bound is a worst-case budget honored exactly, not a
# cost), so they are NOT baked into the shared defaults — an explicit user
# setting overrides both
HOST_REFINE_ITERS = 4
DEVICE_REFINE_ITERS = 40

_KNOWN_OPTION_KEYS = frozenset(("backend", "delta", "refine_iters", "resid_tol"))


def _solver_opts(solver_args: Optional[dict]) -> SolverOptions:
    if solver_args is None:
        return dict(DEFAULT_SOLVER_OPTIONS)  # type: ignore[return-value]
    out = dict(DEFAULT_SOLVER_OPTIONS)
    for k, v in solver_args.items():
        if k in _KNOWN_OPTION_KEYS:
            out[k] = v
    return out  # type: ignore[return-value]


@partial(jax.jit, static_argnames=("n_chunks", "r"))
def _device_linear_fit(
    forces: jax.Array,
    labels: jax.Array,  # (N,) int32: site -> reduced-coefficient column
    cmap_mat: jax.Array,
    l2_regularization: jax.Array,
    n_chunks: int = 1,
    r: int = 0,
) -> jax.Array:
    """Fused device fit: blockwise Gram + multi-RHS solve + re-expansion.

    forces: (T, N, 3) with T divisible by n_chunks; cmap_mat: (n_cg, N).
    The constraint duplication matrix C is built ON DEVICE from the integer
    ``labels`` (a 4*N-byte upload instead of a dense (N, R) float matrix —
    at sweep scale, 12 KB instead of ~27 MB through the host tunnel per
    fit). The Gram accumulates over frame blocks under a scan so only one
    (3*chunk, R) design block is ever live — 100k-frame,
    thousands-of-atoms sweeps fit in HBM. Returns the (n_cg, N) force-map
    matrix and the solver's constraint-violation diagnostic.
    """
    t, n, d = forces.shape
    chunk = t // n_chunks
    blocks = forces.reshape(n_chunks, chunk, n, d)
    con_mat = jax.nn.one_hot(labels, r, dtype=forces.dtype)  # (N, R)

    def body(gram, f_block):
        flat = jnp.swapaxes(f_block, 1, 2).reshape(chunk * d, n)
        design = jnp.matmul(flat, con_mat, precision="highest")
        return (
            gram + jnp.matmul(design.T, design, precision="highest"),
            None,
        )

    gram0 = jnp.zeros((r, r), dtype=forces.dtype)
    gram, _ = jax.lax.scan(body, gram0, blocks)
    # C^T C is diagonal with the per-column member counts
    counts = jax.ops.segment_sum(
        jnp.ones((n,), dtype=forces.dtype), labels, num_segments=r
    )
    gram = gram + l2_regularization * jnp.diag(counts)
    a_mat = jnp.matmul(cmap_mat, con_mat, precision="highest")
    basis = jnp.eye(a_mat.shape[0], dtype=forces.dtype)
    x, resid = eqp_solve_auglag(gram, a_mat, basis, return_resid=True)
    # re-expansion C @ x is a row gather
    return x[labels].T, resid


def _host_linear_fit(
    forces: np.ndarray,
    con_mat: np.ndarray,
    cmap_mat: np.ndarray,
    l2_regularization: float,
    delta: float = 1e-12,
    refine_iters: int = 4,
) -> np.ndarray:
    """Float64 LAPACK twin of :func:`_device_linear_fit`."""
    design = qp_form(np.asarray(forces, dtype=np.float64)) @ con_mat
    gram = design.T @ design
    if l2_regularization > 0.0:
        gram = gram + l2_regularization * (con_mat.T @ con_mat)
    a_mat = np.asarray(cmap_mat, dtype=np.float64) @ con_mat
    basis = np.eye(a_mat.shape[0])
    x = eqp_solve_host(gram, a_mat, basis, delta=delta, refine_iters=refine_iters)
    return (con_mat @ x).T


def qp_linear_map(
    traj: ForcesTrajectory,
    coord_map: LinearMap,
    constraints: Optional[Constraints] = None,
    l2_regularization: float = 0.0,
    solver_args: Optional[Union[SolverOptions, dict]] = None,
    mesh=None,
) -> SeperableTMap:
    """Find the linear force map minimizing the mean squared mapped force.

    Arguments mirror the reference entry point; ``solver_args`` accepts (and
    ignores) reference OSQP options plus the native options documented on
    :class:`SolverOptions`. ``mesh`` (a 1-D jax Mesh over axis "frames")
    shards the frame axis of the Gram reduction across devices; host/native
    backends are single-process and ignore it.
    """
    if constraints is None:
        constraints = set()
    opts = _solver_opts(dict(solver_args) if solver_args else None)
    labels, reduced_n = constraint_labels(coord_map.n_fg_sites, constraints)

    def con_mat() -> np.ndarray:
        # dense duplication matrix, built only on the paths that consume it
        # (host/native/mesh/escalation) — at sweep scale it is a ~30-70 MB
        # host allocation the label-based device path never needs
        return _dense_from_labels(labels, reduced_n)

    forces = traj.forces
    backend = opts.get("backend", "auto")
    if backend == "auto":
        backend = "host" if forces.dtype == np.float64 else "device"

    if backend == "device" and mesh is not None:
        from ..parallel.mesh import sharded_linear_fit

        fmap_mat, resid_val = sharded_linear_fit(
            forces,
            con_mat().astype(np.float32),
            np.asarray(coord_map.standard_matrix, dtype=np.float32),
            l2_regularization=l2_regularization,
            mesh=mesh,
            return_resid=True,
        )
        if not np.all(np.isfinite(fmap_mat)) or not resid_val <= opts.get(
            "resid_tol", 1e-4
        ):  # NaN-aware — same escalation contract as the single-device path
            fmap_mat = _host_linear_fit(
                np.asarray(forces),
                con_mat().astype(np.float64),
                coord_map.standard_matrix,
                l2_regularization,
            ).astype(np.asarray(fmap_mat).dtype)
    elif backend == "native":
        from ..native import eqp_solve_native

        cmat = con_mat()
        design = qp_form(np.asarray(forces, dtype=np.float64)) @ cmat
        gram = design.T @ design
        if l2_regularization > 0.0:
            gram = gram + l2_regularization * (cmat.T @ cmat)
        a_mat = np.asarray(coord_map.standard_matrix, dtype=np.float64) @ cmat
        x = eqp_solve_native(
            gram,
            a_mat,
            np.eye(a_mat.shape[0]),
            delta=opts.get("delta", 1e-11),
            refine_iters=opts.get("refine_iters", 4),
        )
        fmap_mat = (cmat @ x).T.astype(np.asarray(forces).dtype)
    elif backend == "host":
        fmap_mat = _host_linear_fit(
            forces,
            con_mat().astype(np.float64),
            coord_map.standard_matrix,
            l2_regularization,
            delta=opts.get("delta", 1e-12),
            refine_iters=opts.get("refine_iters", 4),
        )
        fmap_mat = fmap_mat.astype(np.asarray(forces).dtype)
    else:
        forces_dev = (
            forces if isinstance(forces, jax.Array) else jnp.asarray(forces)
        )
        dtype = forces_dev.dtype
        t = forces_dev.shape[0]
        # bound the live design block to ~4096 frames; zero-padded frames
        # contribute nothing to the Gram
        n_chunks = max(1, -(-t // 4096))
        chunk = -(-t // n_chunks)
        pad = chunk * n_chunks - t
        if pad:
            forces_dev = jnp.pad(forces_dev, ((0, pad), (0, 0), (0, 0)))
        from ..utils.devcache import device_const, device_scalar

        fmap_dev, resid_dev = _device_linear_fit(
            forces_dev,
            device_const(labels, dtype=np.asarray(labels).dtype),
            device_const(coord_map.standard_matrix, dtype=dtype),
            device_scalar(l2_regularization, dtype=dtype),
            n_chunks=n_chunks,
            r=reduced_n,
        )
        fmap_mat, resid_val = jax.device_get((fmap_dev, resid_dev))
        fmap_mat = np.asarray(fmap_mat)
        if not np.all(np.isfinite(fmap_mat)) or not float(resid_val) <= opts.get(
            "resid_tol", 1e-4
        ):  # NaN-aware
            # convergence check failed (non-finite, or equilibrated
            # constraint violation above tolerance — the analogue of OSQP's
            # eps_abs termination + polish in the reference): escalate to
            # the float64 LAPACK twin.
            fmap_mat = _host_linear_fit(
                np.asarray(forces),
                con_mat().astype(np.float64),
                coord_map.standard_matrix,
                l2_regularization,
            ).astype(np.asarray(fmap_mat).dtype)
    if isinstance(traj.forces, jax.Array):
        # device-resident input -> device-native maps, so downstream
        # application stays on device (jax in -> jax out) with no host
        # round-trips of trajectory-sized arrays
        from ..map import JLinearMap

        return SeperableTMap(
            coord_map=JLinearMap.from_linearmap(coord_map),
            force_map=JLinearMap(fmap_mat),
        )
    force_map = LinearMap(fmap_mat)
    return SeperableTMap(coord_map=coord_map, force_map=force_map)


def constraint_labels(
    n_sites: int, constraints: Constraints
) -> Tuple[np.ndarray, int]:
    """Site -> reduced-coefficient column labels, plus the reduced dimension.

    The integer form of the duplication matrix C (``C = one_hot(labels)``):
    sites in the same (merged) constraint group share one column; columns
    are ordered by each anchor's position among unconstrained sites
    (reference qp/qplinear.py:106-164 semantics). Device fits upload these
    4*N bytes and build C on device instead of shipping the dense matrix.
    """
    groups = reduce_constraint_sets(constraints)
    lookup = constraint_lookup_dict(groups)
    labels = np.full(n_sites, -1, dtype=np.int32)
    col = 0
    for site in range(n_sites):
        if site not in lookup:
            labels[site] = col
            col += 1
    for site, anchor in lookup.items():
        labels[site] = labels[anchor]
    return labels, col


def _dense_from_labels(labels: np.ndarray, reduced_n: int) -> np.ndarray:
    """Dense duplication matrix C = one_hot(labels) (single source of truth)."""
    mat = np.zeros((labels.shape[0], reduced_n))
    mat[np.arange(labels.shape[0]), labels] = 1.0
    return mat


def make_bond_constraint_matrix(n_sites: int, constraints: Constraints) -> np.ndarray:
    """Duplication matrix C mapping reduced coefficients to per-site ones.

    Dense form of :func:`constraint_labels` (kept for the host/native/mesh
    paths and reference-parity call sites).
    """
    labels, reduced_n = constraint_labels(n_sites, constraints)
    return _dense_from_labels(labels, reduced_n)
