"""Solver convergence diagnostics and float64 escalation.

The device (f32) augmented-Lagrangian solver now reports the max
equilibrated constraint violation alongside its solutions; callers escalate
finite-but-unconverged solves to the float64 oracle. This mirrors the
reference's reliance on OSQP's eps_abs=1e-7 termination + polish
(reference qp/qplinear.py:21-27) — there, convergence was the solver's
contract; here it is checked explicitly.
"""

import numpy as np
import pytest

from aggforce_tpu.ops.eqp import batched_eqp_solve_auglag, eqp_solve_auglag
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
from aggforce_tpu.qp.qplinear import qp_linear_map
from aggforce_tpu.trajectory import Trajectory


def _random_problem(rng, n=12, m=3, n_data=200):
    F = rng.normal(size=(n_data, n))
    P = (F.T @ F / n_data + 0.1 * np.eye(n)).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    return P, A, b


def test_resid_reported_small_on_easy_problem():
    rng = np.random.default_rng(0)
    P, A, b = _random_problem(rng)
    x, resid = eqp_solve_auglag(P, A, b[:, None], return_resid=True)
    assert float(resid) < 1e-5
    # the reported residual must actually measure the equilibrated system
    row_norm = np.linalg.norm(A, axis=1, keepdims=True)
    manual = np.max(np.abs(b / row_norm[:, 0] - (A / row_norm) @ np.asarray(x)[:, 0]))
    np.testing.assert_allclose(float(resid), manual, rtol=1e-2, atol=1e-7)


def test_batched_resid_is_max_over_batch():
    rng = np.random.default_rng(1)
    probs = [_random_problem(rng) for _ in range(4)]
    P = np.stack([p for p, _, _ in probs])
    A = np.stack([a for _, a, _ in probs])
    B = np.stack([b[:, None] for _, _, b in probs])
    _, resid = batched_eqp_solve_auglag(P, A, B, return_resid=True)
    singles = [
        float(eqp_solve_auglag(p, a, b[:, None], return_resid=True)[1])
        for p, a, b in probs
    ]
    np.testing.assert_allclose(float(resid), max(singles), rtol=1e-3, atol=1e-7)


def test_truncated_solver_reports_large_resid():
    """One dual iteration cannot converge: the diagnostic must say so."""
    rng = np.random.default_rng(2)
    P, A, b = _random_problem(rng)
    _, resid1 = eqp_solve_auglag(P, A, b[:, None], iters=1, return_resid=True)
    _, resid40 = eqp_solve_auglag(P, A, b[:, None], iters=40, return_resid=True)
    assert float(resid1) > 10 * float(resid40)
    assert float(resid1) > 1e-4


@pytest.mark.jax
def test_fused_fit_escalates_unconverged_solve(cln_fixture_module, cln_ca_map_module):
    """A deliberately truncated device solve must trigger the f64 fallback
    and still produce a correct map (matches the fully converged fit)."""
    fix, cmap = cln_fixture_module, cln_ca_map_module
    traj = Trajectory(coords=fix["coords"][:512], forces=fix["forces"][:512])
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=5, width=1.0)
    kw = dict(
        kbt=float(fix["kbt"]),
        spec=spec,
        constraints=set(fix["constraint_groups"]),
        l2_regularization=1e3,
        constraint_rng=np.random.default_rng(5),
    )
    # solver_iters=1 leaves resid >> tol -> escalation path
    tmap_esc = fused_gb_linear_map(traj, cmap, solver_iters=1, **kw)
    assert tmap_esc.force_map.tags["solver_resid"] < 1e-6  # f64 achieved
    tmap_ref = fused_gb_linear_map(traj, cmap, solver_iters=40, **kw)
    # the Gram is near-flat along regularized directions, so compare the
    # physical output (mapped forces), not raw coefficients
    sub = slice(0, 128)
    _, f_esc = tmap_esc.map_arrays(fix["coords"][sub], fix["forces"][sub])
    _, f_ref = tmap_ref.map_arrays(fix["coords"][sub], fix["forces"][sub])
    rms = np.sqrt(np.mean((np.asarray(f_esc) - np.asarray(f_ref)) ** 2))
    scale = np.sqrt(np.mean(np.asarray(f_ref) ** 2))
    assert rms < 1e-3 * scale


@pytest.mark.jax
def test_fused_fit_records_device_resid(cln_fixture_module, cln_ca_map_module):
    fix, cmap = cln_fixture_module, cln_ca_map_module
    traj = Trajectory(coords=fix["coords"][:512], forces=fix["forces"][:512])
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=5, width=1.0)
    tmap = fused_gb_linear_map(
        traj,
        cmap,
        kbt=float(fix["kbt"]),
        spec=spec,
        constraints=set(fix["constraint_groups"]),
        l2_regularization=1e3,
        constraint_rng=np.random.default_rng(5),
    )
    assert tmap.force_map.tags["solver_resid"] < 1e-4


@pytest.mark.jax
def test_linear_fit_escalation_matches_host(cln_fixture_module, cln_ca_map_module):
    """resid_tol=-1 forces the escalation branch unconditionally; the result
    must coincide with the float64 host backend."""
    fix, cmap = cln_fixture_module, cln_ca_map_module
    traj = Trajectory(
        coords=fix["coords"][:256].astype(np.float32),
        forces=fix["forces"][:256].astype(np.float32),
    )
    constraints = set(fix["constraint_groups"])
    t_esc = qp_linear_map(
        traj, cmap, constraints=constraints, solver_args={"resid_tol": -1.0}
    )
    t_host = qp_linear_map(
        traj, cmap, constraints=constraints, solver_args={"backend": "host"}
    )
    np.testing.assert_allclose(
        t_esc.force_map.standard_matrix,
        t_host.force_map.standard_matrix,
        atol=1e-5,
    )
