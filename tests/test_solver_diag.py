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


def test_batched_resid_is_per_problem():
    rng = np.random.default_rng(1)
    probs = [_random_problem(rng) for _ in range(4)]
    P = np.stack([p for p, _, _ in probs])
    A = np.stack([a for _, a, _ in probs])
    B = np.stack([b[:, None] for _, _, b in probs])
    _, resids = batched_eqp_solve_auglag(P, A, B, return_resid=True)
    singles = [
        float(eqp_solve_auglag(p, a, b[:, None], return_resid=True)[1])
        for p, a, b in probs
    ]
    assert np.asarray(resids).shape == (4,)
    np.testing.assert_allclose(
        np.asarray(resids), np.asarray(singles), rtol=1e-3, atol=2e-6
    )


def test_infeasible_constraints_report_large_resid():
    """Near-parallel constraint rows with inconsistent targets cannot be
    satisfied; the diagnostic must report the violation honestly (this is
    what triggers float64 escalation upstream) while consistent duplicated
    rows stay exactly solvable."""
    rng = np.random.default_rng(2)
    n, m = 24, 6
    F = rng.normal(size=(200, n))
    P = (F.T @ F / 200).astype(np.float32)
    base = rng.normal(size=n)
    A = np.stack(
        [base + 1e-6 * rng.normal(size=n) for _ in range(m)]
    ).astype(np.float32)
    b_bad = rng.normal(size=(m, 1)).astype(np.float32)
    x, resid = eqp_solve_auglag(P, A, b_bad, return_resid=True)
    assert np.all(np.isfinite(np.asarray(x)))
    assert float(resid) > 1e-2  # finite-but-wrong: diagnostic must say so

    b_ok = np.full((m, 1), 0.7, dtype=np.float32)  # consistent targets
    _, resid_ok = eqp_solve_auglag(P, A, b_ok, return_resid=True)
    assert float(resid_ok) < 1e-4


@pytest.mark.jax
def test_fused_fit_escalates_unconverged_solve(cln_fixture_module, cln_ca_map_module):
    """A device solve flagged unconverged must trigger the f64 fallback and
    still produce a correct map (matches the normal device fit)."""
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
    # resid_tol=-1 declares every device solve unconverged -> escalation
    tmap_esc = fused_gb_linear_map(traj, cmap, resid_tol=-1.0, **kw)
    assert tmap_esc.force_map.tags["solver_resid"] < 1e-6  # f64 achieved
    tmap_ref = fused_gb_linear_map(traj, cmap, **kw)
    # the Gram is near-flat along regularized directions (and the f32 and
    # f64 paths regularize those modes with different deltas), so compare
    # the physical output (mapped forces) at the ~1% level the weak modes
    # allow, not raw coefficients
    sub = slice(0, 128)
    _, f_esc = tmap_esc.map_arrays(fix["coords"][sub], fix["forces"][sub])
    _, f_ref = tmap_ref.map_arrays(fix["coords"][sub], fix["forces"][sub])
    rms = np.sqrt(np.mean((np.asarray(f_esc) - np.asarray(f_ref)) ** 2))
    scale = np.sqrt(np.mean(np.asarray(f_ref) ** 2))
    assert rms < 1e-2 * scale


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
