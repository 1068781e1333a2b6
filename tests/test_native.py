"""Native C++ QP solver parity against the float64 host oracle."""

import numpy as np
import pytest

from aggforce_tpu.native import (
    admm_solve_native,
    eqp_solve_native,
    native_available,
    native_build_error,
)
from aggforce_tpu.ops.eqp import eqp_solve_host

needs_native = pytest.mark.skipif(
    not native_available(), reason=f"native solver unavailable: {native_build_error()}"
)


def _problem(rng, n=14, m=4):
    F = rng.normal(size=(80, n))
    P = F.T @ F / 80 + 0.05 * np.eye(n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    return P, A, b


@needs_native
def test_native_kkt_matches_host():
    rng = np.random.default_rng(0)
    for trial in range(4):
        P, A, b = _problem(rng)
        x_native = eqp_solve_native(P, A, b[:, None])[:, 0]
        x_host = eqp_solve_host(P, A, b[:, None])[:, 0]
        np.testing.assert_allclose(x_native, x_host, atol=1e-8)
        np.testing.assert_allclose(A @ x_native, b, atol=1e-8)


@needs_native
def test_native_kkt_multirhs():
    rng = np.random.default_rng(1)
    P, A, _ = _problem(rng, m=3)
    B = np.eye(3)
    X = eqp_solve_native(P, A, B)
    for i in range(3):
        np.testing.assert_allclose(
            X[:, i], eqp_solve_host(P, A, B[:, i : i + 1])[:, 0], atol=1e-8
        )


@needs_native
def test_native_kkt_badly_scaled():
    rng = np.random.default_rng(2)
    P, A, b = _problem(rng)
    x_ref = eqp_solve_host(P, A, b[:, None])[:, 0]
    # scaling the objective must not move the solution (equilibration)
    x_scaled = eqp_solve_native(1e9 * P, A, b[:, None])[:, 0]
    np.testing.assert_allclose(x_scaled, x_ref, atol=1e-7)


@needs_native
def test_native_admm_matches_kkt():
    rng = np.random.default_rng(3)
    for trial in range(3):
        P, A, b = _problem(rng, n=10, m=3)
        # polish=False: the RAW ADMM iterate must independently agree with
        # the direct KKT solver (with polish on, the comparison would just
        # test the KKT refinement against itself)
        x_admm = admm_solve_native(P, A, b, polish=False, eps_abs=1e-11)
        x_kkt = eqp_solve_native(P, A, b[:, None])[:, 0]
        np.testing.assert_allclose(x_admm, x_kkt, atol=1e-6)
        # polished result refines the iterate to KKT accuracy as well
        x_pol = admm_solve_native(P, A, b, max_iter=50)
        np.testing.assert_allclose(x_pol, x_kkt, atol=1e-8)


@needs_native
def test_native_backend_in_qp_linear_map(waterdimer):
    from aggforce_tpu import LinearMap, project_forces
    from aggforce_tpu.agg import TMAP_KNAME

    forces = waterdimer["forces"]
    cmap = LinearMap([[0], [3]], n_fg_sites=forces.shape[1], handle_nans=False)
    res = project_forces(
        coords=np.full_like(forces, np.nan),
        forces=forces,
        coord_map=cmap,
        constrained_inds=set(),
        solver_args={"backend": "native"},
    )
    expect = np.array([[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]], dtype=float)
    np.testing.assert_allclose(
        res[TMAP_KNAME].force_map.standard_matrix, expect, atol=5e-3
    )
