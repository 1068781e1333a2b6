"""Equality-constrained QP solver correctness (device vs float64 oracle)."""

import numpy as np

from aggforce_tpu.ops.eqp import batched_eqp_solve, eqp_solve, eqp_solve_host


def _kkt_reference(P, A, b):
    """Direct float64 KKT solve via lstsq (handles redundant rows)."""
    n, m = P.shape[0], A.shape[0]
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    rhs = np.concatenate([np.zeros(n), b])
    z, *_ = np.linalg.lstsq(K, rhs, rcond=None)
    return z[:n]


def _random_problem(rng, n=12, m=3, n_data=200):
    F = rng.normal(size=(n_data, n))
    P = F.T @ F / n_data + 0.1 * np.eye(n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    return P, A, b


def test_host_solver_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(5):
        P, A, b = _random_problem(rng)
        x = eqp_solve_host(P, A, b[:, None])[:, 0]
        np.testing.assert_allclose(x, _kkt_reference(P, A, b), atol=1e-8)
        np.testing.assert_allclose(A @ x, b, atol=1e-9)


def test_device_solver_close_to_host():
    rng = np.random.default_rng(1)
    P, A, b = _random_problem(rng)
    x_dev = np.asarray(eqp_solve(P.astype(np.float32), A.astype(np.float32),
                                 b.astype(np.float32)[:, None]))[:, 0]
    x_host = eqp_solve_host(P, A, b[:, None])[:, 0]
    np.testing.assert_allclose(x_dev, x_host, atol=5e-4)
    np.testing.assert_allclose(A @ x_dev, b, atol=1e-4)


def test_multi_rhs_matches_loop():
    rng = np.random.default_rng(2)
    P, A, _ = _random_problem(rng, m=4)
    B = np.eye(4)
    X = eqp_solve_host(P, A, B)
    for i in range(4):
        xi = eqp_solve_host(P, A, B[:, i : i + 1])[:, 0]
        np.testing.assert_allclose(X[:, i], xi, atol=1e-10)


def test_redundant_constraints():
    """Duplicated constraint rows (rank-deficient A) must still solve."""
    rng = np.random.default_rng(3)
    P, A, b = _random_problem(rng, n=10, m=2)
    A_red = np.concatenate([A, A, A], axis=0)
    b_red = np.concatenate([b, b, b])
    x = eqp_solve_host(P, A_red, b_red[:, None])[:, 0]
    x_clean = eqp_solve_host(P, A, b[:, None])[:, 0]
    np.testing.assert_allclose(x, x_clean, atol=1e-7)
    x_dev = np.asarray(
        eqp_solve(
            P.astype(np.float32),
            A_red.astype(np.float32),
            b_red.astype(np.float32)[:, None],
        )
    )[:, 0]
    np.testing.assert_allclose(x_dev, x_clean, atol=5e-3)
    np.testing.assert_allclose(A @ x_dev, b, atol=1e-3)


def test_optimality_kkt_conditions():
    """Solution must be stationary on the constraint manifold."""
    rng = np.random.default_rng(4)
    P, A, b = _random_problem(rng)
    x = eqp_solve_host(P, A, b[:, None])[:, 0]
    # gradient P x must lie in the row space of A (exist nu: P x = -A^T nu)
    nu, *_ = np.linalg.lstsq(A.T, -P @ x, rcond=None)
    np.testing.assert_allclose(P @ x, -A.T @ nu, atol=1e-8)
    # perturbations within null(A) must not decrease the objective
    _, _, vt = np.linalg.svd(A)
    null_basis = vt[A.shape[0] :]
    for z in null_basis:
        for eps in (1e-3, -1e-3):
            x_pert = x + eps * z
            assert x_pert @ P @ x_pert >= x @ P @ x - 1e-10


def test_batched_solver():
    rng = np.random.default_rng(5)
    problems = [_random_problem(rng, n=8, m=2) for _ in range(6)]
    P = np.stack([p for p, _, _ in problems]).astype(np.float32)
    A = np.stack([a for _, a, _ in problems]).astype(np.float32)
    B = np.stack([b[:, None] for _, _, b in problems]).astype(np.float32)
    X = np.asarray(batched_eqp_solve(P, A, B))
    for i, (p, a, b) in enumerate(problems):
        expect = eqp_solve_host(p, a, b[:, None])[:, 0]
        np.testing.assert_allclose(X[i, :, 0], expect, atol=1e-3)


def test_shared_solver_matches_host_oracle():
    """batched_eqp_solve_shared: every (fit, site) problem must match the
    float64 oracle, with the per-site cost matrix shared across fits."""
    from aggforce_tpu.ops.eqp import batched_eqp_solve_shared

    rng = np.random.default_rng(7)
    s, f, n, m = 3, 4, 20, 6
    P = np.stack(
        [
            (lambda F: (F.T @ F / 100 + 0.5 * np.eye(n)).astype(np.float32))(
                rng.normal(size=(100, n))
            )
            for _ in range(s)
        ]
    )
    A = rng.normal(size=(f, s, m, n)).astype(np.float32)
    B = rng.normal(size=(f, s, m, 1)).astype(np.float32)
    X, R = batched_eqp_solve_shared(P, A, B, return_resid=True)
    X = np.asarray(X)
    assert np.asarray(R).shape == (f, s)
    for fi in range(f):
        for si in range(s):
            expect = eqp_solve_host(P[si], A[fi, si], B[fi, si])
            np.testing.assert_allclose(X[fi, si], expect, atol=5e-4)
    assert float(np.asarray(R).max()) < 1e-5


def test_shared_solver_batch_invariance():
    """A problem's solution must be identical whether it is solved alone
    (fit-batch of one) or inside a larger batch — the refinement loop is
    per-problem masked and the Z construction is window-size independent."""
    from aggforce_tpu.ops.eqp import batched_eqp_solve_shared

    rng = np.random.default_rng(8)
    s, f, n, m = 2, 5, 16, 4
    P = np.stack(
        [
            (lambda F: (F.T @ F / 60 + 0.2 * np.eye(n)).astype(np.float32))(
                rng.normal(size=(60, n))
            )
            for _ in range(s)
        ]
    )
    A = rng.normal(size=(f, s, m, n)).astype(np.float32)
    B = rng.normal(size=(f, s, m, 1)).astype(np.float32)
    X_all = np.asarray(batched_eqp_solve_shared(P, A, B))
    for fi in range(f):
        X_one = np.asarray(
            batched_eqp_solve_shared(P, A[fi : fi + 1], B[fi : fi + 1])
        )[0]
        np.testing.assert_array_equal(X_all[fi], X_one)


def test_shared_solver_direct_z_route():
    """The solve-based Z route (op_is_factor=True) must match the
    explicit-inverse route and the float64 oracle on the same problems.

    This is the sweep-scale path of batched_eqp_solve_shared: above
    _DIRECT_Z_N_THRESHOLD with few total right-hand sides (f*m <= 2n) the
    explicit per-site inverse costs ~7x the FLOPs of the one Z it enables,
    so Z comes from a cho_solve against the factor instead. The route is a
    shape-only (trace-time) choice; both routes land in the same
    _schur_tail, so accuracy class and escalation semantics are shared.
    """
    import jax

    from aggforce_tpu.ops import eqp

    rng = np.random.default_rng(9)
    s, f, n, m = 2, 1, 24, 5
    P = np.stack(
        [
            (lambda F: (F.T @ F / 80 + 0.3 * np.eye(n)).astype(np.float32))(
                rng.normal(size=(80, n))
            )
            for _ in range(s)
        ]
    )
    A = rng.normal(size=(f, s, m, n)).astype(np.float32)
    B = rng.normal(size=(f, s, m, 1)).astype(np.float32)

    chol = eqp._site_factor_chol(P, 1e-6, 3e-4)
    x_direct, r_direct = eqp._shared_schur_stage(
        chol, A, B, 1e-6, 3e-4, 10, op_is_factor=True
    )
    minv = eqp._site_factor_inv(P, 1e-6, 3e-4)
    x_inv, _ = eqp._shared_schur_stage(minv, A, B, 1e-6, 3e-4, 10)
    x_direct, x_inv = np.asarray(x_direct), np.asarray(x_inv)
    for si in range(s):
        expect = eqp_solve_host(P[si], A[0, si], B[0, si])
        np.testing.assert_allclose(x_direct[0, si], expect, atol=5e-4)
        np.testing.assert_allclose(x_inv[0, si], expect, atol=5e-4)
    assert float(np.asarray(r_direct).max()) < 1e-5

    # the jitted wrapper takes the direct route when the shape gate fires
    orig = eqp._DIRECT_Z_N_THRESHOLD
    try:
        eqp._DIRECT_Z_N_THRESHOLD = 16  # n=24 > 16, f*m=5 <= 2n
        jax.clear_caches()  # drop traces cached with the real threshold
        x_gated = np.asarray(eqp.batched_eqp_solve_shared(P, A, B))
    finally:
        eqp._DIRECT_Z_N_THRESHOLD = orig
        jax.clear_caches()
    np.testing.assert_allclose(x_gated, x_direct, atol=1e-5)
