"""Blocked Cholesky / solve: parity with the LAPACK-semantics jsl path."""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
import pytest

from aggforce_tpu.ops.blocked_chol import cho_solve_blocked, cholesky_blocked


def _spd(n, seed, cond_boost=0.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    M = A @ A.T / n + np.eye(n, dtype=np.float32)
    if cond_boost:
        M += cond_boost * np.outer(A[:, 0], A[:, 0])
    return M


@pytest.mark.parametrize("n", [8, 64, 128, 129, 300, 702])
def test_cholesky_blocked_matches_lapack(n):
    M = jnp.asarray(_spd(n, seed=n))
    L = np.asarray(cholesky_blocked(M, nb=128))
    ref = np.linalg.cholesky(np.asarray(M, dtype=np.float64))
    assert np.allclose(L, ref, atol=5e-3, rtol=1e-3)
    # strict upper triangle is exactly zero (unlike LAPACK storage)
    assert np.all(np.triu(L, k=1) == 0.0)


@pytest.mark.parametrize("n,n_rhs", [(64, 1), (128, 7), (300, 79), (702, 79)])
def test_cho_solve_blocked_matches_lapack(n, n_rhs):
    M = jnp.asarray(_spd(n, seed=n + 1))
    B = jnp.asarray(
        np.random.default_rng(n_rhs).normal(size=(n, n_rhs)).astype(np.float32)
    )
    L = cholesky_blocked(M, nb=128)
    X = np.asarray(cho_solve_blocked(L, B, nb=128))
    ref = np.linalg.solve(
        np.asarray(M, dtype=np.float64), np.asarray(B, dtype=np.float64)
    )
    assert np.allclose(X, ref, atol=1e-2, rtol=1e-3)
    # residual-level check (scale-free)
    resid = np.asarray(M, dtype=np.float64) @ X - np.asarray(B, np.float64)
    assert np.abs(resid).max() < 1e-3 * max(1.0, np.abs(np.asarray(B)).max())


def test_vector_rhs_roundtrip():
    n = 100
    M = jnp.asarray(_spd(n, seed=5))
    b = jnp.asarray(np.random.default_rng(5).normal(size=(n,)).astype(np.float32))
    L = cholesky_blocked(M)
    x = cho_solve_blocked(L, b)
    assert x.shape == (n,)
    assert np.allclose(np.asarray(M) @ np.asarray(x), np.asarray(b), atol=1e-2)


def test_vmap_batched():
    n, S = 130, 4
    Ms = jnp.stack([jnp.asarray(_spd(n, seed=i)) for i in range(S)])
    Bs = jnp.asarray(
        np.random.default_rng(0).normal(size=(S, n, 3)).astype(np.float32)
    )
    Ls = jax.vmap(lambda m: cholesky_blocked(m, nb=64))(Ms)
    Xs = jax.vmap(lambda l, b: cho_solve_blocked(l, b, nb=64))(Ls, Bs)
    for i in range(S):
        ref = np.linalg.solve(
            np.asarray(Ms[i], dtype=np.float64), np.asarray(Bs[i], np.float64)
        )
        assert np.allclose(np.asarray(Xs[i]), ref, atol=1e-2, rtol=1e-3)


def test_nonfinite_propagates():
    # indefinite input -> NaNs in L (like the LAPACK path), so the solver's
    # finiteness-based regularization fallback keeps working
    n = 64
    M = -jnp.eye(n, dtype=jnp.float32)
    L = cholesky_blocked(M)
    assert not bool(jnp.isfinite(L).all())


@pytest.mark.parametrize("n", [8, 64, 128, 129, 300, 702])
def test_tri_inv_blocked_matches_dense(n):
    from aggforce_tpu.ops.blocked_chol import tri_inv_blocked

    M = jnp.asarray(_spd(n, seed=n + 3))
    L = np.linalg.cholesky(np.asarray(M, dtype=np.float64))
    Linv = np.asarray(tri_inv_blocked(jnp.asarray(L, jnp.float32), nb=128))
    ref = np.linalg.inv(L)
    assert np.allclose(Linv, ref, atol=5e-4, rtol=1e-3)
    # strictly upper triangle exactly zero
    assert np.all(np.triu(Linv, k=1) == 0.0)


@pytest.mark.parametrize("n", [64, 300, 702])
def test_spd_inv_from_chol_matches_dense(n):
    from aggforce_tpu.ops.blocked_chol import cholesky_blocked, spd_inv_from_chol

    M = jnp.asarray(_spd(n, seed=n + 5))
    L = cholesky_blocked(M, nb=128)
    Minv = np.asarray(spd_inv_from_chol(L, nb=128))
    ref = np.linalg.inv(np.asarray(M, dtype=np.float64))
    # inverse entries are O(1) for these well-conditioned fixtures
    assert np.allclose(Minv, ref, atol=5e-3, rtol=5e-3)
    # reconstruction: M @ Minv ~ I
    recon = np.asarray(M, dtype=np.float64) @ Minv
    assert np.allclose(recon, np.eye(n), atol=5e-3)


@pytest.mark.parametrize("n", [130, 300, 702, 1100])
def test_cholesky_recursive_matches_lapack(n):
    """Recursive splitting must match LAPACK like the panel loop does
    (leaf forced small so several recursion levels actually run)."""
    from aggforce_tpu.ops.blocked_chol import cholesky_recursive

    M = jnp.asarray(_spd(n, seed=n + 1))
    L = np.asarray(cholesky_recursive(M, nb=128, leaf=256))
    ref = np.linalg.cholesky(np.asarray(M, dtype=np.float64))
    assert np.allclose(L, ref, atol=5e-3, rtol=1e-3)
    assert np.all(np.triu(L, k=1) == 0.0)


def test_cholesky_recursive_vmap():
    from aggforce_tpu.ops.blocked_chol import cholesky_recursive

    M = np.stack([_spd(300, seed=s) for s in (3, 4)])
    L = np.asarray(
        jax.vmap(lambda x: cholesky_recursive(x, nb=128, leaf=256))(
            jnp.asarray(M)
        )
    )
    for i in range(2):
        ref = np.linalg.cholesky(M[i].astype(np.float64))
        assert np.allclose(L[i], ref, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("transpose_a", [False, True])
def test_tri_solve_blocked_matches_lapack(transpose_a):
    from aggforce_tpu.ops.blocked_chol import tri_solve_blocked

    n, n_rhs = 300, 7
    M = _spd(n, seed=11)
    L = np.linalg.cholesky(M.astype(np.float64)).astype(np.float32)
    B = np.random.default_rng(12).normal(size=(n, n_rhs)).astype(np.float32)
    Y = np.asarray(
        tri_solve_blocked(
            jnp.asarray(L), jnp.asarray(B), nb=128, transpose_a=transpose_a
        )
    )
    import scipy.linalg as sl

    ref = sl.solve_triangular(
        L.astype(np.float64), B.astype(np.float64),
        lower=True, trans="T" if transpose_a else "N",
    )
    assert np.allclose(Y, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("transpose_a", [False, True])
def test_tri_solve_dinv_scheme_matches_exact(transpose_a, monkeypatch):
    """AGGFORCE_TRISOLVE_DINV=1 panel scheme == exact panel solves.

    The flag is read at import, so flip the module global and call the
    unjitted function (the jit cache would otherwise serve the traced
    default-scheme program for these shapes).
    """
    import aggforce_tpu.ops.blocked_chol as bc

    n, n_rhs = 300, 7
    M = _spd(n, seed=21)
    L = np.linalg.cholesky(M.astype(np.float64)).astype(np.float32)
    B = np.random.default_rng(22).normal(size=(n, n_rhs)).astype(np.float32)
    monkeypatch.setattr(bc, "_TRISOLVE_DINV", True)
    Y = np.asarray(
        bc.tri_solve_blocked.__wrapped__(
            jnp.asarray(L), jnp.asarray(B), nb=128, transpose_a=transpose_a
        )
    )
    import scipy.linalg as sl

    ref = sl.solve_triangular(
        L.astype(np.float64), B.astype(np.float64),
        lower=True, trans="T" if transpose_a else "N",
    )
    assert np.allclose(Y, ref, atol=2e-3, rtol=1e-3)
