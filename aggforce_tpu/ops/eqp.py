"""Equality-constrained quadratic program solvers.

The reference delegates its per-CG-site QPs

    minimize  x^T P x      subject to  A x = b

to OSQP/SCS (C solvers behind ``qpsolvers``), looping over CG sites serially
(reference qp/qplinear.py:79-86, qp/featlinearmap.py:349-384). Because the
constraints here are *equality only*, the KKT conditions are linear:

    [ P   A^T ] [ x ]   [ 0 ]
    [ A   0   ] [ nu] = [ b ]

so a factorize-once/solve-many linear solve replaces the iterative ADMM
entirely. This module provides:

  * :func:`eqp_solve` — jitted multi-RHS KKT solve with OSQP-style diagonal
    regularization (handles rank-deficient / redundant constraint rows, which
    occur e.g. when constraint frames are sampled from frame-independent
    features) plus iterative refinement against the *unregularized* KKT
    operator — the same polish-refinement scheme OSQP uses, which converges to
    the exact solution for consistent systems while keeping every shape static
    for XLA.
  * :func:`batched_eqp_solve` — vmap of the above over a leading batch axis
    (per-CG-site problems with distinct P/A/b solved in parallel on device).
  * :func:`eqp_solve_host` — float64 numpy/LAPACK twin used as an accuracy
    oracle and as the default for small host-side fits.

All entries of B are solved against the same (P, A) factorization, so the
reference's per-site loop becomes one factorization + one triangular solve
with n_cg right-hand sides.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from .blocked_chol import cho_solve_blocked, cholesky_blocked

# Above this dimension the factorization/solve of the augmented operator
# switches to the blocked (fori_loop) kernels: XLA's unrolled lowering of
# cholesky/triangular_solve serializes to ~10 MB of device code at n~700,
# which a fresh process pays seconds to compile or load through the remote
# compile service. Small problems keep the unrolled path (faster, tiny).
_BLOCKED_N_THRESHOLD = 256


def _kkt(P: jax.Array, A: jax.Array, delta: jax.Array, regularized: bool):
    """Assemble the (regularized) KKT matrix."""
    n = P.shape[0]
    m = A.shape[0]
    if regularized:
        top = jnp.concatenate(
            [P + delta * jnp.eye(n, dtype=P.dtype), A.T], axis=1
        )
        bot = jnp.concatenate(
            [A, -delta * jnp.eye(m, dtype=P.dtype)], axis=1
        )
    else:
        top = jnp.concatenate([P, A.T], axis=1)
        bot = jnp.concatenate([A, jnp.zeros((m, m), dtype=P.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("iters", "return_resid"))
def eqp_solve_auglag(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    rho: float = 30.0,
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    r"""Direct range-space equality-QP solve (Cholesky only, multi-RHS).

    Solves min x^T P x s.t. A x = b through the augmented operator
    M = P + rho A^T A + delta I (same minimizer; rho bounds the condition
    number along constraint directions): Z = M^{-1} A^T via one multi-RHS
    Cholesky solve, lambda from the m x m Schur complement A M^{-1} A^T,
    x = Z lambda, then a short constraint-residual refinement loop. Uses
    unpivoted Cholesky factorizations only — on TPU this runs and compiles
    orders of magnitude faster than pivoted-LU KKT solves, and the direct
    structure has no iterative-convergence failure mode on stiff problems
    (an earlier dual-iteration variant needed ~40 triangular solves per
    problem and could stall below f32 tolerance). Handles redundant
    constraint rows (diagonal shift on the Schur complement, removed by the
    refinement) and PSD P.

    Regularization is two-level: ``delta`` (tiny, negligible bias) is tried
    first; float32 Gram accumulation can leave ~1e-4-scale indefiniteness on
    the normalized matrix, and only when that makes the small-delta Cholesky
    non-finite does the solve fall back to ``delta_fallback`` — so
    well-behaved problems keep full accuracy while noisy ones stay finite.
    ``iters`` caps the refinement sweeps (clamped to 8 — convergence is
    linear with a tiny contraction factor).

    With ``return_resid=True`` also returns ``max |An x - Bn|`` over the
    row-equilibrated constraint system — a scale-invariant convergence
    diagnostic in the spirit of OSQP's ``eps_abs`` termination check
    (reference qp/qplinear.py:21-27 polishes to eps_abs=1e-7); callers use
    it to escalate finite-but-unconverged solves to the float64 oracle.
    """
    dtype = P.dtype
    n = P.shape[0]
    m = A.shape[0]
    p_scale = jnp.trace(P) / n + jnp.asarray(1e-30, dtype)
    Pn = P / p_scale
    Pn = 0.5 * (Pn + Pn.T)
    row_norm = jnp.linalg.norm(A, axis=1, keepdims=True) + jnp.asarray(
        1e-30, dtype
    )
    An = A / row_norm
    Bn = B / row_norm
    rho = jnp.asarray(rho, dtype)
    # Range-space (Schur-complement) direct solve. The augmented matrix
    # keeps the rho*A^T A term: it bounds the condition number along the
    # constraint directions exactly as in the dual iteration, and the
    # minimizer of x^T P x s.t. Ax = b is unchanged by adding rho|Ax|^2.
    M = Pn + rho * jnp.matmul(An.T, An, precision="highest")
    eye = jnp.eye(n, dtype=dtype)
    # both regularization levels factorize in ONE batched Cholesky: the
    # fallback is computed anyway (no data-dependent control flow under
    # jit), and one kernel instance instead of two nearly halves the
    # Cholesky share of the program's backend compile time — a first-class
    # cost on remote-compile backends (each big executable is seconds to
    # build/load, and this solver is embedded in every fit program)
    shifts = jnp.stack(
        [jnp.asarray(delta, dtype), jnp.asarray(delta_fallback, dtype)]
    )
    blocked = n > _BLOCKED_N_THRESHOLD
    factor = (
        cholesky_blocked
        if blocked
        else (lambda x: jsl.cho_factor(x, lower=True)[0])
    )
    chols = jax.vmap(lambda s: factor(M + s * eye))(shifts)
    ok = jnp.isfinite(chols[0]).all()
    chol_l = jnp.where(ok, chols[0], chols[1])
    # Z = M^{-1} A^T via ONE multi-RHS triangular solve pair — on TPU the
    # sequential substitution cost amortizes over the m right-hand sides,
    # unlike a triangular solve per dual iteration (~1.4 ms each, measured
    # at batch 10 x n~800). The m x m Schur complement S = A M^{-1} A^T is
    # then factorized once and the exact constrained solution is
    #   x = Z lambda,  S lambda = b
    # with redundancy handled by a tiny diagonal shift on S; a short
    # constraint-residual refinement loop (GEMVs + m x m triangular solves)
    # removes both that shift's bias and f32 rounding. Direct solve, so no
    # dual-convergence failure mode on stiff problems.
    Z = (
        cho_solve_blocked(chol_l, An.T)
        if blocked
        else jsl.cho_solve((chol_l, True), An.T)
    )  # (n, m)
    S = jnp.matmul(An, Z, precision="highest")
    # f32 rounding through Z leaves S slightly asymmetric and, when sampled
    # constraint rows are near-dependent (rank-deficient row sets occur
    # routinely for frame-sampled orthogonality rows), indefinite by
    # O(eps * cond). Symmetrize and use a generous third-level shift — the
    # refinement loop removes the shift's bias on every consistent system,
    # so robustness here is free accuracy-wise.
    S = 0.5 * (S + S.T)
    eye_m = jnp.eye(m, dtype=dtype)
    s_scale = jnp.trace(S) / m + jnp.asarray(1e-30, dtype)
    # all three shift levels in one batched factorization (see above)
    s_shifts = s_scale * jnp.stack(
        [
            jnp.asarray(delta, dtype),
            jnp.asarray(delta_fallback, dtype),
            jnp.asarray(3e-2, dtype),
        ]
    )
    schols = jax.vmap(
        lambda s: jsl.cho_factor(S + s * eye_m, lower=True)[0]
    )(s_shifts)
    ok_small = jnp.isfinite(schols[0]).all()
    ok_mid = jnp.isfinite(schols[1]).all()
    l_sel = jnp.where(
        ok_small, schols[0], jnp.where(ok_mid, schols[1], schols[2])
    )
    chol_s = (l_sel, True)

    lam = jsl.cho_solve(chol_s, Bn)
    x = jnp.matmul(Z, lam, precision="highest")

    def body(_, x):
        r = Bn - jnp.matmul(An, x, precision="highest")
        dlam = jsl.cho_solve(chol_s, r)
        return x + jnp.matmul(Z, dlam, precision="highest")

    x = jax.lax.fori_loop(0, min(iters, 8), body, x)
    if return_resid:
        resid = jnp.max(
            jnp.abs(Bn - jnp.matmul(An, x, precision="highest"))
        )
        return x, resid
    return x


@partial(jax.jit, static_argnames=("refine_iters",))
def eqp_solve(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    refine_iters: int = 4,
) -> jax.Array:
    """Solve min x^T P x s.t. A x = b for every column b of B.

    Arguments:
    ---------
    P:
        (n, n) symmetric positive semidefinite cost matrix.
    A:
        (m, n) equality constraint matrix (may contain redundant rows).
    B:
        (m, k) stack of right-hand sides; column i yields solution column i.
    delta:
        Diagonal KKT regularization, applied after equilibration (P scaled to
        unit mean diagonal, constraint rows to unit norm) so it is invariant
        to the data scale.
    refine_iters:
        Refinement sweeps against the unregularized KKT operator. Each sweep
        contracts the regularization error by ~delta/lambda_min; empirically
        one sweep reaches float32 working precision even on stiff problems,
        so the default keeps a small safety margin.

    Returns:
    -------
    (n, k) array of primal solutions.
    """
    dtype = P.dtype
    n = P.shape[0]
    m = A.shape[0]
    # Equilibrate: scaling the objective does not move the minimizer, and
    # row-scaling consistent constraints does not change the feasible set, so
    # normalize both blocks to O(1) before forming the (regularized) KKT
    # system. Without this, data-scale imbalance (force Grams reach 1e9+)
    # makes the relative regularization swamp the constraint rows.
    p_scale = jnp.trace(P) / n + jnp.asarray(1e-30, dtype)
    Pn = P / p_scale
    row_norm = jnp.linalg.norm(A, axis=1, keepdims=True) + jnp.asarray(
        1e-30, dtype
    )
    An = A / row_norm
    Bn = B / row_norm
    dlt = jnp.asarray(delta, dtype)
    K_reg = _kkt(Pn, An, dlt, regularized=True)
    K_true = _kkt(Pn, An, dlt, regularized=False)
    lu, piv = jsl.lu_factor(K_reg)
    rhs = jnp.concatenate([jnp.zeros((n,) + B.shape[1:], dtype), Bn], axis=0)
    Z = jsl.lu_solve((lu, piv), rhs)

    def body(_, Z):
        resid = rhs - jnp.matmul(K_true, Z, precision="highest")
        return Z + jsl.lu_solve((lu, piv), resid)

    Z = jax.lax.fori_loop(0, refine_iters, body, Z)
    return Z[:n]


@partial(jax.jit, static_argnames=("refine_iters",))
def batched_eqp_solve(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    refine_iters: int = 4,
) -> jax.Array:
    """Batched :func:`eqp_solve` over a leading axis.

    P: (s, n, n); A: (s, m, n); B: (s, m, k) -> (s, n, k). All CG-site
    problems solve concurrently on device (batched LU on the MXU).
    """
    return jax.vmap(
        lambda p, a, b: eqp_solve(p, a, b, delta=delta, refine_iters=refine_iters)
    )(P, A, B)


@partial(jax.jit, static_argnames=("iters", "return_resid"))
def batched_eqp_solve_auglag(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    rho: float = 30.0,
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    """Batched :func:`eqp_solve_auglag` over a leading axis (production
    device solver: Cholesky-only, fast to compile and run; per-problem
    regularization selection).

    With ``return_resid=True`` returns ``(X, resids)`` where ``resids`` is
    the (batch,) vector of per-problem equilibrated constraint violations —
    cheap to fetch alongside the solutions, used by callers as the
    convergence check that triggers float64 escalation (per problem or via
    ``resids.max()``).
    """
    return jax.vmap(
        lambda p, a, b: eqp_solve_auglag(
            p, a, b, rho=rho, delta=delta,
            delta_fallback=delta_fallback, iters=iters,
            return_resid=return_resid,
        )
    )(P, A, B)


def eqp_solve_host(
    P: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    delta: float = 1e-12,
    refine_iters: int = 4,
    rcond: Optional[float] = None,
) -> np.ndarray:
    """Float64 host twin of :func:`eqp_solve` (LAPACK LU + refinement)."""
    import scipy.linalg as sl

    P = np.asarray(P, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    n = P.shape[0]
    m = A.shape[0]
    # equilibrate (see eqp_solve): objective scale and constraint row norms
    # are normalized to O(1) without moving the primal solution.
    p_scale = np.trace(P) / n + 1e-300
    Pn = P / p_scale
    row_norm = np.linalg.norm(A, axis=1, keepdims=True) + 1e-300
    An = A / row_norm
    Bn = B / row_norm
    K_reg = np.block(
        [
            [Pn + delta * np.eye(n), An.T],
            [An, -delta * np.eye(m)],
        ]
    )
    K_true = np.block([[Pn, An.T], [An, np.zeros((m, m))]])
    lu, piv = sl.lu_factor(K_reg)
    rhs = np.concatenate([np.zeros((n,) + B.shape[1:]), Bn], axis=0)
    Z = sl.lu_solve((lu, piv), rhs)
    for _ in range(refine_iters):
        Z = Z + sl.lu_solve((lu, piv), rhs - K_true @ Z)
    return Z[:n]
