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

  * :func:`eqp_solve_auglag` / :func:`batched_eqp_solve_auglag` — the
    production device solver: direct range-space (Schur-complement) solve
    with Cholesky factorizations only, lazy regularization fallbacks
    (``lax.cond`` — well-conditioned batches pay ONE factorization), and an
    early-exit refinement loop (``lax.while_loop`` on the measured
    constraint violation).
  * :func:`batched_eqp_solve_shared` — many fits sharing the same per-site
    cost matrices P: each P is factorized ONCE and reused across the whole
    fit batch (the shared-Gram bootstrap/batch path).
  * :func:`eqp_solve` / :func:`batched_eqp_solve` — LU-based KKT twins kept
    for CPU/GPU parity testing. On TPU they ROUTE to the auglag solver:
    XLA's TPU lowering of (batched) pivoted LU takes minutes to compile at
    production sizes, so the LU path must never reach a TPU executable.
  * :func:`eqp_solve_host` — float64 numpy/LAPACK oracle used for accuracy
    checks and as the escalation target of every production fit.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from .blocked_chol import (
    cho_solve_blocked,
    cholesky_blocked,
    cholesky_recursive,
    spd_inv_from_chol,
)

# Above this dimension the factorization/solve of the augmented operator
# switches to the blocked (fori_loop) kernels: XLA's unrolled lowering of
# cholesky/triangular_solve serializes to ~10 MB of device code at n~700,
# which a fresh process pays seconds to compile or load through the remote
# compile service. Small problems keep the unrolled path (faster, tiny).
# 256 is measured, not guessed: routing the production Schur systems
# (m ~ 200) through the blocked kernels instead made the solve SLOWER
# (whole shared solve 1.45 vs 1.14 ms/fit on v5e) and the serialized
# executable LARGER (7.18 vs 6.56 MB) — at one-to-two panels the blocked
# path's dynamic-slice loops cost more than the unrolled substitutions
# they replace. The crossover sits between 256 and the n~700 regime
# where unrolling serializes to ~10 MB of device code.
_BLOCKED_N_THRESHOLD = 256

# Refinement sweeps stop once the equilibrated constraint violation falls
# below this (comfortably below the 1e-4 escalation tolerance, at the f32
# noise floor). _DEFAULT_REFINE_SWEEPS is only the DEFAULT bound for the
# routing wrappers (eqp_solve / batched_eqp_solve): a caller-passed
# ``iters`` is honored exactly — the measured-convergence early exit means
# a large bound costs nothing on healthy systems, while a user raising it
# to fight conditioning genuinely gets more sweeps.
_REFINE_TOL = 5e-7
_DEFAULT_REFINE_SWEEPS = 8

# Above this augmented-operator dimension the shared-factor solver skips
# the explicit per-site inverse when the total right-hand-side work is
# small (f*m <= 2n): Z = M^{-1} A^T then comes from a blocked cho_solve
# against the factor — ~n^2*m FLOPs per site instead of the inverse
# route's ~2n^3 (blocked triangular inverse + the L^-T L^-1 GEMM). The
# explicit inverse exists to AMORTIZE across many fits sharing one
# factor (the 64-fit batch windows, where f*m >> n); the sweep-scale
# site-block fit calls the same solver with f=1, K~9000, m~1300, where
# the inverse is ~7x the FLOPs of the one solve it enables and its
# (s, n, n) buffer dominates transient HBM. Below this dimension the
# substitutions are latency-bound, not FLOP-bound, and the inverse route
# measures faster (see _BLOCKED_N_THRESHOLD); production featurized
# systems (n ~ 600-700) keep their committed executables bit-identical.
_DIRECT_Z_N_THRESHOLD = 4096


def _panel_width(n: int) -> int:
    """Blocked-kernel panel width, scaled to the problem.

    The panel loop's per-iteration overhead (dynamic slices + a small
    unrolled diagonal factor) is the latency floor of the blocked
    Cholesky; at solvated-feature scale wider panels win big — measured
    at (4, 9000, 9000) on v5e: nb=128 0.95 s, nb=256 0.60 s, nb=512
    0.44 s — while the production featurized systems (n ~ 600-700) keep
    the 128 panel that their committed executables were built with.
    """
    if n > 4096:
        return 512
    if n > 2048:
        return 256
    return 128


def _factor_spd(M: jax.Array) -> jax.Array:
    """Batched lower-Cholesky of (b, n, n) SPD matrices, compile-lean.

    Above _DIRECT_Z_N_THRESHOLD the recursive splitting kernel replaces
    the single panel loop: its trailing updates run at their own static
    sizes (minimal n^3/3 MACs vs the loop's n^3 full-width updates),
    which matters exactly where the factorization is FLOP-bound. Below,
    the loop (or the tiny unrolled factor) stays — the committed
    production executables are unchanged.
    """
    n = M.shape[-1]
    if n > _DIRECT_Z_N_THRESHOLD:
        nb = _panel_width(n)
        return jax.vmap(lambda x: cholesky_recursive(x, nb=nb))(M)
    if n > _BLOCKED_N_THRESHOLD:
        nb = _panel_width(n)
        return jax.vmap(lambda x: cholesky_blocked(x, nb=nb))(M)
    return jax.vmap(lambda x: jsl.cho_factor(x, lower=True)[0])(M)


def _solve_spd(chol: jax.Array, B: jax.Array) -> jax.Array:
    """Batched cho_solve for (b, n, n) factors and (b, n, k) right sides."""
    n = chol.shape[-1]
    if n > _BLOCKED_N_THRESHOLD:
        nb = _panel_width(n)
        return jax.vmap(lambda c, b: cho_solve_blocked(c, b, nb=nb))(chol, B)
    return jax.vmap(lambda c, b: jsl.cho_solve((c, True), b))(chol, B)


def _inv_spd(chol: jax.Array) -> jax.Array:
    """Batched explicit (L L^T)^{-1} from (b, n, n) Cholesky factors.

    Large factors take the GEMM-dominant blocked triangular inverse
    (``spd_inv_from_chol``); small ones solve against the identity with the
    (tiny, unrolled) cho_solve. Sequential depth is what matters on TPU —
    substitutions execute one row per step — so the blocked path's
    nb + k-GEMM depth replaces a 2n-row solve.
    """
    n = chol.shape[-1]
    if n > _BLOCKED_N_THRESHOLD:
        nb = _panel_width(n)
        return jax.vmap(lambda c: spd_inv_from_chol(c, nb=nb))(chol)
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=chol.dtype), chol.shape
    )
    return jax.vmap(lambda c, b: jsl.cho_solve((c, True), b))(chol, eye)


def _lazy_shift_factor(
    M: jax.Array, shifts, factor=_factor_spd
) -> jax.Array:
    """Factor (b, n, n) SPD matrices, escalating diagonal shifts lazily.

    Tries ``shifts[0]`` for the whole batch; only when some problem's
    factorization comes back non-finite does a ``lax.cond`` branch compute
    the next level and substitute it for exactly the failing problems. A
    well-conditioned batch therefore pays ONE factorization instead of one
    per shift level (the earlier always-compute-both design doubled the
    dominant Cholesky cost of every fit). ``shifts`` entries are (b,)- or
    scalar-shaped shift magnitudes.
    """
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)

    def shifted(s):
        s = jnp.asarray(s, M.dtype)
        s = jnp.broadcast_to(s, (M.shape[0],))
        return M + s[:, None, None] * eye

    chol = factor(shifted(shifts[0]))
    for level in shifts[1:]:
        bad = ~jnp.isfinite(chol).all(axis=(1, 2))  # (b,)

        def escalate(chol=chol, level=level, bad=bad):
            repl = factor(shifted(level))
            return jnp.where(bad[:, None, None], repl, chol)

        chol = jax.lax.cond(bad.any(), escalate, lambda chol=chol: chol)
    return chol


def _schur_tail(
    Z: jax.Array,  # (b, n, m) = M^{-1} A^T per problem
    An: jax.Array,  # (b, m, n) row-equilibrated constraints
    Bn: jax.Array,  # (b, m, k) equilibrated targets
    delta: float,
    delta_fallback: float,
    iters: int,
    refine_tol: float,
):
    """Range-space solve + early-exit refinement shared by all auglag paths.

    Given Z = M^{-1} A^T, lambda comes from the m x m Schur complement
    S = A M^{-1} A^T (factored with the same lazy shift escalation —
    redundant constraint rows occur routinely for frame-sampled
    orthogonality systems), x = Z lambda, then refinement sweeps on the
    constraint residual that stop as soon as the whole batch is below
    ``refine_tol`` (measured convergence replaces the old fixed sweep
    count — typically 1-2 sweeps).

    The factored S~ is applied through its EXPLICIT inverse (computed once
    per call): every subsequent application — the initial lambda and each
    refinement sweep — is then a batched MXU GEMM instead of two
    row-sequential triangular substitutions, which are latency-bound on
    TPU (~one row per cycle group; at m~200 x 3 applications that was the
    dominant sequential cost of the whole batched solve). The inverse is a
    FIXED approximation of S~^{-1} with O(kappa*eps) error, so the
    refinement iteration matrix is I - S X rather than the
    backward-stable-solve version; the measured-convergence exit plus the
    per-problem residual diagnostic (escalation to the float64 oracle)
    bound the damage exactly as for the explicit per-site M^{-1} already
    used by the shared-factor path. Returns (x, per-problem max
    |An x - Bn|).
    """
    dtype = An.dtype
    m = An.shape[1]
    S = jnp.matmul(An, Z, precision="highest")
    # f32 rounding through Z leaves S slightly asymmetric and, for
    # near-dependent sampled rows, indefinite by O(eps * cond): symmetrize
    # and escalate the diagonal shift only as far as each problem needs —
    # the refinement loop removes the shift's bias on consistent systems.
    S = 0.5 * (S + jnp.swapaxes(S, 1, 2))
    s_scale = (
        jnp.trace(S, axis1=1, axis2=2) / m + jnp.asarray(1e-30, dtype)
    )  # (b,)
    factor = (
        _factor_spd
        if m > _BLOCKED_N_THRESHOLD
        else jax.vmap(lambda x: jsl.cho_factor(x, lower=True)[0])
    )
    chol_s = _lazy_shift_factor(
        S,
        [s_scale * delta, s_scale * delta_fallback, s_scale * 3e-2],
        factor=factor,
    )
    sinv = _inv_spd(chol_s)  # (b, m, m), one substitution for all sweeps

    def solve_s(r):
        return jnp.matmul(sinv, r, precision="highest")

    lam = solve_s(Bn)
    x = jnp.matmul(Z, lam, precision="highest")
    resid = Bn - jnp.matmul(An, x, precision="highest")

    max_sweeps = max(0, iters)

    def _done_mask(r):
        # per-problem convergence, NaN-aware BOTH ways: a problem whose
        # residual has gone non-finite counts as done (further sweeps
        # cannot rescue it — escalation owns it), and it must not stall
        # OR prolong refinement for healthy batch-mates. A batch-global
        # `max(|r|) > tol` predicate is False when any entry is NaN,
        # which would halt refinement for the whole batch.
        finite = jnp.isfinite(r).all(axis=(1, 2))  # (b,)
        small = jnp.max(jnp.abs(r), axis=(1, 2)) <= refine_tol
        return small | ~finite

    def cond(carry):
        _, r, i = carry
        return (i < max_sweeps) & ~_done_mask(r).all()

    def body(carry):
        x, r, i = carry
        # per-problem masking: a converged (or non-finite) problem receives
        # NO further updates even while its batch neighbors keep refining.
        # This makes each problem's solution independent of batch
        # composition (a single fit and the same fit inside a batch window
        # run the same update sequence — the batch-vs-single parity tests
        # rely on it), and matters numerically because post-convergence
        # sweeps move the solution within the weakly-determined subspace
        # by O(resid/s_min).
        done = _done_mask(r)  # (b,)
        dlam = solve_s(r)
        step = jnp.matmul(Z, dlam, precision="highest")
        x = jnp.where(done[:, None, None], x, x + step)
        r_new = Bn - jnp.matmul(An, x, precision="highest")
        r = jnp.where(done[:, None, None], r, r_new)
        return x, r, i + 1

    x, resid, _ = jax.lax.while_loop(cond, body, (x, resid, 0))
    per_problem = jnp.max(jnp.abs(resid), axis=(1, 2))
    return x, per_problem


def _equilibrate(P, A, B):
    """Batched normalization: unit-mean-trace P, unit-norm constraint rows.

    Scaling the objective does not move the minimizer and row-scaling
    consistent constraints does not change the feasible set; without this,
    data-scale imbalance (force Grams reach 1e9+) makes the relative
    regularization swamp the constraint rows.
    """
    dtype = P.dtype
    n = P.shape[-1]
    p_scale = (
        jnp.trace(P, axis1=1, axis2=2) / n + jnp.asarray(1e-30, dtype)
    )
    Pn = P / p_scale[:, None, None]
    Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 1, 2))
    row_norm = jnp.linalg.norm(A, axis=2, keepdims=True) + jnp.asarray(
        1e-30, dtype
    )
    return Pn, A / row_norm, B / row_norm


@partial(jax.jit, static_argnames=("iters", "return_resid"))
def batched_eqp_solve_auglag(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    rho: float = 0.0,
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    r"""Batched direct range-space equality-QP solve (Cholesky only).

    Solves min x^T P x s.t. A x = b per batch entry through the augmented
    operator M = P + rho A^T A + delta I (same minimizer; rho bounds the
    condition number along constraint directions). P: (s, n, n); A:
    (s, m, n); B: (s, m, k) -> (s, n, k). The batch is native — lazy
    regularization fallbacks branch on scalar batch-wide predicates, so a
    well-conditioned batch pays exactly one big factorization per problem
    (a vmapped per-problem ``cond`` would degenerate to computing every
    level; reference-accuracy analogue: OSQP eps_abs=1e-7 + polish,
    reference qp/qplinear.py:21-27).

    With ``return_resid=True`` also returns the (s,) per-problem max
    equilibrated constraint violation ``max |An x - Bn|`` — the convergence
    diagnostic callers use to escalate finite-but-unconverged solves to the
    float64 oracle.
    """
    dtype = P.dtype
    Pn, An, Bn = _equilibrate(P, A, B)
    rho = jnp.asarray(rho, dtype)
    # The rho*A^T A term keeps M well-conditioned along constraint
    # directions even when P is (near-)singular there; the minimizer of
    # x^T P x s.t. Ax = b is unchanged by adding rho|Ax|^2.
    M = Pn + rho * jnp.matmul(
        jnp.swapaxes(An, 1, 2), An, precision="highest"
    )
    chol_m = _lazy_shift_factor(M, [delta, delta_fallback])
    Z = _solve_spd(chol_m, jnp.swapaxes(An, 1, 2))  # (b, n, m)
    x, resid = _schur_tail(
        Z, An, Bn, delta, delta_fallback, iters, _REFINE_TOL
    )
    if return_resid:
        return x, resid
    return x


@partial(jax.jit, static_argnames=("iters", "return_resid"))
def eqp_solve_auglag(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    rho: float = 0.0,
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    """Single-problem :func:`batched_eqp_solve_auglag` (batch of one).

    With ``return_resid=True`` the residual is a scalar.
    """
    out = batched_eqp_solve_auglag(
        P[None], A[None], B[None],
        rho=rho, delta=delta, delta_fallback=delta_fallback, iters=iters,
        return_resid=return_resid,
    )
    if return_resid:
        x, resid = out
        return x[0], resid[0]
    return out[0]


@partial(jax.jit, static_argnames=("iters", "return_resid"))
def batched_eqp_solve_shared(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    r"""Many equality-QP fits sharing per-site cost matrices P.

    P: (s, n, n); A: (f, s, m, n); B: (f, s, m, k) -> (f, s, n, k): fit f of
    site s solves min x^T P_s x s.t. A[f,s] x = B[f,s]. The shared-Gram
    batch fit (:func:`aggforce_tpu.qp.fusedfeat.fused_gb_linear_map_batch`)
    is exactly this shape — the Gram depends only on the trajectory while
    the sampled orthogonality constraints differ per fit — so each site's
    augmented operator M_s = P_s + delta I is factorized ONCE and reused by
    every fit: f x s problems cost s big Cholesky factorizations instead of
    f x s (and instead of 2 f s under the old always-compute-fallback
    scheme). Because M cannot include the per-fit rho A^T A term, this is
    the classic range-space Schur method; P must be positive definite
    (feature Grams with l2 regularization are), and the per-problem
    residual diagnostic catches any conditioning failure for float64
    escalation exactly as in the per-problem solver.

    With ``return_resid=True`` also returns the (f, s) residual matrix.
    """
    # one explicit inverse per site (GEMM-dominant blocked triangular
    # inverse, shared by the whole window) and every problem's
    # Z = M^{-1} A^T as a batched MXU GEMM — versus f x s triangular
    # substitutions of m RHS each. Measured against the float64 oracle on
    # the production featurized system, the explicit-inverse Z is
    # numerically indistinguishable from the triangular-solve Z (the
    # classic inverse-instability concern applies to ITERATING with an
    # inverse; here it is applied once and the Schur refinement works
    # against the exact An), and the residual diagnostic still guards
    # escalation. The route is a SHAPE-ONLY choice (static at trace time),
    # so a problem's numerics stay independent of window composition
    # within each regime: production systems (n ~ 600-700) always take
    # the inverse route (single fit == fit inside any batch, which the
    # batch-vs-single parity tests pin), while sweep-scale systems
    # (n > _DIRECT_Z_N_THRESHOLD) with few total RHS take the solve-based
    # Z, where the inverse would cost ~7x the FLOPs of the one
    # application it enables.
    f, m, n = A.shape[0], A.shape[2], A.shape[3]
    if n > _DIRECT_Z_N_THRESHOLD and f * m <= 2 * n:
        # solve-based Z: factor once per site, skip the explicit inverse
        chol = _site_factor_chol(P, delta, delta_fallback)
        x, resid = _shared_schur_stage(
            chol, A, B, delta, delta_fallback, iters, op_is_factor=True
        )
    else:
        minv = _site_factor_inv(P, delta, delta_fallback)
        x, resid = _shared_schur_stage(
            minv, A, B, delta, delta_fallback, iters
        )
    if return_resid:
        return x, resid
    return x


def _shared_schur_stage(
    op: jax.Array,  # (s, n, n) per-site inverses OR Cholesky factors
    A: jax.Array,  # (f, s, m, n)
    B: jax.Array,  # (f, s, m, k)
    delta: float,
    delta_fallback: float,
    iters: int,
    op_is_factor: bool = False,
):
    """Per-fit stage of the shared-factor solve: equilibrate, Z, Schur tail.

    Factored out of :func:`batched_eqp_solve_shared` so the mesh variant
    can run it on a fit-shard with the (all-gathered) site inverses. Each
    problem's arithmetic is independent of the batch composition, so the
    sharded and replicated runs agree per problem.

    ``op_is_factor=True`` means ``op`` holds the per-site Cholesky factors
    and Z comes from a (blocked) cho_solve instead of an inverse GEMM —
    the large-n / few-RHS route (see ``_DIRECT_Z_N_THRESHOLD``).
    """
    f, s = A.shape[0], A.shape[1]
    m, n = A.shape[2], A.shape[3]
    dtype = A.dtype
    row_norm = jnp.linalg.norm(A, axis=3, keepdims=True) + jnp.asarray(
        1e-30, dtype
    )
    An = (A / row_norm).reshape(f * s, m, n)
    Bn = (B / row_norm).reshape(f * s, B.shape[2], B.shape[3])
    op_b = jnp.broadcast_to(op[None], (f,) + op.shape).reshape(
        f * s, n, n
    )
    if op_is_factor:
        Z = _solve_spd(op_b, jnp.swapaxes(An, 1, 2))
    else:
        Z = jnp.matmul(op_b, jnp.swapaxes(An, 1, 2), precision="highest")
    x, resid = _schur_tail(
        Z, An, Bn, delta, delta_fallback, iters, _REFINE_TOL
    )
    return x.reshape(f, s, n, -1), resid.reshape(f, s)


def _site_factor_chol(P: jax.Array, delta, delta_fallback) -> jax.Array:
    """Equilibrate + lazily-shifted Cholesky per site (no inverse)."""
    n = P.shape[-1]
    dtype = P.dtype
    p_scale = (
        jnp.trace(P, axis1=1, axis2=2) / n + jnp.asarray(1e-30, dtype)
    )
    Pn = P / p_scale[:, None, None]
    Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 1, 2))
    return _lazy_shift_factor(Pn, [delta, delta_fallback])


def _site_factor_inv(P: jax.Array, delta, delta_fallback) -> jax.Array:
    """Equilibrate + lazily-shifted Cholesky + explicit inverse per site."""
    return _inv_spd(_site_factor_chol(P, delta, delta_fallback))


@partial(
    jax.jit, static_argnames=("iters", "return_resid", "mesh", "axis")
)
def batched_eqp_solve_shared_mesh(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    mesh,
    axis: str = "frames",
    delta: float = 1e-6,
    delta_fallback: float = 3e-4,
    iters: int = 10,
    return_resid: bool = False,
):
    r"""Mesh-sharded :func:`batched_eqp_solve_shared`: the solve SCALES.

    Two axes of parallelism ride the same 1-D mesh axis inside one
    shard_map (SURVEY.md's "shard the cg-site axis for the per-site QPs"):

      * the per-site factorization + explicit inverse — the window's fixed
        cost — is sharded over SITES (padded to a device multiple with
        identity problems) and an ``all_gather`` over the ICI replicates
        the small (s, n, n) inverses to every device;
      * the per-fit Schur stage — the dominant recurring cost — is
        sharded over FITS: each device solves only its f/n_dev fits'
        s problems.

    Per-problem arithmetic is batch-composition independent (masked
    refinement, per-problem shifts), so results match the replicated
    solver per fit. Fit and site counts not divisible by the mesh size
    are padded (repeated fits / identity sites) and the padding dropped
    on exit.
    """
    n_dev = int(mesh.devices.size)
    from jax.sharding import PartitionSpec as Pspec

    f, s = A.shape[0], A.shape[1]
    n = P.shape[-1]
    dtype = P.dtype
    pad_f = (-f) % n_dev
    pad_s = (-s) % n_dev
    if pad_f:
        A = jnp.concatenate([A, jnp.repeat(A[-1:], pad_f, axis=0)], axis=0)
        B = jnp.concatenate([B, jnp.repeat(B[-1:], pad_f, axis=0)], axis=0)
    if pad_s:
        eye_pad = jnp.broadcast_to(
            jnp.eye(n, dtype=dtype), (pad_s, n, n)
        )
        P_pad = jnp.concatenate([P, eye_pad], axis=0)
    else:
        P_pad = P

    def local(P_loc, A_loc, B_loc):
        minv_loc = _site_factor_inv(P_loc, delta, delta_fallback)
        minv = jax.lax.all_gather(
            minv_loc, axis, axis=0, tiled=True
        )[:s]
        return _shared_schur_stage(
            minv, A_loc, B_loc, delta, delta_fallback, iters
        )

    x, resid = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(Pspec(axis), Pspec(axis), Pspec(axis)),
        out_specs=(Pspec(axis), Pspec(axis)),
    )(P_pad, A, B)
    x = x[:f]
    resid = resid[:f]
    if return_resid:
        return x, resid
    return x


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # no backend initialized/available
        return False


@partial(jax.jit, static_argnames=("refine_iters",))
def _eqp_solve_lu(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    refine_iters: int = 4,
) -> jax.Array:
    """LU KKT solve with refinement (CPU/GPU twin of the host oracle)."""
    dtype = P.dtype
    n = P.shape[0]
    m = A.shape[0]
    p_scale = jnp.trace(P) / n + jnp.asarray(1e-30, dtype)
    Pn = P / p_scale
    row_norm = jnp.linalg.norm(A, axis=1, keepdims=True) + jnp.asarray(
        1e-30, dtype
    )
    An = A / row_norm
    Bn = B / row_norm
    dlt = jnp.asarray(delta, dtype)
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    top_reg = jnp.concatenate([Pn + dlt * eye_n, An.T], axis=1)
    bot_reg = jnp.concatenate([An, -dlt * eye_m], axis=1)
    K_reg = jnp.concatenate([top_reg, bot_reg], axis=0)
    top = jnp.concatenate([Pn, An.T], axis=1)
    bot = jnp.concatenate([An, jnp.zeros((m, m), dtype=dtype)], axis=1)
    K_true = jnp.concatenate([top, bot], axis=0)
    lu, piv = jsl.lu_factor(K_reg)
    rhs = jnp.concatenate([jnp.zeros((n,) + B.shape[1:], dtype), Bn], axis=0)
    Z = jsl.lu_solve((lu, piv), rhs)

    def body(_, Z):
        resid = rhs - jnp.matmul(K_true, Z, precision="highest")
        return Z + jsl.lu_solve((lu, piv), resid)

    Z = jax.lax.fori_loop(0, refine_iters, body, Z)
    return Z[:n]


def eqp_solve(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    refine_iters: int = 4,
) -> jax.Array:
    """Solve min x^T P x s.t. A x = b for every column b of B.

    On CPU/GPU this is a regularized-LU KKT solve with iterative refinement
    against the unregularized operator. On TPU it ROUTES to
    :func:`eqp_solve_auglag`: XLA's TPU lowering of pivoted LU is a compile
    trap at production sizes (minutes for the vmapped case — see
    CLAUDE.md), and the Cholesky range-space solver reaches the same
    accuracy class.
    """
    if _on_tpu():
        return eqp_solve_auglag(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(B),
            delta=delta, iters=_DEFAULT_REFINE_SWEEPS,
        )
    return _eqp_solve_lu(
        jnp.asarray(P), jnp.asarray(A), jnp.asarray(B),
        delta=delta, refine_iters=refine_iters,
    )


def batched_eqp_solve(
    P: jax.Array,
    A: jax.Array,
    B: jax.Array,
    delta: float = 1e-6,
    refine_iters: int = 4,
) -> jax.Array:
    """Batched :func:`eqp_solve` over a leading axis.

    P: (s, n, n); A: (s, m, n); B: (s, m, k) -> (s, n, k). On TPU this
    routes to :func:`batched_eqp_solve_auglag` — vmapped pivoted LU takes
    >10 minutes to COMPILE on the TPU toolchain, so the LU path is
    CPU/GPU-only.
    """
    if _on_tpu():
        return batched_eqp_solve_auglag(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(B),
            delta=delta, iters=_DEFAULT_REFINE_SWEEPS,
        )
    return jax.vmap(
        lambda p, a, b: _eqp_solve_lu(
            p, a, b, delta=delta, refine_iters=refine_iters
        )
    )(jnp.asarray(P), jnp.asarray(A), jnp.asarray(B))


def eqp_solve_host(
    P: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    delta: float = 1e-12,
    refine_iters: int = 4,
    rcond: Optional[float] = None,
) -> np.ndarray:
    """Float64 host oracle (LAPACK LU + refinement)."""
    import scipy.linalg as sl

    P = np.asarray(P, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    n = P.shape[0]
    m = A.shape[0]
    # equilibrate (see _equilibrate): objective scale and constraint row
    # norms are normalized to O(1) without moving the primal solution.
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
