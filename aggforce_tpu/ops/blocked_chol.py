"""Compile-lean blocked Cholesky and triangular solves.

Original TPU-side architecture with no reference counterpart: the
reference delegates all linear algebra to scipy/OSQP on host
(``/root/reference/src/aggforce/qp/qplinear.py:79-86``).

XLA's TPU lowering of ``cholesky``/``triangular_solve`` unrolls the
sequential substitution into straight-line code that grows with the matrix
dimension: at n~700 a single batched multi-RHS ``cho_solve`` serializes to
~9 MB (~50 MB of device code) and a ``cho_factor`` to ~1.5 MB. On a
remote-attached device every fresh process pays seconds per megabyte to
compile OR load that executable through the tunnel — the dominant cold-start
cost of every fit program, since the equality-QP solver embeds both ops.

These implementations restructure the factorization/solves as
``lax.fori_loop`` over fixed-size block panels: the only unrolled pieces are
one (nb, nb) Cholesky and one (nb, nb) triangular solve compiled ONCE as the
loop body; everything else is MXU GEMMs. Numerics are the standard
right-looking blocked algorithm — bitwise different from LAPACK's ordering
but the same O(eps * cond) error class, and the QP solver's residual
refinement absorbs the difference.

Inputs whose dimension is not a multiple of ``nb`` are padded with an
identity diagonal (factor of ``[[M, 0], [0, I]]`` is ``[[L, 0], [0, I]]``,
so the top block is exact). All entries are jittable and vmap-compatible
(batched GEMMs stay batched).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# GEMM precision for every panel/trailing update in this module. TPU f32
# matmuls decompose into bf16 passes: "highest" = 6 passes (beyond-f32
# cross terms), "high" = 3 (~f32-equivalent: relative error ~2e-6, same
# order as f32 arithmetic eps), "default" = 1 (bf16 mantissa, ~4e-3). The
# blocked kernels' GEMMs carry the bulk of the solve FLOPs at sweep scale,
# so this is a direct throughput lever. Measured at the sweep geometry
# (Sb=6, n=9000, nb=512, tools/profile_sweepsolve.py, one v5e window):
# direct-Z route (factor + Z/Schur/refine tail) 0.427 s/block at
# "highest", 0.335 at "high", 0.306 at "default"; post-refinement
# constraint residuals 8.6e-08 / 7.5e-09 / 2.6e-08 — the Schur tail's
# iterative refinement absorbs the coarser GEMMs. Default is "high":
# free 21% over "highest" with f32-class trailing updates; "default"'s
# extra 7% rides on 8-bit-mantissa updates of S = A22 - L21 L21^T, which
# can cost positive definiteness on ill-conditioned real Grams (the lazy
# shift then swaps in delta_fallback — a different, worse-regularized
# problem). AGGFORCE_BLOCKED_PRECISION overrides (read at import; set it
# before importing aggforce_tpu).
_GEMM_PRECISION = os.environ.get("AGGFORCE_BLOCKED_PRECISION", "high")

# tri_solve_blocked panel scheme: "1" batch-inverts the diagonal panels
# once and substitutes with GEMMs (trsm-via-inverted-diagonal-blocks);
# "0" (default) keeps one exact nb-row-sequential triangular_solve per
# panel. Measured at the sweep geometry (Sb=6, n=9000, nb=512,
# tools/profile_sweepsolve.py, matched v5e windows): the dinv scheme is
# ~7% SLOWER (factor 0.205->0.216 s, Z-solve 0.126->0.138 s) — the
# per-panel solves batched over sites are already latency-cheap, and the
# extra batched inversion + per-panel dinv slicing outweigh them. Kept as
# a knob for hardware where trsm serialization dominates.
_TRISOLVE_DINV = os.environ.get("AGGFORCE_TRISOLVE_DINV", "0") == "1"

__all__ = [
    "cholesky_blocked",
    "cholesky_recursive",
    "cho_solve_blocked",
    "tri_solve_blocked",
    "tri_inv_blocked",
    "spd_inv_from_chol",
]

_DEFAULT_BLOCK = 128  # MXU-native tile


def _pad_spd(M: jax.Array, nb: int):
    """Pad an SPD matrix to a multiple of nb with an identity diagonal."""
    n = M.shape[-1]
    n_pad = -(-n // nb) * nb
    if n_pad == n:
        return M, n
    pad = n_pad - n
    M_p = jnp.pad(M, ((0, pad), (0, pad)))
    idx = jnp.arange(n_pad)
    diag_pad = jnp.where(idx >= n, 1.0, 0.0).astype(M.dtype)
    return M_p + jnp.diag(diag_pad), n


@partial(jax.jit, static_argnames=("nb",))
def cholesky_blocked(M: jax.Array, nb: int = _DEFAULT_BLOCK) -> jax.Array:
    """Lower-triangular L with L L^T = M, via nb-wide block panels.

    Matches ``jax.scipy.linalg.cho_factor(M, lower=True)[0]`` semantics on
    the lower triangle (the strict upper triangle is zeroed, unlike
    LAPACK's garbage-filled upper storage). Non-finite inputs propagate to
    non-finite outputs exactly like the LAPACK path, so callers' finiteness
    fallbacks keep working.
    """
    M_p, n = _pad_spd(M, nb)
    n_pad = M_p.shape[-1]
    k = n_pad // nb
    rows = jnp.arange(n_pad)

    def body(j, carry):
        A, L = carry
        c0 = j * nb
        D = lax.dynamic_slice(A, (c0, c0), (nb, nb))
        Ljj = jnp.linalg.cholesky(D)
        # full-height column panel solved against Ljj^T from the right
        C = lax.dynamic_slice(A, (0, c0), (n_pad, nb))
        X = lax.linalg.triangular_solve(
            Ljj, C, left_side=False, lower=True, transpose_a=True
        )
        below = (rows >= c0 + nb)[:, None]
        panel = jnp.where(below, X, 0.0)  # strictly-subdiagonal part
        in_diag = ((rows >= c0) & (rows < c0 + nb))[:, None]
        Ljj_tall = jnp.where(
            in_diag,
            lax.dynamic_update_slice(
                jnp.zeros((n_pad, nb), dtype=A.dtype), Ljj, (c0, 0)
            ),
            0.0,
        )
        L = lax.dynamic_update_slice(L, panel + Ljj_tall, (0, c0))
        # trailing update touches only rows/cols >= c0+nb (panel is zero
        # elsewhere), so a full GEMM is safe and keeps one fused kernel
        A = A - jnp.matmul(panel, panel.T, precision=_GEMM_PRECISION)
        return A, L

    L0 = jnp.zeros_like(M_p)
    _, L = lax.fori_loop(0, k, body, (M_p, L0))
    return L[:n, :n]


def cholesky_recursive(
    M: jax.Array, nb: int = _DEFAULT_BLOCK, leaf: int = 2304
) -> jax.Array:
    """Minimal-FLOP blocked Cholesky via recursive 2x2 splitting.

    :func:`cholesky_blocked`'s right-looking panel loop applies every
    trailing update at FULL width (static shapes inside ``fori_loop``), so
    it executes ~n^3 MACs where the factorization needs n^3/3 — a 3x FLOP
    tax that dominates at sweep scale (n ~ 9000: the site factorization is
    the largest stage of the direct-Z shared solve). Splitting

        [[A11,    ],     [[L11,    ],
         [A21, A22]]  ->  [L21, L22]]

    at a Python-level (static) panel boundary lets each trailing update
    run at its own static size: L11 = chol(A11) (recurse), L21 from one
    forward block substitution (:func:`tri_solve_blocked` against A21^T),
    S = A22 - L21 L21^T (GEMM at the sub-block's exact size), L22 =
    chol(S) (recurse). Total work is the minimal n^3/3 MACs; sequential
    substitution depth is unchanged (same (nb, nb) panel solves, now at
    the leaves). Each distinct sub-size traces once — depth is
    log2(n/leaf), so a 9216-pad factor adds ~3 GEMM/solve shapes.

    Numerics: same error class as the panel loop (identical leaf
    arithmetic, GEMM updates at precision=_GEMM_PRECISION); non-finite inputs
    propagate. ``leaf`` keeps small problems on the single-loop kernel
    where recursion overhead (transposes, concats) would dominate.
    """
    if M.ndim != 2:
        # tri_solve_blocked is strictly 2-D (its row/pad axes are
        # positional); batch with an outer vmap, like _factor_spd does
        raise ValueError(
            f"cholesky_recursive takes a single (n, n) matrix, got shape "
            f"{M.shape}; vmap it for batches"
        )
    n = M.shape[-1]
    h = ((n // 2 + nb - 1) // nb) * nb  # split at a panel boundary
    if n <= leaf or h >= n:
        return cholesky_blocked(M, nb=nb)
    A11 = M[:h, :h]
    A21 = M[h:, :h]
    A22 = M[h:, h:]
    L11 = cholesky_recursive(A11, nb=nb, leaf=leaf)
    # L21 L11^T = A21  <=>  L11 Y = A21^T with L21 = Y^T
    Y = tri_solve_blocked(L11, A21.T, nb=nb)
    L21 = Y.T
    S = A22 - jnp.matmul(L21, L21.T, precision=_GEMM_PRECISION)
    L22 = cholesky_recursive(S, nb=nb, leaf=leaf)
    top = jnp.concatenate(
        [L11, jnp.zeros((h, n - h), dtype=M.dtype)], axis=-1
    )
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.jit, static_argnames=("nb", "transpose_a"))
def tri_solve_blocked(
    L: jax.Array,
    B: jax.Array,
    nb: int = _DEFAULT_BLOCK,
    transpose_a: bool = False,
) -> jax.Array:
    """Solve L Y = B (or L^T Y = B with ``transpose_a``) by block panels.

    One half of :func:`cho_solve_blocked`, exposed on its own because the
    recursive Cholesky's off-diagonal panel (L21 = A21 L11^-T) is exactly
    one forward substitution against a transposed right-hand side.

    Unlike the factorization's panel loop (whose diagonal factors only
    exist as the loop runs), here L is fully known up front — so the k
    diagonal (nb, nb) panels are inverted in ONE batched
    ``triangular_solve`` (nb sequential row-steps total, the same move as
    :func:`tri_inv_blocked`), and every panel step of the substitution
    becomes a GEMM ``Dinv_j @ R_j`` instead of another nb-row-sequential
    solve. This is the standard trsm-via-inverted-diagonal-blocks scheme;
    per-panel error grows from O(eps) to O(eps * cond(L_jj)), the same
    class the callers' residual-refinement loops already absorb (the
    equilibrated QP factors keep cond(L_jj) small). Measured SLOWER than
    the exact per-panel solves at the sweep geometry (see module header),
    so AGGFORCE_TRISOLVE_DINV defaults off.
    """
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    # identity-diagonal padding works for triangular L exactly as for SPD M:
    # [[L, 0], [0, I]] keeps the top-block solves exact
    L, n = _pad_spd(L, nb)
    n_pad = L.shape[-1]
    if B.shape[0] != n_pad:
        B = jnp.pad(B, ((0, n_pad - B.shape[0]), (0, 0)))
    k = n_pad // nb
    rows = jnp.arange(n_pad)

    if _TRISOLVE_DINV:
        # (k, nb, nb) diagonal panels -> one batched inversion
        blocks = L.reshape(k, nb, k, nb)
        diag = jnp.moveaxis(jnp.diagonal(blocks, axis1=0, axis2=2), -1, 0)
        eye = jnp.broadcast_to(jnp.eye(nb, dtype=L.dtype), (k, nb, nb))
        dinv = lax.linalg.triangular_solve(
            diag, eye, left_side=True, lower=True
        )
    else:
        dinv = None

    def _panel_solve(j, Rj, transpose):
        if dinv is None:
            Ljj = lax.dynamic_slice(L, (j * nb, j * nb), (nb, nb))
            return lax.linalg.triangular_solve(
                Ljj, Rj, left_side=True, lower=True, transpose_a=transpose
            )
        Di = lax.dynamic_slice(dinv, (j, 0, 0), (1, nb, nb))[0]
        Di = Di.T if transpose else Di
        return jnp.matmul(Di, Rj, precision=_GEMM_PRECISION)

    def fwd(j, carry):
        R, Y = carry  # R: running right-hand side, Y: solution of L Y = B
        c0 = j * nb
        Rj = lax.dynamic_slice(R, (c0, 0), (nb, R.shape[1]))
        Yj = _panel_solve(j, Rj, transpose=False)
        Y = lax.dynamic_update_slice(Y, Yj, (c0, 0))
        # subtract this panel's contribution from the remaining rows
        col = lax.dynamic_slice(L, (0, c0), (n_pad, nb))
        col = jnp.where((rows >= c0 + nb)[:, None], col, 0.0)
        R = R - jnp.matmul(col, Yj, precision=_GEMM_PRECISION)
        return R, Y

    def bwd(i, carry):
        # solving L^T X = Y, blocks bottom-up; after computing X_j, rows
        # ABOVE c0 subtract (L^T)[0:c0, c0:c0+nb] @ X_j
        # = L[c0:c0+nb, 0:c0]^T @ X_j
        R, X = carry
        j = k - 1 - i
        c0 = j * nb
        Rj = lax.dynamic_slice(R, (c0, 0), (nb, R.shape[1]))
        Xj = _panel_solve(j, Rj, transpose=True)
        X = lax.dynamic_update_slice(X, Xj, (c0, 0))
        row = lax.dynamic_slice(L, (c0, 0), (nb, n_pad))  # L[c0:c0+nb, :]
        row = jnp.where((rows < c0)[None, :], row, 0.0)
        R = R - jnp.matmul(row.T, Xj, precision=_GEMM_PRECISION)
        return R, X

    body = bwd if transpose_a else fwd
    _, Y = lax.fori_loop(0, k, body, (B, jnp.zeros_like(B)))
    Y = Y[:n]
    return Y[:, 0] if squeeze else Y


@partial(jax.jit, static_argnames=("nb",))
def cho_solve_blocked(
    L: jax.Array, B: jax.Array, nb: int = _DEFAULT_BLOCK
) -> jax.Array:
    """Solve (L L^T) X = B given lower-triangular L, by block substitution.

    Equivalent of ``jax.scipy.linalg.cho_solve((L, True), B)``; B is
    (n, n_rhs). Forward then backward substitution
    (:func:`tri_solve_blocked` twice), one (nb, nb) triangular solve
    instance each, panel updates as GEMMs.
    """
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    Y = tri_solve_blocked(L, B, nb=nb, transpose_a=False)
    X = tri_solve_blocked(L, Y, nb=nb, transpose_a=True)
    return X[:, 0] if squeeze else X


@partial(jax.jit, static_argnames=("nb",))
def tri_inv_blocked(L: jax.Array, nb: int = _DEFAULT_BLOCK) -> jax.Array:
    """Inverse of a lower-triangular L with GEMM-dominant latency.

    The naive route — ``triangular_solve(L, I)`` — is row-sequential over
    ALL n rows (TPU substitutions execute one row per step; at n~640 with a
    panel-blocked solve that is ~2n sequential steps). Here only the k
    DIAGONAL nb-blocks are inverted by substitution, and crucially all k of
    them in ONE batched ``triangular_solve`` (nb sequential steps total,
    not k*nb); the off-diagonal blocks follow by k-1 block-row GEMM
    substitution sweeps:

        X[i, :i] = -Dinv_i @ (L[i, :i] @ X[:i, :i])

    Sequential depth ~ nb + k GEMMs instead of ~2n row steps — the
    latency-bound piece of the shared-factor QP solver's explicit-inverse
    construction. Identity-diagonal padding keeps non-multiple dimensions
    exact (the padded block's inverse is I and decouples).
    """
    L_p, n = _pad_spd(L, nb)
    n_pad = L_p.shape[-1]
    k = n_pad // nb
    # (k, nb, nb) diagonal blocks: reshape to (k, nb, k, nb) and take the
    # block diagonal
    blocks = L_p.reshape(k, nb, k, nb)
    diag = jnp.moveaxis(jnp.diagonal(blocks, axis1=0, axis2=2), -1, 0)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=L.dtype), (k, nb, nb))
    dinv = lax.linalg.triangular_solve(
        diag, eye, left_side=True, lower=True
    )  # (k, nb, nb), ONE batched substitution
    # X starts as the block-diagonal inverse; block-row i then overwrites
    # its strictly-left blocks using rows < i of X (already final)
    X0 = jnp.zeros_like(L_p)

    def place(i, X):
        return lax.dynamic_update_slice(X, dinv[i], (i * nb, i * nb))

    X0 = lax.fori_loop(0, k, place, X0)
    cols = jnp.arange(n_pad)

    def body(i, X):
        c0 = i * nb
        Lrow = lax.dynamic_slice(L_p, (c0, 0), (nb, n_pad))
        Lrow = jnp.where((cols < c0)[None, :], Lrow, 0.0)
        prod = jnp.matmul(Lrow, X, precision=_GEMM_PRECISION)  # (nb, n_pad)
        Di = lax.dynamic_slice(dinv, (i, 0, 0), (1, nb, nb))[0]
        Xrow = -jnp.matmul(Di, prod, precision=_GEMM_PRECISION)
        # keep the diagonal block (Xrow is zero at and right of it)
        Xrow = Xrow + lax.dynamic_update_slice(
            jnp.zeros((nb, n_pad), dtype=L.dtype), Di, (0, c0)
        )
        return lax.dynamic_update_slice(X, Xrow, (c0, 0))

    X = lax.fori_loop(1, k, body, X0)
    return X[:n, :n]


@partial(jax.jit, static_argnames=("nb",))
def spd_inv_from_chol(L: jax.Array, nb: int = _DEFAULT_BLOCK) -> jax.Array:
    """(L L^T)^{-1} = L^{-T} L^{-1} via the blocked triangular inverse.

    The explicit-inverse construction of the shared-factor QP solver
    (`ops.eqp.batched_eqp_solve_shared`): one batched-diagonal substitution
    plus GEMMs, instead of a 2n-row-sequential ``cho_solve`` against the
    identity.
    """
    linv = tri_inv_blocked(L, nb=nb)
    return jnp.matmul(linv.T, linv, precision=_GEMM_PRECISION)
