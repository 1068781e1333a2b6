"""Detect holonomically constrained site pairs from distance fluctuations.

Behavior parity target: reference constraints/constfinder.py:14-57 (pairs whose
per-frame distance standard deviation falls below a threshold are declared
constrained; self pairs masked; the cross-system variant returns ordered
tuples).

TPU-first note: the O(T N^2) fluctuation statistic runs as one jitted kernel —
mean/variance of the pairwise distance matrices accumulated on device — and
only the (tiny) boolean mask is pulled back to host to build the frozenset API
the rest of the package expects.
"""

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .hints import Constraints

# byte budget for the live (chunk, N, N) distance block when streaming the
# moments; the frame chunk adapts to the site count so thousands-of-atoms
# systems stay well inside HBM
_BLOCK_BYTES = 192 * 1024 * 1024


def _frame_chunk(n_a: int, n_b: int) -> int:
    # the live distance block is (chunk, n_b, n_a) — in cross mode the two
    # site counts differ, and sizing from one alone can blow the budget by
    # the ratio of the other
    per_frame = n_a * n_b * 4
    return max(1, min(64, _BLOCK_BYTES // max(per_frame, 1)))


@partial(jax.jit, static_argnames=("cross", "n_chunks"))
def _distance_sd(
    xyz: jax.Array,
    other: jax.Array,
    mask: jax.Array,
    cross: bool,
    n_chunks: int = 1,
) -> jax.Array:
    """Std-dev over frames of every pairwise distance.

    Streams frame chunks through a scan accumulating first and second
    moments, so only one (chunk, n_a, n_b) distance block is ever live —
    the full (n_frames, N, N) tensor is never materialized (the reference
    builds it whole, constfinder.py:46, which is infeasible for the
    100k-frame / thousands-of-atoms sweep). ``mask`` flags valid frames:
    zero-padded frames (added so chunks stay rectangular) contribute
    nothing, and the moments divide by the true frame count — every input
    frame participates exactly once.
    """
    t = xyz.shape[0]
    chunk = t // n_chunks
    xa = xyz.reshape(n_chunks, chunk, *xyz.shape[1:])
    xb = other.reshape(n_chunks, chunk, *other.shape[1:])
    ma = mask.reshape(n_chunks, chunk)

    def dists(a: jax.Array, b: jax.Array) -> jax.Array:
        # Gram trick: |a_j - b_i|^2 = |a_j|^2 + |b_i|^2 - 2 b_i . a_j keeps
        # the live block at (chunk, n_b, n_a) (no trailing xyz axis) and
        # routes the pairwise work through a batched MXU GEMM.
        sq_a = jnp.sum(a * a, axis=-1)  # (chunk, n_a)
        sq_b = jnp.sum(b * b, axis=-1)  # (chunk, n_b)
        dots = jnp.einsum("tjd,tid->tij", a, b, precision="highest")
        dsq = sq_b[:, :, None] + sq_a[:, None, :] - 2.0 * dots
        return jnp.sqrt(jnp.maximum(dsq, 0.0))

    # reference distances (frame 0) are subtracted before accumulating, so
    # the moments are of the small fluctuation d - d0 — this avoids the
    # catastrophic cancellation E[d^2] - E[d]^2 would suffer in float32 at
    # the 1e-3 detection threshold.
    d0 = dists(xyz[0][None], other[0][None])[0]

    def body(carry, inp):
        s1, s2 = carry
        a, b, m = inp
        delta = (dists(a, b) - d0) * m[:, None, None]
        return (s1 + delta.sum(axis=0), s2 + (delta * delta).sum(axis=0)), None

    shape = (other.shape[1], xyz.shape[1])
    init = (
        jnp.zeros(shape, dtype=xyz.dtype),
        jnp.zeros(shape, dtype=xyz.dtype),
    )
    (s1, s2), _ = jax.lax.scan(body, init, (xa, xb, ma))
    t_true = jnp.sum(mask)
    mean = s1 / t_true
    var = jnp.maximum(s2 / t_true - mean * mean, 0.0)
    return jnp.sqrt(var)


@partial(jax.jit, static_argnames=("cross", "n_chunks"))
def _constraint_mask(
    xyz: jax.Array,
    other: jax.Array,
    mask: jax.Array,
    threshold: jax.Array,
    cross: bool,
    n_chunks: int = 1,
) -> jax.Array:
    """Boolean constrained-pair mask, computed entirely on device.

    Thresholding (and, within one system, self-pair exclusion) happens
    before the fetch so the host transfer is a 1-byte-per-pair mask
    instead of the float32 sd matrix — at sweep scale (3000 atoms) that is
    9 MB instead of 36 MB through the device tunnel per detection call.
    """
    sds = _distance_sd(xyz, other, mask, cross=cross, n_chunks=n_chunks)
    hits = sds < threshold
    if not cross:
        n = hits.shape[0]
        eye = jnp.eye(n, dtype=bool)
        hits = jnp.where(eye, False, hits)
    return hits


@partial(jax.jit, static_argnames=("n_folds", "n_chunks"))
def _fold_distance_moments(
    xyz: jax.Array,
    fold_ids: jax.Array,  # (t_pad,) int32; padded frames get id n_folds
    mask: jax.Array,
    n_folds: int,
    n_chunks: int,
):
    """Per-fold first/second moments of the distance fluctuations.

    One pass over the trajectory yields, for every fold f and site pair,
    sum and sum-of-squares of (d - d0) over fold f's frames — from which
    any train-fold's (= all-but-one-fold) distance sd follows by
    subtraction from the totals. This powers the k-fold constraint-
    stability probe at the cost of ONE detection pass instead of one pass
    per fold.
    """
    t = xyz.shape[0]
    # frame-wise centroid centering: same free-precision trick as
    # guess_pairwise_constraints (distances unchanged, cancellation tamed)
    xyz = xyz - jnp.mean(xyz, axis=1, keepdims=True)
    chunk = t // n_chunks
    xa = xyz.reshape(n_chunks, chunk, *xyz.shape[1:])
    ids = fold_ids.reshape(n_chunks, chunk)
    ma = mask.reshape(n_chunks, chunk)

    def dists(a):
        sq = jnp.sum(a * a, axis=-1)
        dots = jnp.einsum("tjd,tid->tij", a, a, precision="highest")
        dsq = sq[:, :, None] + sq[:, None, :] - 2.0 * dots
        return jnp.sqrt(jnp.maximum(dsq, 0.0))

    d0 = dists(xyz[0][None])[0]

    def body(carry, inp):
        s1, s2, cnt = carry
        a, fid, m = inp
        delta = (dists(a) - d0) * m[:, None, None]
        onehot = jax.nn.one_hot(fid, n_folds, dtype=xyz.dtype)  # (chunk, F)
        onehot = onehot * m[:, None]
        s1 = s1 + jnp.einsum("tf,tij->fij", onehot, delta, precision="highest")
        s2 = s2 + jnp.einsum(
            "tf,tij->fij", onehot, delta * delta, precision="highest"
        )
        cnt = cnt + jnp.sum(onehot, axis=0)
        return (s1, s2, cnt), None

    n = xyz.shape[1]
    init = (
        jnp.zeros((n_folds, n, n), dtype=xyz.dtype),
        jnp.zeros((n_folds, n, n), dtype=xyz.dtype),
        jnp.zeros((n_folds,), dtype=xyz.dtype),
    )
    (s1, s2, cnt), _ = jax.lax.scan(body, init, (xa, ids, ma))
    return s1, s2, cnt


def fold_train_constraint_probe(
    xyz: np.ndarray,
    folds,
    threshold: float = 1e-3,
    margin_rel: float = 1e-2,
):
    """Predict per-train-fold constraint detection from one moment pass.

    ``folds`` is a list of held-out frame-index arrays partitioning the
    trajectory. For each fold, the training set's distance sds are derived
    from (total - fold) moments and thresholded exactly like
    :func:`guess_pairwise_constraints`. Returns a list of per-fold
    constraint sets, or None when some pair's train sd falls within
    ``margin_rel`` of the threshold — there the subtraction arithmetic
    (and the subset's different d0 reference) could flip the decision
    relative to running detection on the subset directly, so the caller
    must fall back to exact per-fold detection. Far from the threshold
    (the overwhelmingly common case) the prediction is decision-exact.
    """
    t = xyz.shape[0]
    n_folds = len(folds)
    fold_ids = np.empty(t, dtype=np.int32)
    for f, idx in enumerate(folds):
        fold_ids[idx] = f
    n_chunks = max(1, t // _frame_chunk(xyz.shape[1], xyz.shape[1]))
    chunk = -(-t // n_chunks)
    t_pad = chunk * n_chunks
    pad = t_pad - t
    # device-resident inputs stay on device (no host round-trip); the
    # centroid centering happens inside the jitted kernel
    x = jnp.pad(
        jnp.asarray(xyz).astype(jnp.float32), ((0, pad), (0, 0), (0, 0))
    )
    ids = jnp.asarray(np.concatenate([fold_ids, np.zeros(pad, np.int32)]))
    mask = jnp.asarray(
        np.concatenate([np.ones(t), np.zeros(pad)]), dtype=x.dtype
    )
    s1, s2, cnt = jax.device_get(
        _fold_distance_moments(x, ids, mask, n_folds, n_chunks)
    )
    s1 = np.asarray(s1, np.float64)
    s2 = np.asarray(s2, np.float64)
    cnt = np.asarray(cnt, np.float64)
    tot1, tot2, tot_n = s1.sum(0), s2.sum(0), cnt.sum()
    out = []
    n = xyz.shape[1]
    for f in range(n_folds):
        tr1, tr2, tr_n = tot1 - s1[f], tot2 - s2[f], tot_n - cnt[f]
        mean = tr1 / tr_n
        var = np.maximum(tr2 / tr_n - mean * mean, 0.0)
        sds = np.sqrt(var)
        np.fill_diagonal(sds, threshold * 2)
        if np.any(np.abs(sds - threshold) < margin_rel * threshold):
            return None  # ambiguous near the threshold: caller goes exact
        ii, jj = np.nonzero(sds < threshold)
        out.append({frozenset(p) for p in zip(ii.tolist(), jj.tolist())})
    return out


def guess_pairwise_constraints(
    xyz: np.ndarray,
    cross_xyz: Optional[np.ndarray] = None,
    threshold: float = 1e-3,
) -> Union[Constraints, set]:
    """Find site pairs whose distance is (nearly) invariant over time.

    Arguments:
    ---------
    xyz:
        (n_frames, n_sites, n_dim) coordinates.
    cross_xyz:
        Optional (n_frames, other_n_sites, n_dim). If given, distances between
        the two systems are screened and ordered ``(i, j)`` tuples are
        returned with ``i`` indexing ``cross_xyz`` and ``j`` indexing ``xyz``.
    threshold:
        Pairs with distance standard deviation below this (same units as xyz)
        are considered constrained.

    Returns:
    -------
    Set of frozensets (within one system) or set of ordered tuples (cross).
    """
    t = xyz.shape[0]
    # translation invariance for free precision: the Gram-trick distance
    # (|a|^2 + |b|^2 - 2 a.b) loses ~|a|^2 * eps_f32 to cancellation, which
    # for trajectories far from the origin (unwrapped/uncentered boxes at
    # ~100 nm) exceeds the 1e-3 detection threshold. Centering each frame
    # on its centroid (the same shift for both systems) leaves every
    # distance exactly unchanged while shrinking |a| to molecular scale.
    centroid = xyz.mean(axis=1, keepdims=True)
    xyz = xyz - centroid
    if cross_xyz is not None:
        cross_xyz = cross_xyz - centroid
    n_cross = xyz.shape[1] if cross_xyz is None else cross_xyz.shape[1]
    n_chunks = max(1, t // _frame_chunk(xyz.shape[1], n_cross))
    # zero-pad to a rectangular (n_chunks, chunk) scan; padded frames are
    # masked out of the moments so every real frame counts (the earlier
    # revision dropped trailing frames — a silent deviation from the
    # reference, which uses all frames)
    chunk = -(-t // n_chunks)
    t_pad = chunk * n_chunks
    pad = ((0, t_pad - t), (0, 0), (0, 0))
    x = jnp.pad(jnp.asarray(xyz), pad)
    mask = jnp.asarray(
        np.concatenate([np.ones(t), np.zeros(t_pad - t)]), dtype=x.dtype
    )
    thr = jnp.asarray(threshold, dtype=x.dtype)
    if cross_xyz is None:
        hits = np.asarray(
            _constraint_mask(x, x, mask, thr, cross=False, n_chunks=n_chunks)
        )
        ii, jj = np.nonzero(hits)
        return {frozenset(p) for p in zip(ii.tolist(), jj.tolist())}
    hits = np.asarray(
        _constraint_mask(
            x,
            jnp.pad(jnp.asarray(cross_xyz), pad),
            mask,
            thr,
            cross=True,
            n_chunks=n_chunks,
        )
    )
    ii, jj = np.nonzero(hits)
    return {(int(i), int(j)) for i, j in zip(ii, jj)}
