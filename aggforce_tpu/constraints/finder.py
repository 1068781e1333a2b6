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

# frames per device step when streaming the distance moments; bounds the live
# (chunk, N, N) tensor so thousands-of-atoms systems fit in HBM
_FRAME_CHUNK = 32


@partial(jax.jit, static_argnames=("cross", "n_chunks"))
def _distance_sd(
    xyz: jax.Array, other: jax.Array, cross: bool, n_chunks: int = 1
) -> jax.Array:
    """Std-dev over frames of every pairwise distance.

    Streams frame chunks through a scan accumulating first and second
    moments, so only one (chunk, n_a, n_b) distance block is ever live —
    the full (n_frames, N, N) tensor is never materialized (the reference
    builds it whole, constfinder.py:46, which is infeasible for the
    100k-frame / thousands-of-atoms sweep).
    """
    t = xyz.shape[0]
    chunk = t // n_chunks
    xa = xyz.reshape(n_chunks, chunk, *xyz.shape[1:])
    xb = other.reshape(n_chunks, chunk, *other.shape[1:])

    # reference distances (frame 0) are subtracted before accumulating, so
    # the moments are of the small fluctuation d - d0 — this avoids the
    # catastrophic cancellation E[d^2] - E[d]^2 would suffer in float32 at
    # the 1e-3 detection threshold.
    disp0 = xyz[0][None, :, :] - other[0][:, None, :]
    d0 = jnp.sqrt(jnp.sum(disp0 * disp0, axis=-1))

    def body(carry, inp):
        s1, s2 = carry
        a, b = inp
        disp = a[:, None, :, :] - b[:, :, None, :]
        delta = jnp.sqrt(jnp.sum(disp * disp, axis=-1)) - d0
        return (s1 + delta.sum(axis=0), s2 + (delta * delta).sum(axis=0)), None

    shape = (other.shape[1], xyz.shape[1])
    init = (
        jnp.zeros(shape, dtype=xyz.dtype),
        jnp.zeros(shape, dtype=xyz.dtype),
    )
    (s1, s2), _ = jax.lax.scan(body, init, (xa, xb))
    mean = s1 / t
    var = jnp.maximum(s2 / t - mean * mean, 0.0)
    return jnp.sqrt(var)


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
    n_chunks = max(1, t // _FRAME_CHUNK)
    # drop trailing frames that do not fill a chunk (statistically harmless
    # for a fluctuation screen; avoids a ragged scan step)
    t_use = (t // n_chunks) * n_chunks
    x = jnp.asarray(xyz[:t_use])
    if cross_xyz is None:
        sds = np.array(_distance_sd(x, x, cross=False, n_chunks=n_chunks))
        np.fill_diagonal(sds, threshold * 2)
        ii, jj = np.nonzero(sds < threshold)
        return {frozenset(p) for p in zip(ii.tolist(), jj.tolist())}
    sds = np.asarray(
        _distance_sd(
            x, jnp.asarray(cross_xyz[:t_use]), cross=True, n_chunks=n_chunks
        )
    )
    ii, jj = np.nonzero(sds < threshold)
    return {(int(i), int(j)) for i, j in zip(ii, jj)}
