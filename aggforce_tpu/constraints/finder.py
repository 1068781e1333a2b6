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


@partial(jax.jit, static_argnames=("cross",))
def _distance_sd(
    xyz: jax.Array, other: jax.Array, cross: bool
) -> jax.Array:
    """Std-dev over frames of every pairwise distance, in one fused pass."""
    disp = xyz[:, None, :, :] - other[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    return jnp.std(dist, axis=0)


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
    x = jnp.asarray(xyz)
    if cross_xyz is None:
        sds = np.array(_distance_sd(x, x, cross=False))
        np.fill_diagonal(sds, threshold * 2)
        ii, jj = np.nonzero(sds < threshold)
        return {frozenset(p) for p in zip(ii.tolist(), jj.tolist())}
    sds = np.asarray(_distance_sd(x, jnp.asarray(cross_xyz), cross=True))
    ii, jj = np.nonzero(sds < threshold)
    return {(int(i), int(j)) for i, j in zip(ii, jj)}
