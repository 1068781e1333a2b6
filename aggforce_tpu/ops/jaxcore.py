"""JAX/XLA implementations of the core trajectory-array kernels.

Device twins of :mod:`aggforce_tpu.ops.core`. All functions are jittable with
static shapes so XLA can tile the contractions onto the TPU MXU; the big
``trjdot`` contraction is expressed with ``dot_general`` semantics via
``jnp.matmul`` to guarantee a single fused batched GEMM.

Behavior parity targets: reference jaxutil.py:11-59 (trjdot),
jaxutil.py:105-183 (distances with ``square`` option).
"""

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp


@jax.jit
def trjdot(points: jax.Array, factor: jax.Array) -> jax.Array:
    """Map (n_frames, n_sites, n_dim) points with a (n_out, n_sites) matrix.

    A rank-3 ``factor`` of shape (n_frames, n_out, n_sites) applies a distinct
    matrix per frame (batched GEMM on the MXU).
    """
    if factor.ndim == 2:
        return jnp.matmul(factor[None, :, :], points, precision="highest")
    if factor.ndim == 3:
        return jnp.matmul(factor, points, precision="highest")
    raise ValueError(f"factor must be rank 2 or 3, got shape {factor.shape}.")


@partial(
    jax.jit,
    static_argnames=["return_matrix", "return_displacements", "square"],
)
def distances(
    xyz: jax.Array,
    cross_xyz: Optional[jax.Array] = None,
    return_matrix: bool = True,
    return_displacements: bool = False,
    square: bool = False,
) -> jax.Array:
    """Differentiable per-frame pairwise distances.

    Same layout conventions as the numpy twin; ``square=True`` returns squared
    distances (which keeps gradients finite at coincident points — required by
    the Gaussian validation force-fields).
    """
    if cross_xyz is not None and not return_matrix:
        raise ValueError("Cross distances require return_matrix=True.")
    if return_displacements and not return_matrix:
        raise ValueError("Displacements require return_matrix=True.")
    other = xyz if cross_xyz is None else cross_xyz
    disp = xyz[:, None, :, :] - other[:, :, None, :]
    if return_displacements:
        return disp
    sq = jnp.sum(disp * disp, axis=-1)
    if square:
        dist = sq
    else:
        dist = jnp.sqrt(sq)
    if return_matrix:
        return dist
    n = dist.shape[-1]
    iu, ju = jnp.triu_indices(n, k=1)
    return dist[:, iu, ju]


@jax.jit
def qp_form(target: jax.Array) -> jax.Array:
    """Reshape (n_frames, n_sites, n_dim) -> (n_frames*n_dim, n_sites)."""
    swapped = jnp.swapaxes(target, 1, 2)
    return swapped.reshape(swapped.shape[0] * swapped.shape[1], -1)


def abatch(
    func,
    arr: jax.Array,
    chunk_size: Union[int, None],
    *args,
    **kwargs,
) -> jax.Array:
    """Apply ``func`` over leading-axis chunks of a device array.

    Hosts a python loop (chunk count is static), so each chunk reuses the same
    compiled executable when shapes match.
    """
    if chunk_size is None or chunk_size >= arr.shape[0]:
        return func(arr, *args, **kwargs)
    n_chunks = -(-len(arr) // chunk_size)
    pieces = jnp.array_split(arr, n_chunks)
    return jnp.concatenate([func(p, *args, **kwargs) for p in pieces], axis=0)
