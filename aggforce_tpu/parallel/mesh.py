"""Mesh construction and frame-sharded force-map fits.

The reference is single-process/single-device; its scaling mechanisms are
frame chunking and lazy generators (reference jaxutil.py:62-102,
qp/featlinearmap.py:73-246). The TPU-native equivalent is data sharding of
the frame axis over a device mesh: every Gram/constraint reduction is a sum
over frames, so each device reduces its local shard and one ``psum`` over the
ICI combines them — the classic reduction-shaped workload that needs no other
collective.

The KKT solve itself is replicated (it is tiny relative to the Gram), so the
fit is [shard frames] -> [local MXU Gram] -> [psum] -> [replicated solve].
"""

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.eqp import eqp_solve_auglag

FRAME_AXIS = "frames"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = FRAME_AXIS
) -> Mesh:
    """1-D mesh over all (or the given) devices for frame-data parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=(axis_name,))


def _pad_frames(forces: np.ndarray, n_shards: int) -> np.ndarray:
    """Zero-pad the frame axis to a multiple of the mesh size.

    Zero frames contribute nothing to the force Gram matrix, so padding is
    exact (not an approximation).
    """
    t = forces.shape[0]
    rem = (-t) % n_shards
    if rem == 0:
        return forces
    pad = np.zeros((rem,) + forces.shape[1:], dtype=forces.dtype)
    return np.concatenate([forces, pad], axis=0)


@partial(jax.jit, static_argnames=("mesh",))
def _sharded_fit(
    forces: jax.Array,
    con_mat: jax.Array,
    cmap_mat: jax.Array,
    l2_regularization: jax.Array,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Frame-sharded linear force-map fit over a mesh.

    The per-shard Gram is computed under shard_map and psummed over the frame
    axis; the small KKT system is solved identically on every device. Returns
    the force-map matrix and the solver's constraint-violation diagnostic.
    """

    def local_gram(f_local: jax.Array, con: jax.Array) -> jax.Array:
        t, n, d = f_local.shape
        flat = jnp.swapaxes(f_local, 1, 2).reshape(t * d, n)
        design = jnp.matmul(flat, con, precision="highest")
        return jax.lax.psum(
            jnp.matmul(design.T, design, precision="highest"), FRAME_AXIS
        )

    gram = jax.shard_map(
        local_gram,
        mesh=mesh,
        in_specs=(P(FRAME_AXIS), P()),
        out_specs=P(),
    )(forces, con_mat)
    gram = gram + l2_regularization * jnp.matmul(
        con_mat.T, con_mat, precision="highest"
    )
    a_mat = jnp.matmul(cmap_mat, con_mat, precision="highest")
    basis = jnp.eye(a_mat.shape[0], dtype=forces.dtype)
    x, resid = eqp_solve_auglag(gram, a_mat, basis, return_resid=True)
    return jnp.matmul(con_mat, x, precision="highest").T, resid


def sharded_linear_fit(
    forces: np.ndarray,
    con_mat: np.ndarray,
    cmap_mat: np.ndarray,
    l2_regularization: float = 0.0,
    mesh: Optional[Mesh] = None,
    return_resid: bool = False,
):
    """Fit the optimal linear force-map matrix with frames sharded on a mesh.

    Drop-in equivalent of the single-device fit in
    :func:`aggforce_tpu.qp.qplinear.qp_linear_map`, returning the
    (n_cg, n_fg) force-map matrix. With ``return_resid=True`` also returns
    the solver's equilibrated constraint violation (the convergence
    diagnostic callers check before trusting an f32 solve).
    """
    if mesh is None:
        mesh = make_mesh()
    n_shards = mesh.devices.size
    padded = _pad_frames(np.asarray(forces), n_shards)
    dtype = jnp.asarray(padded[:1]).dtype
    sharding = NamedSharding(mesh, P(FRAME_AXIS))
    forces_sharded = jax.device_put(padded, sharding)
    out, resid = _sharded_fit(
        forces_sharded,
        jnp.asarray(con_mat, dtype=dtype),
        jnp.asarray(cmap_mat, dtype=dtype),
        jnp.asarray(l2_regularization, dtype=dtype),
        mesh=mesh,
    )
    out_np, resid_np = jax.device_get((out, resid))
    if return_resid:
        return np.asarray(out_np), float(resid_np)
    return np.asarray(out_np)


def sharded_force_smoothness(
    array: np.ndarray, mesh: Optional[Mesh] = None
) -> float:
    """Mean squared element with the frame axis sharded over the mesh."""
    if mesh is None:
        mesh = make_mesh()
    t = array.shape[0]
    padded = _pad_frames(np.asarray(array), mesh.devices.size)
    sharding = NamedSharding(mesh, P(FRAME_AXIS))
    dev = jax.device_put(padded, sharding)

    def local(x: jax.Array) -> jax.Array:
        return jax.lax.psum(jnp.sum(x * x), FRAME_AXIS)

    total = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=P(FRAME_AXIS), out_specs=P())
    )(dev)
    return float(total) / float(np.prod(array.shape[:1]) * np.prod(array.shape[1:]))
