"""Streaming force-map fits: chunked disk -> host -> device pipelines.

The reference loads whole trajectories into numpy before fitting (its tests
np.load everything; reference has no IO subsystem). Fits here only ever need
one frame chunk live — every optimization in this package reduces to a
Gram accumulated over frames plus a tiny solve — so this module streams
chunks from memory-mapped files (or any chunk source) through the device:

    disk (np.memmap) -> host chunk -> H2D -> jitted Gram update -> discard

All device work is dispatched asynchronously: while the device reduces
chunk k, the host is already slicing and uploading chunk k+1, so disk/H2D
latency overlaps compute. Peak host memory is one chunk; peak HBM is one
chunk plus the running Gram. A 1M-frame x 3000-atom trajectory (108 GB)
fits through a chip with 16 GB of HBM.

Numerical contract: streamed fits produce bit-comparable results to the
in-memory fits (same chunked Gram order when chunk sizes match) and run
through the same convergence-checked solvers.
"""

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints
from ..map import CLAFTMap, JLinearMap, LinearMap, SeperableTMap
from ..ops.eqp import eqp_solve_auglag
from ..qp.fusedfeat import (
    GBFeatSpec,
    _constraint_rows,
    _package_fused_map,
    _scan_gram,
    group_factorization,
)
from ..qp.qplinear import constraint_labels


class TrajectoryStream:
    """Chunked view of a trajectory: iterate (coords, forces) frame blocks.

    Sources:
      * ``TrajectoryStream.from_arrays(coords, forces)`` — any array pair
        (numpy, memmap, or jax); chunks are views/slices.
      * ``TrajectoryStream.from_npy(coords_path, forces_path)`` — .npy files
        opened with ``mmap_mode="r"`` so only touched chunks hit RAM.

    ``chunk_size`` bounds the live block. ``n_frames``/``n_sites`` are known
    up front (needed for constraint-frame sampling and score denominators).
    """

    def __init__(self, coords, forces, chunk_size: int = 4096) -> None:
        if coords.shape != forces.shape:
            raise ValueError("coords and forces must have the same shape.")
        if coords.ndim != 3:
            raise ValueError("expected (n_frames, n_sites, n_dim) arrays.")
        self.coords = coords
        self.forces = forces
        self.chunk_size = int(chunk_size)

    @classmethod
    def from_arrays(cls, coords, forces, chunk_size: int = 4096):
        """Wrap in-memory (or already-memmapped) arrays."""
        return cls(coords, forces, chunk_size)

    @classmethod
    def from_npy(
        cls, coords_path: str, forces_path: str, chunk_size: int = 4096
    ):
        """Memory-map two .npy files; chunks are read lazily from disk."""
        return cls(
            np.load(coords_path, mmap_mode="r"),
            np.load(forces_path, mmap_mode="r"),
            chunk_size,
        )

    @property
    def n_frames(self) -> int:
        return self.coords.shape[0]

    @property
    def n_sites(self) -> int:
        return self.coords.shape[1]

    def __len__(self) -> int:
        return self.n_frames

    def chunks(
        self, frame_slice: Optional[slice] = None
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        """Yield (coords_chunk, forces_chunk, n_valid) uniform blocks.

        Every yielded block has exactly ``chunk_size`` frames (the last one
        zero-padded; ``n_valid`` counts real frames) so the device update
        compiles once. ``frame_slice`` restricts iteration to a contiguous
        sub-range — the multi-host pattern where each process streams only
        its :func:`aggforce_tpu.parallel.distributed.process_frame_slice`.
        """
        lo, hi, step = (
            frame_slice.indices(self.n_frames)
            if frame_slice is not None
            else (0, self.n_frames, 1)
        )
        if step != 1:
            raise ValueError("frame_slice must be contiguous (step 1).")
        c = self.chunk_size
        for start in range(lo, hi, c):
            stop = min(start + c, hi)
            cc = np.asarray(self.coords[start:stop])
            fc = np.asarray(self.forces[start:stop])
            n_valid = cc.shape[0]
            if n_valid < c:
                pad = ((0, c - n_valid), (0, 0), (0, 0))
                cc = np.pad(cc, pad)
                fc = np.pad(fc, pad)
            yield cc, fc, n_valid

    def gather_frames(self, frame_idx: np.ndarray) -> np.ndarray:
        """Fetch specific frames' coordinates (host side, small)."""
        return np.stack([np.asarray(self.coords[int(i)]) for i in frame_idx])


def _local_mesh_devices(mesh):
    """This process's devices within a (possibly multi-host) 1-D mesh."""
    pid = jax.process_index()
    return [d for d in mesh.devices.flat if d.process_index == pid]


def _psum_gram_stack(mesh, per_device_grams, devices):
    """All-reduce per-device Gram accumulators over the global mesh.

    Builds one globally-sharded stack from each device's local accumulator
    (this process contributes only its local shards) and reduces it with a
    single psum — ICI within a slice, DCN across hosts, O(K^2) bytes either
    way. Returns the replicated total (identical on every process).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    gram_shape = per_device_grams[0].shape
    shards = [
        jax.device_put(g[None], d) for g, d in zip(per_device_grams, devices)
    ]
    sharding = NamedSharding(mesh, P("frames", *([None] * len(gram_shape))))
    stacked = jax.make_array_from_single_device_arrays(
        (mesh.devices.size,) + gram_shape, sharding, shards
    )

    def local_sum(x):
        return jax.lax.psum(jnp.sum(x, axis=0), "frames")

    return jax.jit(
        jax.shard_map(
            local_sum,
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("frames"),
            out_specs=jax.sharding.PartitionSpec(),
        )
    )(stacked)


@partial(jax.jit, static_argnames=("r",))
def _linear_gram_update(
    gram: jax.Array,
    forces_chunk: jax.Array,
    mask: jax.Array,
    labels: jax.Array,
    r: int,
) -> jax.Array:
    """One chunk's contribution to the reduced force Gram.

    Module-level (all data as operands) so every streamed fit reuses ONE
    compiled program — a per-fit closure would capture ``labels`` as a
    baked constant and re-trace/re-compile on every call.
    """
    con = jax.nn.one_hot(labels, r, dtype=forces_chunk.dtype)
    f = forces_chunk * mask[:, None, None]
    t, n, d = f.shape
    flat = jnp.swapaxes(f, 1, 2).reshape(t * d, n)
    design = jnp.matmul(flat, con, precision="highest")
    return gram + jnp.matmul(design.T, design, precision="highest")


@partial(jax.jit, static_argnames=("r",))
def _linear_gram_solve(
    gram: jax.Array,
    labels: jax.Array,
    cmap_mat: jax.Array,
    l2_regularization: jax.Array,
    r: int,
):
    """Regularize, constrain, and solve the accumulated Gram."""
    dtype = gram.dtype
    n = labels.shape[0]
    con = jax.nn.one_hot(labels, r, dtype=dtype)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), dtype=dtype), labels, num_segments=r
    )
    g = gram + l2_regularization * jnp.diag(counts)
    a_mat = jnp.matmul(cmap_mat, con, precision="highest")
    basis = jnp.eye(a_mat.shape[0], dtype=dtype)
    x, resid = eqp_solve_auglag(g, a_mat, basis, return_resid=True)
    return x[labels].T, resid


def qp_linear_map_streamed(
    stream: TrajectoryStream,
    coord_map: LinearMap,
    constraints: Optional[Constraints] = None,
    l2_regularization: float = 0.0,
    resid_tol: float = 1e-4,
    mesh=None,
    frame_slice: Optional[slice] = None,
) -> SeperableTMap:
    """Streamed :func:`aggforce_tpu.qp.qp_linear_map` (device backend).

    Accumulates the reduced force Gram chunk-by-chunk on device; only one
    chunk is ever resident. Identical optimization to the in-memory fit.

    With ``mesh`` (1-D, axis "frames", possibly spanning multiple hosts),
    chunks round-robin over this process's local devices — each device
    accumulates its own Gram while other devices' transfers/updates are in
    flight — and ONE psum merges the per-device Grams at finish (ICI
    within a slice, DCN across hosts). ``frame_slice`` restricts this
    process's streaming to its own frame range (pair with
    :func:`aggforce_tpu.parallel.distributed.process_frame_slice`); the
    psum then completes the global sum, so every process returns the same
    fitted map.
    """
    from ..qp.qplinear import make_bond_constraint_matrix

    if constraints is None:
        constraints = set()
    labels_np, r = constraint_labels(coord_map.n_fg_sites, constraints)
    dtype = jnp.float32
    c = stream.chunk_size

    if mesh is None:
        labels = jnp.asarray(labels_np)
        gram = jnp.zeros((r, r), dtype=dtype)
        for cc, fc, n_valid in stream.chunks(frame_slice):
            mask = jnp.asarray(
                np.concatenate([np.ones(n_valid), np.zeros(c - n_valid)]),
                dtype=dtype,
            )
            gram = _linear_gram_update(
                gram, jnp.asarray(fc, dtype=dtype), mask, labels, r
            )
        labels_solve = labels
    else:
        devices = _local_mesh_devices(mesh)
        labels_dev = [jax.device_put(labels_np, d) for d in devices]
        grams = [
            jax.device_put(jnp.zeros((r, r), dtype=dtype), d) for d in devices
        ]
        for i, (cc, fc, n_valid) in enumerate(stream.chunks(frame_slice)):
            k = i % len(devices)
            mask = np.concatenate(
                [np.ones(n_valid, np.float32), np.zeros(c - n_valid, np.float32)]
            )
            grams[k] = _linear_gram_update(
                grams[k],
                jax.device_put(fc.astype(np.float32), devices[k]),
                jax.device_put(mask, devices[k]),
                labels_dev[k],
                r,
            )
        gram = _psum_gram_stack(mesh, grams, devices)
        labels_solve = jnp.asarray(labels_np)

    fmap_dev, resid_dev = _linear_gram_solve(
        gram,
        labels_solve,
        jnp.asarray(coord_map.standard_matrix, dtype),
        jnp.asarray(l2_regularization, dtype),
        r,
    )
    fmap_mat, resid_val = jax.device_get((fmap_dev, resid_dev))
    fmap_mat = np.asarray(fmap_mat)
    if not np.all(np.isfinite(fmap_mat)) or not float(resid_val) <= resid_tol:
        con_mat = make_bond_constraint_matrix(coord_map.n_fg_sites, constraints)
        if mesh is None and frame_slice is None:
            # escalation re-accumulates the Gram in float64 on host (rare
            # path; correctness over speed)
            gram64 = np.zeros((r, r))
            for cc, fc, n_valid in stream.chunks():
                f = np.asarray(fc[:n_valid], dtype=np.float64)
                flat = np.swapaxes(f, 1, 2).reshape(-1, coord_map.n_fg_sites)
                design = flat @ con_mat
                gram64 += design.T @ design
        else:
            # multi-device/multi-host: a true f64 re-accumulation would
            # need a host-side cross-process reduction; solve the fetched
            # (replicated, f32-accumulated) global Gram in f64 instead —
            # this fixes solver-conditioning failures (the common case)
            # deterministically and identically on every process.
            gram64 = np.asarray(jax.device_get(gram), dtype=np.float64)
        fmap_mat = _host_linear_fit_from_gram(
            gram64, con_mat, coord_map, l2_regularization
        )
    force_map = JLinearMap(fmap_mat.astype(np.float32))
    return SeperableTMap(
        coord_map=JLinearMap.from_linearmap(coord_map), force_map=force_map
    )


def _host_linear_fit_from_gram(
    gram64: np.ndarray,
    con_mat: np.ndarray,
    coord_map: LinearMap,
    l2_regularization: float,
) -> np.ndarray:
    from ..ops.eqp import eqp_solve_host

    if l2_regularization > 0.0:
        gram64 = gram64 + l2_regularization * (con_mat.T @ con_mat)
    a_mat = np.asarray(coord_map.standard_matrix, dtype=np.float64) @ con_mat
    x = eqp_solve_host(gram64, a_mat, np.eye(a_mat.shape[0]))
    return (con_mat @ x).T


@partial(jax.jit, static_argnames=("spec",))
def _feat_gram_update(
    gram, coords_chunk, forces_chunk, mask, cmap_mat, gm, oh, ct, cen,
    kbt, spec,
):
    """One chunk's contribution to the per-site featurized Grams.

    Module-level with all data as operands (a per-fit closure would bake
    the featurization constants into a fresh program and re-trace per fit).
    """
    return gram + _scan_gram(
        coords_chunk, forces_chunk, mask, cmap_mat, gm, oh, ct, cen,
        kbt, spec, 1,
    )


@partial(jax.jit, static_argnames=("spec",))
def _feat_gram_finish(gram, constr_coords, cmap_mat, gm, oh, ct, cen, spec):
    """Constraint rows + batched multi-site solve on the final Grams."""
    from ..ops.eqp import batched_eqp_solve_shared

    dtype = gram.dtype
    s_dim = cmap_mat.shape[0]
    cg = jnp.einsum(
        "sj,tjd->tsd", cmap_mat, constr_coords, precision="highest"
    )
    a_rows = _constraint_rows(
        constr_coords, cg, cmap_mat, gm, oh, ct, cen, spec
    )
    eye = jnp.eye(s_dim, dtype=dtype)
    b = jnp.broadcast_to(
        eye[:, None, :], (s_dim, constr_coords.shape[0], s_dim)
    ).reshape(s_dim, -1)
    # same solver as the in-memory fused fit (fit-batch of one), so the
    # streamed fit's numerical contract ("identical optimization") holds
    coefs, resids = batched_eqp_solve_shared(
        gram, a_rows[None], b[None, ..., None], return_resid=True
    )
    return coefs[0, ..., 0], jnp.max(resids), a_rows, b


def fused_gb_linear_map_streamed(
    stream: TrajectoryStream,
    coord_map: LinearMap,
    kbt: float,
    spec: GBFeatSpec,
    constraints: Optional[Constraints] = None,
    n_constraint_frames: int = 20,
    l2_regularization: float = 1e1,
    constraint_rng: Optional[np.random.Generator] = None,
    resid_tol: float = 1e-4,
    mesh=None,
    frame_slice: Optional[slice] = None,
) -> CLAFTMap:
    """Streamed canonical featurized fit (id_feat + gb_feat).

    Same optimization as :func:`aggforce_tpu.qp.fusedfeat.fused_gb_linear_map`
    with per-site Grams accumulated chunk-by-chunk — the trajectory never
    needs to fit in host RAM or HBM. Constraint frames are sampled up front
    from the stream's frame count and gathered from disk directly.

    With ``mesh`` (1-D, axis "frames", possibly multi-host), chunks
    round-robin over this process's local devices and one psum merges the
    per-site Grams at finish. ``frame_slice`` restricts this process's
    streaming to its own frame range (multi-host pattern with
    :func:`aggforce_tpu.parallel.distributed.process_frame_slice`); pass
    the same ``constraint_rng`` seed on every process so the sampled
    orthogonality frames — and therefore the fitted map — coincide.
    """
    if constraints is None:
        constraints = set()
    # group factorization is a pure function of the topology — no data read
    geom = group_factorization(coord_map, spec, constraints)
    onehot, group_mean, counts, centers = (
        geom["onehot"], geom["group_mean"], geom["counts"], geom["centers"],
    )
    dtype = jnp.float32
    cmap_mat = jnp.asarray(coord_map.standard_matrix, dtype)
    gm = jnp.asarray(group_mean)
    oh = jnp.asarray(onehot)
    ct = jnp.asarray(counts, dtype)
    cen = jnp.asarray(centers)
    kbt_dev = jnp.asarray(kbt, dtype)

    s_dim = coord_map.n_cg_sites
    g = onehot.shape[1]
    k_exp = g * spec.n_basis + (g if spec.include_id else 0)
    c = stream.chunk_size
    if mesh is None:
        gram = jnp.zeros((s_dim, k_exp, k_exp), dtype=dtype)
        for cc, fc, n_valid in stream.chunks(frame_slice):
            mask = jnp.asarray(
                np.concatenate([np.ones(n_valid), np.zeros(c - n_valid)]),
                dtype=dtype,
            )
            gram = _feat_gram_update(
                gram, jnp.asarray(cc, dtype=dtype),
                jnp.asarray(fc, dtype=dtype),
                mask, cmap_mat, gm, oh, ct, cen, kbt_dev, spec,
            )
    else:
        devices = _local_mesh_devices(mesh)
        consts = [
            tuple(
                jax.device_put(x, d)
                for x in (cmap_mat, gm, oh, ct, cen, kbt_dev)
            )
            for d in devices
        ]
        grams = [
            jax.device_put(
                jnp.zeros((s_dim, k_exp, k_exp), dtype=dtype), d
            )
            for d in devices
        ]
        for i, (cc, fc, n_valid) in enumerate(stream.chunks(frame_slice)):
            k = i % len(devices)
            mask = np.concatenate(
                [np.ones(n_valid, np.float32), np.zeros(c - n_valid, np.float32)]
            )
            cm_d, gm_d, oh_d, ct_d, cen_d, kbt_d = consts[k]
            grams[k] = _feat_gram_update(
                grams[k],
                jax.device_put(cc.astype(np.float32), devices[k]),
                jax.device_put(fc.astype(np.float32), devices[k]),
                jax.device_put(mask, devices[k]),
                cm_d, gm_d, oh_d, ct_d, cen_d, kbt_d, spec,
            )
        gram = _psum_gram_stack(mesh, grams, devices)
    gram = gram + jnp.asarray(l2_regularization, dtype) * jnp.eye(
        k_exp, dtype=dtype
    )

    rng = constraint_rng if constraint_rng is not None else np.random.default_rng()
    n_cf = min(n_constraint_frames, stream.n_frames)
    frame_idx = rng.choice(stream.n_frames, size=n_cf, replace=False)
    constr_coords = jnp.asarray(stream.gather_frames(frame_idx), dtype=dtype)

    coefs, resid, a_rows, b = _feat_gram_finish(
        gram, constr_coords, cmap_mat, gm, oh, ct, cen, spec
    )
    return _package_fused_map(
        coefs, resid, gram, a_rows, b, coord_map, onehot, centers, kbt,
        spec, resid_tol,
    )
