"""One-dispatch fused pipeline for the staged Gaussian map builders.

The staged builders (reference qp/jgauss.py:143-312, 449-650) chain four
device stages: premap linear QP fit -> Gaussian augmentation -> real-block
premapping (RATMap) -> second linear QP on the noise sites. Run piecewise
(:func:`aggforce_tpu.qp.jgauss.stagedjoptgauss_map`), that is ~6 executable
dispatches and two blocking coefficient fetches per fit; on remote-attached
devices each round-trip costs 10-45 ms, so the staged fit ran 4-6x slower
than the single-stage ``joptgauss_map`` that already got a fused path.

This module folds the whole pipeline into ONE traced program returning both
force maps plus their convergence diagnostics in a single fetch:

    gram1 (scan) -> premap solve -> noise draw + log-gradients
    -> premapped augmented system -> gram2 (scan) -> noise-site solve

The noise draw reuses :func:`aggforce_tpu.trajectory.gaussian`'s
``_fused_augment_math`` with the same single PRNG split, so results are
draw-for-draw consistent with the piecewise path. Solves above the residual
tolerance fall back to the legacy piecewise builder (which carries the
float64 escalation machinery).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eqp import eqp_solve_auglag
from ..trajectory.gaussian import _fused_augment_math

# chunk sizes mirror the piecewise fits so scanned Gram accumulation orders
# (and therefore f32 sums) match the legacy path bit for bit
_GRAM_CHUNK = 4096


def _scan_design_gram(flat_forces: jax.Array, n_chunks: int) -> jax.Array:
    """Gram of an (T3_pad, R) design matrix accumulated over frame chunks."""
    t3, r = flat_forces.shape
    blocks = flat_forces.reshape(n_chunks, t3 // n_chunks, r)

    def body(gram, blk):
        return gram + jnp.matmul(blk.T, blk, precision="highest"), None

    gram0 = jnp.zeros((r, r), dtype=flat_forces.dtype)
    gram, _ = jax.lax.scan(body, gram0, blocks)
    return gram


def _flatten_pad(forces: jax.Array, chunk: int) -> Tuple[jax.Array, int]:
    """(T, N, 3) -> (3*T_pad, N) stacked design with zero-pad to chunks."""
    t, n, d = forces.shape
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * (-(-t // n_chunks))
    if t_pad != t:
        forces = jnp.pad(forces, ((0, t_pad - t), (0, 0), (0, 0)))
    flat = jnp.swapaxes(forces, 1, 2).reshape(t_pad * d, n)
    return flat, n_chunks


@partial(
    jax.jit,
    static_argnames=("r", "n_aug", "zero_stage2", "use_input_forcemap"),
)
def _staged_gauss_program(
    coords: jax.Array,  # (T, N, 3)
    forces: jax.Array,  # (T, N, 3)
    key: jax.Array,
    cmap_mat: jax.Array,  # (S, N)
    labels: jax.Array,  # (N,) int32 constraint labels for the premap fit
    fmap1_in: Optional[jax.Array],  # (S, N) or None -> fit in-program
    var: jax.Array,
    kbt: jax.Array,
    l2_pre: jax.Array,
    l2_post: jax.Array,
    r: int,
    n_aug: int,
    zero_stage2: bool,
    use_input_forcemap: bool,
):
    """Whole staged-Gaussian fit in one executable.

    Returns (fmap1, resid1, fmap2, resid2, remaining):
      fmap1   (S, N)  premap force map (input passthrough or fitted)
      resid1  scalar  premap solve constraint violation (0 if passthrough)
      fmap2   (n_aug, S+n_aug) second-stage force map
      resid2  scalar  second-stage violation
      remaining scalar mean squared second-stage-mapped force (the noise
              contribution check of ``stagedjforcegauss_map``)
    ``zero_stage2`` runs the augmentation on a zero-force copy (the
    "force" variant's trick to isolate noise contributions).
    """
    dtype = coords.dtype

    # --- stage 1: premap linear fit (identical math to _device_linear_fit)
    if use_input_forcemap:
        fmap1 = fmap1_in
        resid1 = jnp.asarray(0.0, dtype)
    else:
        con_mat = jax.nn.one_hot(labels, r, dtype=dtype)  # (N, R)
        flat1, n_chunks1 = _flatten_pad(forces, _GRAM_CHUNK)
        design = jnp.matmul(flat1, con_mat, precision="highest")
        gram1 = _scan_design_gram(design, n_chunks1)
        counts = jax.ops.segment_sum(
            jnp.ones((labels.shape[0],), dtype=dtype), labels, num_segments=r
        )
        gram1 = gram1 + l2_pre * jnp.diag(counts)
        a_mat = jnp.matmul(cmap_mat, con_mat, precision="highest")
        basis = jnp.eye(a_mat.shape[0], dtype=dtype)
        x1, resid1 = eqp_solve_auglag(gram1, a_mat, basis, return_resid=True)
        fmap1 = x1[labels].T  # (S, N)

    # --- stage 2: augmentation (same single-split noise draw as the
    # piecewise path; pfill=True mirrors the bypass_nan_check premap)
    aug_forces = jnp.zeros_like(forces) if zero_stage2 else forces
    full_c, full_f = _fused_augment_math(
        key, coords, aug_forces, var, kbt, cmap_mat, None, pfill=True
    )
    n = coords.shape[1]
    real_c, aug_c = full_c[:, :n], full_c[:, n:]
    real_f, aug_f = full_f[:, :n], full_f[:, n:]

    # --- stage 3: RATMap — premap the real block, keep the noise block
    # (NaN->0 fill mirrors the handle_nans+bypass maps of the legacy path;
    # a no-op on finite data)
    def fill(x):
        return jnp.where(jnp.isnan(x), 0.0, x)

    mc_real = jnp.einsum(
        "sj,tjd->tsd", cmap_mat, fill(real_c), precision="highest"
    )
    mf_real = jnp.einsum(
        "sj,tjd->tsd", fmap1, fill(real_f), precision="highest"
    )
    pm_f = jnp.concatenate([mf_real, aug_f], axis=1)  # (T, S+n_aug, 3)

    # --- stage 4: noise-site linear fit (no constraints: C = I)
    flat2, n_chunks2 = _flatten_pad(pm_f, _GRAM_CHUNK)
    gram2 = _scan_design_gram(flat2, n_chunks2)
    s_tot = pm_f.shape[1]
    gram2 = gram2 + l2_post * jnp.eye(s_tot, dtype=dtype)
    a2 = jnp.concatenate(
        [
            jnp.zeros((n_aug, s_tot - n_aug), dtype=dtype),
            jnp.eye(n_aug, dtype=dtype),
        ],
        axis=1,
    )
    basis2 = jnp.eye(n_aug, dtype=dtype)
    x2, resid2 = eqp_solve_auglag(gram2, a2, basis2, return_resid=True)
    fmap2 = x2.T  # (n_aug, S+n_aug)

    # noise-contribution diagnostic (only meaningful for zero_stage2)
    mapped2 = jnp.einsum("aj,tjd->tad", fmap2, pm_f, precision="highest")
    remaining = jnp.mean(jnp.square(mapped2))
    del mc_real, aug_c  # coordinate outputs are not needed by any caller
    return fmap1, resid1, fmap2, resid2, remaining


def staged_gauss_fused(
    traj,
    coord_map,
    var: float,
    kbt: float,
    force_map=None,
    constraints=None,
    seed: Optional[int] = None,
    premap_l2_regularization: float = 0.0,
    l2_regularization: float = 0.0,
    zero_stage2: bool = False,
    resid_tol: float = 1e-4,
    mesh=None,
):
    """Run the fused staged-Gaussian pipeline; None if it does not apply.

    Applicability: device-resident trajectory, linear (or absent) premap
    force map. Returns (pre_tmap, pmapped_tmap, remaining)
    with the same object structure the piecewise builders assemble, or None
    when the caller should take the legacy path (including when a solve
    misses ``resid_tol`` — the legacy path owns float64 escalation).

    With ``mesh`` (1-D, axis "frames") the trajectory operands are
    frame-sharded over the devices and GSPMD partitions the one-program
    pipeline (XLA inserts the Gram all-reduces). Partitioning is
    value-semantic, so the noise draw stays draw-for-draw identical to the
    unsharded program — only f32 reduction order can differ.
    """
    import jax.random as jrandom

    from ..map import JLinearMap, LinearMap, SeperableTMap
    from ..qp.qplinear import constraint_labels

    if not isinstance(traj.coords, jax.Array) or not isinstance(
        traj.forces, jax.Array
    ):
        return None
    if force_map is not None and not isinstance(force_map, LinearMap):
        return None
    if constraints is None:
        constraints = set()

    from ..utils.devcache import device_const, device_scalar

    dtype = jnp.float32
    n = coord_map.n_fg_sites
    s = coord_map.n_cg_sites
    labels_np, r = constraint_labels(n, constraints)
    # constants memoized by content: repeat pipelines over one system
    # re-upload only the RNG key (each device_put is an RPC through
    # remote-attached tunnels)
    cmap_dev = device_const(coord_map.standard_matrix, dtype=np.float32)

    # the piecewise path's augmenter does exactly one key split per
    # augmentation; reproduce it so draws coincide
    if seed is None:
        seed = int(np.random.default_rng().integers(0, int(1e6)))
    rkey, _ = jrandom.split(jrandom.PRNGKey(seed))
    _, subkey = jrandom.split(rkey)

    fmap1_in = (
        device_const(force_map.standard_matrix, dtype=np.float32)
        if force_map is not None
        else None
    )
    coords_dev = jnp.asarray(traj.coords, dtype)
    forces_dev = jnp.asarray(traj.forces, dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        sharding = NamedSharding(mesh, P(axis))
        coords_dev = jax.device_put(coords_dev, sharding)
        forces_dev = jax.device_put(forces_dev, sharding)
    fmap1, resid1, fmap2, resid2, remaining = _staged_gauss_program(
        coords_dev,
        forces_dev,
        subkey,
        cmap_dev,
        device_const(labels_np, dtype=labels_np.dtype),
        fmap1_in,
        device_scalar(var),
        device_scalar(kbt),
        device_scalar(premap_l2_regularization),
        device_scalar(l2_regularization),
        r=r,
        n_aug=s,
        zero_stage2=zero_stage2,
        use_input_forcemap=force_map is not None,
    )
    # ONE host sync for both maps + both diagnostics + the noise check
    fmap1_np, r1, fmap2_np, r2, remaining = jax.device_get(
        (fmap1, resid1, fmap2, resid2, remaining)
    )
    fmap1_np = np.asarray(fmap1_np)
    fmap2_np = np.asarray(fmap2_np)
    ok = (
        np.all(np.isfinite(fmap1_np))
        and np.all(np.isfinite(fmap2_np))
        and float(r1) <= resid_tol
        and float(r2) <= resid_tol
    )  # NaN-aware by construction (isfinite + <=)
    if not ok:
        return None  # legacy path re-runs with float64 escalation

    if force_map is not None:
        pre_tmap = SeperableTMap(coord_map=coord_map, force_map=force_map)
    else:
        pre_tmap = SeperableTMap(
            coord_map=JLinearMap.from_linearmap(coord_map),
            force_map=JLinearMap(fmap1_np),
        )
    slice_map = LinearMap(
        mapping=[[i] for i in range(s, 2 * s)], n_fg_sites=2 * s
    )
    pmapped_tmap = SeperableTMap(
        coord_map=JLinearMap.from_linearmap(slice_map),
        force_map=JLinearMap(fmap2_np),
    )
    return pre_tmap, pmapped_tmap, float(remaining)
