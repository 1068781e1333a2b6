"""Optimized stochastic (Gaussian-noised) coordinate-force maps.

Behavior parity targets: reference qp/jgauss.py:27-140 (``joptgauss_map``),
:143-312 (``stagedjoptgauss_map``), :315-446 (``stagedjslicegauss_map``),
:449-650 (``stagedjforcegauss_map``). The flow of each builder matches the
reference; noising and log-gradient evaluation run on device through
:class:`aggforce_tpu.trajectory.JCondNormal` (closed-form gradients) and the
force-map optimizations go through the batched KKT solver.

Math note (mirrors reference jgauss.py:266-309): for a linear coordinate map
A and CG-level noise force f, A^T f back-maps the noise force to the
atomistic resolution (since grad_x f(Ax) = A^T [grad f](Ax)), so
``force_map @ coord_map.T`` as a source_postmap turns augmenter corrections
into already-coarse-grained force corrections.
"""

import warnings
from typing import Optional

import numpy as np

from ..constraints import Constraints
from ..map import (
    AugmentedTMap,
    ComposedTMap,
    JLinearMap,
    LinearMap,
    NullForcesTMap,
    RATMap,
    SeperableTMap,
    lmap_augvariables,
)
from ..trajectory import (
    AugmentedTrajectory,
    CoordsTrajectory,
    JCondNormal,
    Trajectory,
)
from .basicagg import constraint_aware_uni_map
from .qplinear import DEFAULT_SOLVER_OPTIONS, SolverOptions, qp_linear_map


def _noise_site_slice_map(n_total_sites: int, n_aug_sites: int) -> LinearMap:
    """LinearMap isolating the trailing ``n_aug_sites`` of a mapped system."""
    preserved = [[i] for i in range(n_total_sites - n_aug_sites, n_total_sites)]
    return LinearMap(mapping=preserved, n_fg_sites=n_total_sites)


def joptgauss_map(
    traj: Trajectory,
    coord_map: LinearMap,
    var: float,
    kbt: float,
    constraints: Optional[Constraints] = None,
    seed: Optional[int] = None,
    **kwargs,
) -> AugmentedTMap:
    """Optimized single-stage Gaussian map.

    Adds Gaussian noise to the coordinate-mapped positions as virtual
    particles, optimizes a linear force map on the augmented system that
    isolates the virtual sites, and wraps it so application re-noises fresh
    input trajectories. The result is stochastic and non-separable.
    """
    flattened_cmap = JLinearMap.from_linearmap(
        coord_map, bypass_nan_check=True
    ).flat_call
    augmenter = JCondNormal(cov=var, premap=flattened_cmap, seed=seed)
    aug_traj = AugmentedTrajectory.from_trajectory(t=traj, augmenter=augmenter, kbt=kbt)
    aug_coord_map = lmap_augvariables(aug_traj)
    # constraint indices refer to the leading (real) block of the augmented
    # system, so they remain valid unmodified.
    aug_tmap = qp_linear_map(
        traj=aug_traj, coord_map=aug_coord_map, constraints=constraints, **kwargs
    )
    return AugmentedTMap(aug_tmap=aug_tmap, augmenter=augmenter, kbt=kbt)


def _try_staged_fused(
    traj,
    coord_map,
    var,
    kbt,
    force_map,
    constraints,
    seed,
    premap_l2_regularization,
    premap_solver_args,
    kwargs,
    zero_stage2: bool,
    mesh=None,
):
    """Dispatch to the one-program staged pipeline when it applies.

    Conditions: device-resident float32 trajectory, device-eligible solver
    options, and second-stage kwargs limited to l2/solver knobs. Returns
    (pre_tmap, post_tmap, remaining) or None (callers then run the
    piecewise path, which owns the float64 escalation)."""
    import os

    if os.environ.get("AGGFORCE_STAGED_FUSED", "1") != "1":
        return None  # explicit opt-out (parity testing / debugging)
    if set(kwargs) - {"l2_regularization", "solver_args"}:
        return None
    pre_opts = premap_solver_args or {}
    post_opts = kwargs.get("solver_args") or {}
    if pre_opts.get("backend", "auto") not in ("auto", "device"):
        return None
    if post_opts.get("backend", "auto") not in ("auto", "device"):
        return None
    # custom solver tuning (delta/refine_iters) is honored only by the
    # piecewise fits; the fused program runs the default device solver
    for opts in (pre_opts, post_opts):
        if set(opts) - {"backend", "resid_tol"}:
            return None
    import jax

    if isinstance(traj.forces, jax.Array) and traj.forces.dtype == np.float64:
        return None  # "auto" means the host backend for f64 data

    from .jgauss_fused import staged_gauss_fused

    fused = staged_gauss_fused(
        traj,
        coord_map,
        var=var,
        kbt=kbt,
        force_map=force_map,
        constraints=constraints,
        seed=seed,
        premap_l2_regularization=premap_l2_regularization,
        l2_regularization=kwargs.get("l2_regularization", 0.0),
        zero_stage2=zero_stage2,
        resid_tol=min(
            pre_opts.get("resid_tol", 1e-4), post_opts.get("resid_tol", 1e-4)
        ),
        mesh=mesh,
    )
    if fused is None:
        return None
    pre_tmap, pmapped_tmap, remaining = fused
    j_coord_map = JLinearMap.from_linearmap(
        pre_tmap.coord_map, bypass_nan_check=True
    )
    j_force_map = JLinearMap.from_linearmap(
        pre_tmap.force_map, bypass_nan_check=True
    )
    pmapped_augmenter = JCondNormal(
        cov=var,
        source_postmap=(j_force_map @ j_coord_map.T),
        seed=seed,
    )
    post_tmap = AugmentedTMap(
        aug_tmap=pmapped_tmap, augmenter=pmapped_augmenter, kbt=kbt
    )
    return pre_tmap, post_tmap, remaining


def stagedjoptgauss_map(
    traj: Trajectory,
    coord_map: LinearMap,
    var: float,
    kbt: float,
    force_map: Optional[LinearMap] = None,
    constraints: Optional[Constraints] = None,
    seed: Optional[int] = None,
    premap_l2_regularization: float = 0.0,
    premap_solver_args: Optional[SolverOptions] = None,
    mesh=None,
    **kwargs,
) -> ComposedTMap:
    """Two-stage Gaussian map: deterministic premap, then noising map.

    Returns ComposedTMap([post, pre]): ``pre`` (index 1) linearly
    coarse-grains coords and forces; ``post`` (index 0) noises the
    already-mapped data and mixes in noise-derived forces. Data can be
    mapped with ``pre``, stored, and later finished with ``post``.

    Device-resident trajectories take the fused one-dispatch pipeline
    (:mod:`aggforce_tpu.qp.jgauss_fused`): both QP fits, the noise draw,
    and the real-block premapping run as ONE program with one host sync,
    instead of ~6 dispatches and two blocking fetches. With ``mesh``
    (1-D, axis "frames") the fused program's trajectory operands are
    frame-sharded over the devices (GSPMD partitions the pipeline); the
    piecewise fallback shards its premap Gram the same way.
    """
    if premap_solver_args is None:
        premap_solver_args = DEFAULT_SOLVER_OPTIONS
    fused = _try_staged_fused(
        traj, coord_map, var, kbt, force_map, constraints, seed,
        premap_l2_regularization, premap_solver_args, kwargs,
        zero_stage2=False, mesh=mesh,
    )
    if fused is not None:
        pre_tmap, post_tmap, _ = fused
        return ComposedTMap(submaps=[post_tmap, pre_tmap])
    if force_map is None:
        pre_tmap = qp_linear_map(
            traj=traj,
            coord_map=coord_map,
            constraints=constraints,
            l2_regularization=premap_l2_regularization,
            solver_args=premap_solver_args,
            mesh=mesh,
        )
    else:
        pre_tmap = SeperableTMap(coord_map=coord_map, force_map=force_map)

    j_coord_map = JLinearMap.from_linearmap(pre_tmap.coord_map, bypass_nan_check=True)  # type: ignore[arg-type]
    j_force_map = JLinearMap.from_linearmap(pre_tmap.force_map, bypass_nan_check=True)  # type: ignore[arg-type]

    augmenter = JCondNormal(cov=var, premap=j_coord_map.flat_call, seed=seed)
    aug_traj = AugmentedTrajectory.from_trajectory(t=traj, augmenter=augmenter, kbt=kbt)
    # coarse-grain only the real block, keeping the virtual sites
    pmapped_traj = RATMap(tmap=pre_tmap)(aug_traj)
    pmapped_coord_map = _noise_site_slice_map(
        pmapped_traj.n_sites, aug_traj.n_aug_sites
    )
    # constraints are assumed mapped away by any reasonable premap
    pmapped_tmap = qp_linear_map(
        traj=pmapped_traj, coord_map=pmapped_coord_map, constraints=set(), **kwargs
    )

    pmapped_augmenter = JCondNormal(
        cov=var,
        source_postmap=(j_force_map @ j_coord_map.T),
        seed=seed,
    )
    post_tmap = AugmentedTMap(
        aug_tmap=pmapped_tmap, augmenter=pmapped_augmenter, kbt=kbt
    )
    return ComposedTMap(submaps=[post_tmap, pre_tmap])


def stagedjslicegauss_map(
    traj: CoordsTrajectory,
    coord_map: LinearMap,
    var: float,
    kbt: float,
    seed: Optional[int] = None,
    constraints: Optional[Constraints] = None,  # noqa: ARG001
    warn_input_forces: bool = True,
) -> ComposedTMap:
    """Gaussian map reporting only noise-derived forces.

    The returned ComposedTMap has three stages: [2] fills (or replaces)
    forces with NaN so coordinate-only data flows, [1] coarse-grains the
    coordinates (with an all-ones dummy force map), [0] noises and slices out
    the noise sites and their forces. Input force data is ignored
    (optionally with a warning).
    """
    naforce_traj = NullForcesTMap(warn_input_forces=warn_input_forces)(traj)
    augmenter = JCondNormal(
        cov=var,
        premap=JLinearMap.from_linearmap(coord_map, bypass_nan_check=True).flat_call,
        seed=seed,
    )
    aug_traj = AugmentedTrajectory.from_trajectory(
        t=naforce_traj, augmenter=augmenter, kbt=kbt
    )
    null_fmap = LinearMap(
        mapping=np.ones_like(coord_map.standard_matrix), handle_nans=False
    )
    pre_tmap = SeperableTMap(coord_map=coord_map, force_map=null_fmap)
    pmapped_traj = RATMap(tmap=pre_tmap)(aug_traj)
    pmapped_coord_map = _noise_site_slice_map(
        pmapped_traj.n_sites, aug_traj.n_aug_sites
    )
    pmapped_tmap = constraint_aware_uni_map(
        traj=pmapped_traj, coord_map=pmapped_coord_map, constraints=set()
    )
    pmapped_augmenter = JCondNormal(cov=var, seed=seed)
    post_tmap = AugmentedTMap(
        aug_tmap=pmapped_tmap, augmenter=pmapped_augmenter, kbt=kbt
    )
    return ComposedTMap(
        submaps=[post_tmap, pre_tmap, NullForcesTMap(warn_input_forces=False)]
    )


def stagedjforcegauss_map(
    traj: Trajectory,
    coord_map: LinearMap,
    var: float,
    kbt: float,
    force_map: Optional[LinearMap] = None,
    constraints: Optional[Constraints] = None,
    seed: Optional[int] = None,
    premap_l2_regularization: float = 0.0,
    premap_solver_args: Optional[SolverOptions] = None,
    contribution_tolerance: float = 1e-6,
    **kwargs,
) -> ComposedTMap:
    """Staged Gaussian map minimizing noise-force contributions.

    Mirrors :func:`stagedjoptgauss_map`, but the second-stage optimization
    runs on a zero-force copy of the input so it minimizes *only* the
    noise-derived force signal; if the optimizer cannot cancel it below
    ``contribution_tolerance`` a warning is emitted. Device-resident
    trajectories take the fused one-dispatch pipeline, with the noise
    contribution computed in-program.
    """
    if premap_solver_args is None:
        premap_solver_args = DEFAULT_SOLVER_OPTIONS
    fused = _try_staged_fused(
        traj, coord_map, var, kbt, force_map, constraints, seed,
        premap_l2_regularization, premap_solver_args, kwargs,
        zero_stage2=True,
    )
    if fused is not None:
        pre_tmap, post_tmap, remaining = fused
        if remaining > contribution_tolerance:
            warnings.warn(
                "Unable to remove all noise contributions in forces. "
                f"Remaining contribution: {remaining}.",
                stacklevel=0,
            )
        return ComposedTMap(submaps=[post_tmap, pre_tmap])
    if force_map is None:
        pre_tmap = qp_linear_map(
            traj=traj,
            coord_map=coord_map,
            constraints=constraints,
            l2_regularization=premap_l2_regularization,
            solver_args=premap_solver_args,
        )
    else:
        pre_tmap = SeperableTMap(coord_map=coord_map, force_map=force_map)

    j_coord_map = JLinearMap.from_linearmap(pre_tmap.coord_map, bypass_nan_check=True)  # type: ignore[arg-type]
    j_force_map = JLinearMap.from_linearmap(pre_tmap.force_map, bypass_nan_check=True)  # type: ignore[arg-type]

    augmenter = JCondNormal(cov=var, premap=j_coord_map.flat_call, seed=seed)
    import jax

    if isinstance(traj.forces, jax.Array):
        import jax.numpy as jnp

        zero_forces = jnp.zeros_like(traj.forces)
    else:
        zero_forces = np.zeros_like(traj.forces)
    zeroforce_traj = Trajectory(coords=traj.coords, forces=zero_forces)
    aug_traj = AugmentedTrajectory.from_trajectory(
        t=zeroforce_traj, augmenter=augmenter, kbt=kbt
    )
    pmapped_traj = RATMap(tmap=pre_tmap)(aug_traj)
    pmapped_coord_map = _noise_site_slice_map(
        pmapped_traj.n_sites, aug_traj.n_aug_sites
    )
    pmapped_tmap = qp_linear_map(
        traj=pmapped_traj, coord_map=pmapped_coord_map, constraints=set(), **kwargs
    )

    remaining = float(np.mean(pmapped_tmap(pmapped_traj).forces ** 2))
    if remaining > contribution_tolerance:
        warnings.warn(
            "Unable to remove all noise contributions in forces. Remaining "
            f"contribution: {remaining}.",
            stacklevel=0,
        )

    pmapped_augmenter = JCondNormal(
        cov=var,
        source_postmap=(j_force_map @ j_coord_map.T),
        seed=seed,
    )
    post_tmap = AugmentedTMap(
        aug_tmap=pmapped_tmap, augmenter=pmapped_augmenter, kbt=kbt
    )
    return ComposedTMap(submaps=[post_tmap, pre_tmap])
