"""Warm-up subsystem: background program prep matches the real fit."""

import numpy as np

from aggforce_tpu import LinearMap
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
from aggforce_tpu.trajectory import Trajectory
from aggforce_tpu.utils.warmup import (
    warm_featurized_fit,
    warm_gauss_fit,
    warm_linear_fit,
)


def _system():
    rng = np.random.default_rng(3)
    n_fg = 12
    cmap = LinearMap([[0], [4], [8]], n_fg_sites=n_fg)
    constraints = {frozenset({1, 2}), frozenset({5, 6})}
    coords = rng.normal(size=(64, n_fg, 3)).astype(np.float32)
    forces = rng.normal(size=(64, n_fg, 3)).astype(np.float32)
    return cmap, constraints, coords, forces


def test_warm_featurized_fit_completes_and_matches_real_fit():
    cmap, constraints, coords, forces = _system()
    spec = GBFeatSpec(outer=2.0, n_basis=3)
    handle = warm_featurized_fit(
        64, cmap, spec, constraints, chunk_size=32, solver_iters=40
    )
    handle.wait()
    assert handle.done
    assert handle.error is None, handle.error
    assert handle.elapsed is not None and handle.elapsed > 0.0

    # the real fit must run through the exact program the warm-up prepared
    # (same shapes + statics); correctness is unchanged
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        kbt=0.7,
        spec=spec,
        constraints=constraints,
        chunk_size=32,
        constraint_rng=np.random.default_rng(0),
    )
    mc, mf = tmap.map_arrays(coords[:8], forces[:8])
    assert np.all(np.isfinite(mf))


def test_warm_linear_and_gauss_handles():
    cmap, constraints, _, _ = _system()
    h1 = warm_linear_fit(64, cmap, constraints)
    h2 = warm_gauss_fit(64, cmap, var=0.1, constraints=constraints)
    h1.wait()
    h2.wait()
    assert h1.error is None, h1.error
    assert h2.error is None, h2.error


def test_warmup_errors_are_recorded_not_raised():
    # bogus coordinate map (zero sites) must fail inside the thread and be
    # reported on the handle, never raised into the caller
    bad = object()
    handle = warm_linear_fit(8, bad)
    wait = handle.wait()
    assert wait >= 0.0
    assert handle.error is not None


def test_warm_featurized_fit_with_mesh():
    from aggforce_tpu.parallel import make_mesh

    cmap, constraints, coords, forces = _system()
    spec = GBFeatSpec(outer=2.0, n_basis=3)
    mesh = make_mesh(axis_name="frames")
    handle = warm_featurized_fit(
        64, cmap, spec, constraints, chunk_size=16, mesh=mesh
    )
    handle.wait()
    assert handle.error is None, handle.error
    # the warmed mesh program serves the real sharded fit
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap, kbt=0.7, spec=spec, constraints=constraints, chunk_size=16,
        constraint_rng=np.random.default_rng(0), mesh=mesh,
    )
    mc, mf = tmap.map_arrays(coords[:8], forces[:8])
    assert np.all(np.isfinite(mf))


def test_warm_featurized_batch_completes():
    from aggforce_tpu.qp.fusedfeat import fused_gb_linear_map_batch
    from aggforce_tpu.utils.warmup import warm_featurized_batch

    cmap, constraints, coords, forces = _system()
    spec = GBFeatSpec(outer=2.0, n_basis=3)
    handle = warm_featurized_batch(
        64, cmap, spec, constraints, batch=4, chunk_size=32
    )
    handle.wait()
    assert handle.error is None, handle.error
    # the warmed program serves the real batch fit
    maps = fused_gb_linear_map_batch(
        Trajectory(coords=coords, forces=forces), cmap,
        kbt=0.7, spec=spec, seeds=range(4), constraints=constraints,
        chunk_size=32, flush_every=4,
    )
    assert len(maps) == 4
