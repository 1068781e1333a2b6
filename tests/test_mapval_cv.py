"""Validation metrics (jaxmapval) and cross-validation driver."""

import jax.numpy as jnp
import numpy as np
import pytest

from aggforce_tpu import LinearMap, jaxmapval as mv
from aggforce_tpu.agg import (
    NRUNS_KNAME,
    SCORES_KNAME,
    SDS_KNAME,
    force_smoothness,
    process_cvargs,
    project_forces_grid_cv,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(5)


def test_mscg_ip(rng):
    f = rng.normal(size=(10, 4, 3))
    g = rng.normal(size=(10, 4, 3))
    expect = (f * g).sum() / 10
    assert np.isclose(mv.mscg_ip(f, g), expect)


def test_sq_gaussian_forces_are_gradients(rng):
    """Forces must equal -d(energy)/d(positions) (finite differences)."""
    pos = rng.normal(size=(2, 3, 3)).astype(np.float64)
    offset, width = 0.5, 0.8
    forces = np.asarray(mv.sq_gaussian_forces(jnp.asarray(pos), offset, width))
    eps = 1e-2  # float32 evaluation: balance truncation vs rounding error
    for idx in [(0, 0, 0), (1, 2, 1)]:
        p_plus = pos.copy()
        p_plus[idx] += eps
        p_minus = pos.copy()
        p_minus[idx] -= eps
        e_plus = np.asarray(
            mv.sq_gaussian_energies(jnp.asarray(p_plus), offset, width)
        ).sum()
        e_minus = np.asarray(
            mv.sq_gaussian_energies(jnp.asarray(p_minus), offset, width)
        ).sum()
        fd = -(e_plus - e_minus) / (2 * eps)
        np.testing.assert_allclose(forces[idx], fd, atol=5e-3)


def test_random_uniform_forces(rng):
    pos = rng.normal(size=(6, 4, 3))
    f = mv.random_uniform_forces(pos, scale=2.0, randg=np.random.default_rng(0))
    assert f.shape == pos.shape
    np.testing.assert_allclose(np.linalg.norm(f[0, 0]), 2.0, atol=1e-10)
    # identical across frames and sites
    assert np.ptp(f, axis=(0, 1)).max() < 1e-12


def test_random_force_proj_fast_matches_loop(rng):
    coords = rng.normal(size=(20, 3, 3)).astype(np.float32)
    forces = rng.normal(size=(20, 3, 3)).astype(np.float32)
    kwargs = dict(inner=0.1, outer=1.0, width=0.5)
    fast = mv.random_force_proj(
        coords, forces, n_samples=7, randg=np.random.default_rng(9),
        average=False, **kwargs,
    )
    # manual loop with the same generator stream
    randg = np.random.default_rng(9)
    slow = [
        mv.mscg_ip(forces, np.asarray(mv.rsqpg_forces(coords, randg=randg, **kwargs)))
        for _ in range(7)
    ]
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=1e-4)


def test_random_residual_shift_fast_matches_loop(rng):
    coords = rng.normal(size=(15, 3, 3)).astype(np.float32)
    forces = rng.normal(size=(15, 3, 3)).astype(np.float32)
    kwargs = dict(inner=0.1, outer=1.0, width=0.5)
    fast = mv.random_residual_shift(
        coords, forces, n_samples=5, randg=np.random.default_rng(4),
        average=False, **kwargs,
    )
    randg = np.random.default_rng(4)
    fs = force_smoothness(forces)
    slow = [
        force_smoothness(forces - np.asarray(mv.rsqpg_forces(coords, randg=randg, **kwargs))) - fs
        for _ in range(5)
    ]
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=1e-4)
    avg = mv.random_residual_shift(
        coords, forces, n_samples=5, randg=np.random.default_rng(4),
        average=True, **kwargs,
    )
    np.testing.assert_allclose(avg, np.mean(slow), rtol=1e-3)


def test_process_cvargs():
    grid = process_cvargs({"a": [1, 2], "b": ["x"]})
    assert len(grid) == 2
    labels = [label for label, _ in grid]
    kwargs = [kw for _, kw in grid]
    assert kwargs[0] == {"a": 1, "b": "x"}
    assert kwargs[1] == {"a": 2, "b": "x"}
    assert labels[0].a == 1 and labels[0].b == "x"


def test_grid_cv_runs(waterdimer):
    forces = waterdimer["forces"][:200]
    coords = waterdimer["coords"][:200]
    cmap = LinearMap([[0], [3]], n_fg_sites=6, handle_nans=False)
    out = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [0.0, 1e2]},
        coords=coords,
        forces=forces,
        n_folds=3,
        coord_map=cmap,
        constrained_inds=set(),
        rng=np.random.default_rng(0),
    )
    assert set(out.keys()) == {SCORES_KNAME, SDS_KNAME, NRUNS_KNAME}
    assert len(out[SCORES_KNAME]) == 2
    for label, score in out[SCORES_KNAME].items():
        assert score is not None and np.isfinite(score)
    for label, n in out[NRUNS_KNAME].items():
        assert n == 3
