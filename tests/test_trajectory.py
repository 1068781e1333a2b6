"""Trajectory containers and AugmentedTrajectory semantics."""

import numpy as np
import pytest

from aggforce_tpu.trajectory import (
    AugmentedTrajectory,
    CoordsTrajectory,
    ForcesTrajectory,
    SimpleCondNormal,
    Trajectory,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(21)


def test_shape_validation(rng):
    with pytest.raises(ValueError):
        Trajectory(coords=rng.normal(size=(3, 4, 3)), forces=rng.normal(size=(3, 5, 3)))
    with pytest.raises(ValueError):
        ForcesTrajectory(forces=rng.normal(size=(3, 4)))
    with pytest.raises(ValueError):
        CoordsTrajectory(coords=rng.normal(size=(4,)))


def test_slicing_and_copy(rng):
    c = rng.normal(size=(10, 4, 3))
    f = rng.normal(size=(10, 4, 3))
    t = Trajectory(coords=c, forces=f)
    assert len(t) == 10
    assert t.n_sites == 4
    assert t.n_dim == 3
    sub = t[2:5]
    assert isinstance(sub, Trajectory)
    np.testing.assert_array_equal(sub.coords, c[2:5])
    with pytest.raises(ValueError):
        t[3]
    cp = t.copy()
    cp.coords[0, 0, 0] = 99.0
    assert t.coords[0, 0, 0] != 99.0
    t32 = t.astype(np.float32)
    assert t32.coords.dtype == np.float32


def test_augmented_trajectory_layout(rng):
    c = rng.normal(size=(8, 5, 3)).astype(np.float32)
    f = rng.normal(size=(8, 5, 3)).astype(np.float32)
    aug = AugmentedTrajectory(
        coords=c,
        forces=f,
        augmenter=SimpleCondNormal(var=0.1, seed=3),
        kbt=2.0,
    )
    assert aug.n_real_sites == 5
    assert aug.n_aug_sites == 5
    assert aug.n_sites == 10
    np.testing.assert_array_equal(aug.real_coords, c)
    np.testing.assert_array_equal(aug.real_forces, f)
    # real coords pass through unchanged in the leading block
    np.testing.assert_array_equal(aug.coords[:, aug.real_slice, :], c)
    with pytest.raises(ValueError):
        aug.real_coords = c
    with pytest.raises(ValueError):
        aug.real_forces = f


def test_augmented_force_structure(rng):
    """Forces must be [f + kbt*grad_x, kbt*grad_y] with closed-form grads."""
    c = rng.normal(size=(6, 3, 3)).astype(np.float64)
    f = rng.normal(size=(6, 3, 3)).astype(np.float64)
    var, kbt = 0.25, 1.7
    augmenter = SimpleCondNormal(var=var, seed=11, dtype=np.float64)
    aug = AugmentedTrajectory(coords=c, forces=f, augmenter=augmenter, kbt=kbt)
    y = aug.coords[:, aug.aug_slice, :]
    expected_gen = -(y - c) / var
    np.testing.assert_allclose(
        aug.forces[:, aug.aug_slice, :], kbt * expected_gen, atol=1e-10
    )
    np.testing.assert_allclose(
        aug.forces[:, aug.real_slice, :], f - kbt * expected_gen, atol=1e-10
    )


def test_refresh_changes_noise(rng):
    c = rng.normal(size=(4, 3, 3)).astype(np.float32)
    f = rng.normal(size=(4, 3, 3)).astype(np.float32)
    aug = AugmentedTrajectory(
        coords=c, forces=f, augmenter=SimpleCondNormal(var=0.5, seed=0), kbt=1.0
    )
    before = aug.coords.copy()
    aug.refresh()
    assert not np.allclose(before[:, aug.aug_slice, :], aug.coords[:, aug.aug_slice, :])
    np.testing.assert_array_equal(aug.coords[:, aug.real_slice, :], c)


def test_slicing_preserves_noise(rng):
    c = rng.normal(size=(9, 3, 3)).astype(np.float32)
    f = rng.normal(size=(9, 3, 3)).astype(np.float32)
    aug = AugmentedTrajectory(
        coords=c, forces=f, augmenter=SimpleCondNormal(var=0.5, seed=0), kbt=1.0
    )
    sub = aug[1:4]
    assert isinstance(sub, AugmentedTrajectory)
    np.testing.assert_array_equal(sub.coords, aug.coords[1:4])
    np.testing.assert_array_equal(sub.forces, aug.forces[1:4])


def test_pullback(rng):
    c = rng.normal(size=(5, 3, 3)).astype(np.float32)
    f = rng.normal(size=(5, 3, 3)).astype(np.float32)
    aug = AugmentedTrajectory(
        coords=c, forces=f, augmenter=SimpleCondNormal(var=0.5, seed=0), kbt=1.0
    )

    def n_total_sites(a: AugmentedTrajectory) -> int:
        return a.n_sites

    assert aug.pullback(n_total_sites)(Trajectory(coords=c, forces=f)) == 6
    assert aug.pullback(n_total_sites, array=True)(c, f) == 6


def test_from_trajectory(rng):
    c = rng.normal(size=(5, 3, 3)).astype(np.float32)
    f = rng.normal(size=(5, 3, 3)).astype(np.float32)
    aug = AugmentedTrajectory.from_trajectory(
        Trajectory(coords=c, forces=f),
        kbt=1.0,
        augmenter=SimpleCondNormal(var=0.5, seed=0),
    )
    assert aug.n_real_sites == 3
