"""Device-residency of the noised-map pipeline.

VERDICT r1 flagged the Gaussian-map family as host-bound: the reference-style
pipeline shipped trajectory-sized arrays host<->device on every augment /
log-gradient call. These tests pin the fix: with jax-array inputs, every
stage of the augmented pipeline must return jax arrays (device-resident),
while numpy inputs keep returning numpy (reference API parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.map import JLinearMap, RATMap, SeperableTMap
from aggforce_tpu.qp.jgauss import joptgauss_map, stagedjoptgauss_map
from aggforce_tpu.trajectory import (
    AugmentedTrajectory,
    JCondNormal,
    Trajectory,
)


@pytest.fixture()
def small_system():
    rng = np.random.default_rng(3)
    coords = rng.normal(size=(64, 9, 3)).astype(np.float32)
    forces = rng.normal(size=(64, 9, 3)).astype(np.float32)
    cmap = LinearMap([[0, 1, 2], [3, 4, 5], [6, 7, 8]], n_fg_sites=9)
    return coords, forces, cmap


def test_jcondnormal_type_preserving(small_system):
    coords, _, cmap = small_system
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    aug = JCondNormal(cov=0.5, premap=premap, seed=1)

    out_np = aug.sample(coords)
    assert isinstance(out_np, np.ndarray)
    g1, g2 = aug.log_gradient(coords, out_np)
    assert isinstance(g1, np.ndarray) and isinstance(g2, np.ndarray)

    dev = jnp.asarray(coords)
    out_dev = aug.sample(dev)
    assert isinstance(out_dev, jax.Array)
    d1, d2 = aug.log_gradient(dev, out_dev)
    assert isinstance(d1, jax.Array) and isinstance(d2, jax.Array)


def test_augmented_trajectory_stays_on_device(small_system):
    coords, forces, cmap = small_system
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    aug = JCondNormal(cov=0.5, premap=premap, seed=1)
    traj = AugmentedTrajectory(
        coords=jnp.asarray(coords),
        forces=jnp.asarray(forces),
        augmenter=aug,
        kbt=0.7,
    )
    assert isinstance(traj.coords, jax.Array)
    assert isinstance(traj.forces, jax.Array)
    traj.refresh()
    assert isinstance(traj.coords, jax.Array)
    # numpy input keeps numpy output (reference parity)
    traj_np = AugmentedTrajectory(
        coords=coords, forces=forces, augmenter=aug, kbt=0.7
    )
    assert isinstance(traj_np.coords, np.ndarray)


def test_ratmap_stays_on_device(small_system):
    coords, forces, cmap = small_system
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True)
    aug = JCondNormal(cov=0.5, premap=premap.flat_call, seed=1)
    traj = AugmentedTrajectory(
        coords=jnp.asarray(coords),
        forces=jnp.asarray(forces),
        augmenter=aug,
        kbt=0.7,
    )
    pre = SeperableTMap(coord_map=premap, force_map=premap)
    out = RATMap(tmap=pre)(traj)
    assert isinstance(out.coords, jax.Array)
    assert isinstance(out.forces, jax.Array)


def test_joptgauss_device_end_to_end(small_system):
    """Device trajectory in -> device mapped trajectory out, values parity
    with the numpy-input pipeline under the same seed."""
    coords, forces, cmap = small_system
    traj_dev = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    tmap_dev = joptgauss_map(traj_dev, cmap, var=0.3, kbt=0.7, seed=11)
    out_dev = tmap_dev(traj_dev)
    assert isinstance(out_dev.coords, jax.Array)
    assert isinstance(out_dev.forces, jax.Array)

    traj_np = Trajectory(coords=coords, forces=forces)
    tmap_np = joptgauss_map(traj_np, cmap, var=0.3, kbt=0.7, seed=11)
    out_np = tmap_np(traj_np)
    np.testing.assert_allclose(
        np.asarray(out_dev.coords), out_np.coords, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_dev.forces), out_np.forces, atol=1e-4
    )


def test_stagedjopt_device_end_to_end(small_system):
    coords, forces, cmap = small_system
    traj_dev = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    tmap = stagedjoptgauss_map(traj_dev, cmap, var=0.3, kbt=0.7, seed=11)
    out = tmap(traj_dev)
    assert isinstance(out.coords, jax.Array)
    assert isinstance(out.forces, jax.Array)
    assert np.all(np.isfinite(np.asarray(out.forces)))


def test_fused_augment_matches_piecewise(small_system):
    """The one-dispatch augmentation must be draw-for-draw identical to
    sample() + log_gradient() from the same RNG state."""
    coords, forces, cmap = small_system
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    kbt = 0.7
    dev_c, dev_f = jnp.asarray(coords), jnp.asarray(forces)

    aug_a = JCondNormal(cov=0.5, premap=premap, seed=9)
    fused = aug_a.fused_augment(dev_c, dev_f, kbt)
    assert fused is not None
    fc, ff = fused

    aug_b = JCondNormal(cov=0.5, premap=premap, seed=9)
    y = aug_b.sample(dev_c)
    gx, gy = aug_b.log_gradient(dev_c, y)
    exp_c = jnp.concatenate([dev_c, y], axis=1)
    exp_f = jnp.concatenate([dev_f + kbt * gx, kbt * gy], axis=1)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(exp_c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(exp_f), atol=1e-5)

    # piecewise-only cases return None (host input; postmap; matrix cov)
    assert aug_a.fused_augment(coords, forces, kbt) is None
    aug_pm = JCondNormal(cov=0.5, premap=premap, source_postmap=lambda x: x, seed=9)
    assert aug_pm.fused_augment(dev_c, dev_f, kbt) is None


def test_augmented_trajectory_uses_fused_path(small_system, monkeypatch):
    """AugmentedTrajectory must route device inputs through fused_augment."""
    coords, forces, cmap = small_system
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    aug = JCondNormal(cov=0.5, premap=premap, seed=1)
    calls = []
    orig = aug.fused_augment

    def spy(c, f, kbt):
        out = orig(c, f, kbt)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(aug, "fused_augment", spy)
    traj = AugmentedTrajectory(
        coords=jnp.asarray(coords), forces=jnp.asarray(forces),
        augmenter=aug, kbt=0.7,
    )
    assert calls == [True]
    assert isinstance(traj.coords, jax.Array)


def test_fused_map_apply_matches_piecewise(small_system):
    """AugmentedTMap application must be draw-for-draw identical whether it
    runs as the fused one-program apply or the piecewise path."""
    from aggforce_tpu.map import SeperableTMap
    from aggforce_tpu.trajectory import AugmentedTrajectory as AT

    coords, forces, cmap = small_system
    dev_c, dev_f = jnp.asarray(coords), jnp.asarray(forces)
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    n_aug_total = coords.shape[1] + cmap.n_cg_sites
    inner_c = JLinearMap(
        np.eye(n_aug_total, dtype=np.float32)[: cmap.n_cg_sites]
    )
    inner_f = JLinearMap(
        np.eye(n_aug_total, dtype=np.float32)[cmap.n_cg_sites :][:3]
    )
    from aggforce_tpu.map.tmap import AugmentedTMap

    aug_a = JCondNormal(cov=0.5, premap=premap, seed=21)
    tmap_a = AugmentedTMap(
        aug_tmap=SeperableTMap(coord_map=inner_c, force_map=inner_f),
        augmenter=aug_a, kbt=0.7,
    )
    out_a = tmap_a(Trajectory(coords=dev_c, forces=dev_f))

    # piecewise: same seed, manual augment + map
    aug_b = JCondNormal(cov=0.5, premap=premap, seed=21)
    at = AT(coords=dev_c, forces=dev_f, augmenter=aug_b, kbt=0.7)
    exp_c = inner_c(at.coords)
    exp_f = inner_f(at.forces)
    np.testing.assert_allclose(np.asarray(out_a.coords), np.asarray(exp_c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a.forces), np.asarray(exp_f), atol=1e-5)
    assert isinstance(out_a.coords, jax.Array)


def test_fused_map_apply_nan_verdict(small_system):
    """The in-program NaN verdict must raise exactly like the legacy path."""
    from aggforce_tpu.map import SeperableTMap
    from aggforce_tpu.map.tmap import AugmentedTMap

    coords, forces, cmap = small_system
    coords = coords.copy()
    coords[0, 0, 0] = np.nan  # participates in every dense map row
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    n_aug_total = coords.shape[1] + cmap.n_cg_sites
    dense = JLinearMap(
        np.full((2, n_aug_total), 0.5, dtype=np.float32)
    )
    aug = JCondNormal(cov=0.5, premap=premap, seed=3)
    tmap = AugmentedTMap(
        aug_tmap=SeperableTMap(coord_map=dense, force_map=dense),
        augmenter=aug, kbt=0.7,
    )
    with pytest.raises(ValueError, match="NaN handling"):
        tmap(Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces)))


def test_bypass_premap_fills_nans_like_legacy(small_system):
    """A handle_nans premap with bypass_nan_check acts on NaN->0-filled
    input (bypass skips only the raise); the matrix-operand fast path must
    fill identically, so NaN coords yield finite virtual sites and the
    noised-map application of such trajectories does not raise."""
    coords, forces, cmap = small_system
    coords = coords.copy()
    coords[0, 1, :] = np.nan
    premap = JLinearMap.from_linearmap(cmap, bypass_nan_check=True).flat_call
    aug = JCondNormal(cov=0.5, premap=premap, seed=2)
    y = aug.sample(jnp.asarray(coords))
    assert np.all(np.isfinite(np.asarray(y)))
    gx, gy = aug.log_gradient(jnp.asarray(coords), y)
    # the VJP of a filled premap is zero at NaN input positions
    assert np.all(np.asarray(gx)[0, 1, :] == 0.0)
    assert np.all(np.isfinite(np.asarray(gy)))

    # the fused one-dispatch augmentation agrees
    aug2 = JCondNormal(cov=0.5, premap=premap, seed=2)
    fc, ff = aug2.fused_augment(jnp.asarray(coords), jnp.asarray(forces), 0.7)
    n_real = coords.shape[1]
    assert np.all(np.isfinite(np.asarray(fc)[:, n_real:]))  # virtual block
    np.testing.assert_allclose(
        np.asarray(fc)[:, n_real:], np.asarray(y), atol=1e-6
    )


def test_fused_featurized_apply_stays_on_device(waterdimer):
    """CLAFTMap application of a fused featurized map keeps device inputs
    on device end to end (coords through the JLinearMap coordinate map,
    forces through the chunked FusedGBMap kernel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:120].astype(np.float32)
    forces = waterdimer["forces"][:120].astype(np.float32)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces), cmap,
        kbt=0.5, spec=GBFeatSpec(outer=1.0, n_basis=3), constraints=set(),
        l2_regularization=1e3, constraint_rng=np.random.default_rng(0),
    )
    out = tmap(
        Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    )
    assert isinstance(out.coords, jax.Array)
    assert isinstance(out.forces, jax.Array)
    # numpy input still returns numpy (CLAMap host semantics preserved)
    out_np = tmap(Trajectory(coords=coords, forces=forces))
    assert isinstance(out_np.forces, np.ndarray)
    np.testing.assert_allclose(
        np.asarray(out.forces), out_np.forces, atol=1e-5
    )
