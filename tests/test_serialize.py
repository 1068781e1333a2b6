"""TMap serialization round trips."""

import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.map import (
    AugmentedTMap,
    ComposedTMap,
    JLinearMap,
    NullForcesTMap,
    RATMap,
    SeperableTMap,
)
from aggforce_tpu.trajectory import JCondNormal, SimpleCondNormal
from aggforce_tpu.utils.serialize import load_tmap, save_tmap


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def roundtrip(tmp_path, tmap):
    path = str(tmp_path / "map.npz")
    save_tmap(path, tmap)
    return load_tmap(path)


def test_linear_roundtrip(tmp_path, rng):
    lm = LinearMap(rng.normal(size=(2, 5)), handle_nans=False)
    lm2 = roundtrip(tmp_path, lm)
    np.testing.assert_array_equal(lm2.standard_matrix, lm.standard_matrix)
    assert lm2.handle_nans is False


def test_jlinear_roundtrip(tmp_path, rng):
    jlm = JLinearMap(rng.normal(size=(2, 5)), bypass_nan_check=True)
    jlm2 = roundtrip(tmp_path, jlm)
    assert isinstance(jlm2, JLinearMap)
    assert jlm2.bypass_nan_check
    np.testing.assert_array_equal(jlm2.standard_matrix, jlm.standard_matrix)


def test_seperable_roundtrip(tmp_path, rng):
    tmap = SeperableTMap(
        coord_map=LinearMap(rng.normal(size=(2, 5))),
        force_map=LinearMap(rng.normal(size=(2, 5))),
    )
    tmap2 = roundtrip(tmp_path, tmap)
    coords = rng.normal(size=(4, 5, 3))
    forces = rng.normal(size=(4, 5, 3))
    np.testing.assert_allclose(
        tmap2.map_arrays(coords, forces)[1],
        tmap.map_arrays(coords, forces)[1],
        atol=1e-12,
    )


def test_gauss_map_roundtrip(tmp_path, rng):
    """AugmentedTMap with a JCondNormal (linear premap) round trips and
    reproduces the same noise stream (RNG state is preserved)."""
    cmap = JLinearMap(np.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]]),
                      bypass_nan_check=True)
    augmenter = JCondNormal(cov=0.01, premap=cmap.flat_call, seed=9)
    inner = SeperableTMap(
        coord_map=LinearMap(np.eye(5), handle_nans=False),
        force_map=LinearMap(np.eye(5), handle_nans=False),
    )
    tmap = AugmentedTMap(aug_tmap=inner, augmenter=augmenter, kbt=0.7)
    tmap2 = roundtrip(tmp_path, tmap)
    coords = rng.normal(size=(6, 3, 3)).astype(np.float32)
    forces = rng.normal(size=(6, 3, 3)).astype(np.float32)
    a = tmap.map_arrays(coords, forces)
    b = tmap2.map_arrays(coords, forces)
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)
    np.testing.assert_allclose(a[1], b[1], atol=1e-5)


def test_composed_nullforces_ratmap_roundtrip(tmp_path, rng):
    tmap = ComposedTMap(
        [
            RATMap(
                SeperableTMap(
                    LinearMap(np.eye(3), handle_nans=False),
                    LinearMap(np.eye(3), handle_nans=False),
                )
            ),
            NullForcesTMap(warn_input_forces=False, fill_value=0.0),
        ]
    )
    tmap2 = roundtrip(tmp_path, tmap)
    assert isinstance(tmap2[1], NullForcesTMap)
    assert tmap2[1].fill_value == 0.0
    assert isinstance(tmap2[0], RATMap)


def test_simple_augmenter_roundtrip(tmp_path):
    tmap = AugmentedTMap(
        aug_tmap=SeperableTMap(
            LinearMap(np.eye(4), handle_nans=False),
            LinearMap(np.eye(4), handle_nans=False),
        ),
        augmenter=SimpleCondNormal(var=0.2, dtype=np.float64),
        kbt=1.1,
    )
    tmap2 = roundtrip(tmp_path, tmap)
    assert tmap2.augmenter.var == 0.2
    assert tmap2.kbt == 1.1


def test_closure_map_rejected(tmp_path):
    from aggforce_tpu.map import CLAFTMap, CLAMap

    clam = CLAMap(
        scale=lambda c: np.ones((c.shape[0], 1, 2)),
        trans=lambda c: np.zeros((c.shape[0], 1, 3)),
        n_fg_sites=2,
    )
    with pytest.raises(ValueError):
        save_tmap(str(tmp_path / "x.npz"), CLAFTMap(LinearMap(np.eye(2)), clam))


def test_mesh_fitted_fused_map_roundtrip(tmp_path, waterdimer):
    """Maps fitted over a mesh serialize/deserialize like single-device ones."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) mesh")
    from aggforce_tpu.parallel import make_mesh
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:120]
    forces = waterdimer["forces"][:120]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        kbt=0.7,
        spec=GBFeatSpec(outer=1.5, n_basis=4),
        constraints={frozenset({1, 2})},
        l2_regularization=1.0,
        constraint_rng=np.random.default_rng(0),
        mesh=make_mesh(axis_name="frames"),
    )
    path = str(tmp_path / "mesh_fused.npz")
    save_tmap(path, tmap)
    loaded = load_tmap(path)
    _, f0 = tmap.map_arrays(coords[:10], forces[:10])
    _, f1 = loaded.map_arrays(coords[:10], forces[:10])
    np.testing.assert_allclose(f1, f0, atol=1e-6)


def test_fused_staged_map_roundtrip(tmp_path, rng):
    """A staged Gaussian map built by the FUSED one-dispatch pipeline must
    serialize and reproduce its deterministic (seeded) application."""
    import jax.numpy as jnp

    from aggforce_tpu.qp.jgauss import stagedjoptgauss_map
    from aggforce_tpu.trajectory import Trajectory

    n = 9
    coords = rng.normal(size=(80, n, 3)).astype(np.float32)
    forces = rng.normal(size=(80, n, 3)).astype(np.float32)
    cmap = LinearMap([[0], [3], [6]], n_fg_sites=n)
    traj = Trajectory(
        coords=jnp.asarray(coords), forces=jnp.asarray(forces)
    )  # device-resident -> fused pipeline engaged
    tmap = stagedjoptgauss_map(
        traj=traj, coord_map=cmap, var=0.01, kbt=0.7,
        constraints={frozenset({1, 2})}, seed=21,
    )
    tmap2 = roundtrip(tmp_path, tmap)
    a = tmap.map_arrays(coords[:8], forces[:8])
    b = tmap2.map_arrays(coords[:8], forces[:8])
    # the post augmenter's PRNG state round-trips, so draws coincide
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)


def test_fused_map_tags_survive_roundtrip(tmp_path):
    """solver_resid (observability) and coef_list survive save/load for
    FusedGBMap force maps — including maps packaged with _LazyCoefTags,
    whose serialization is itself a host-array demand (review gap)."""
    import jax.numpy as jnp

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        _LazyCoefTags,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(0)
    coords = rng.normal(size=(96, 6, 3)).astype(np.float32)
    forces = rng.normal(size=(96, 6, 3)).astype(np.float32)
    traj = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    # loose resid_tol -> converged device path -> _LazyCoefTags packaging
    t = fused_gb_linear_map_batch(
        traj, cmap, seeds=[0], kbt=0.5,
        spec=GBFeatSpec(outer=1.0, n_basis=3), constraints=set(),
        l2_regularization=1e3, resid_tol=0.5,
    )[0]
    assert isinstance(t.force_map.tags, _LazyCoefTags)
    path = str(tmp_path / "fused_tags.npz")
    save_tmap(path, t)
    t2 = load_tmap(path)
    np.testing.assert_array_equal(
        np.stack(t.force_map.tags["coef_list"]),
        np.stack(t2.force_map.tags["coef_list"]),
    )
    assert t2.force_map.tags["solver_resid"] == pytest.approx(
        t.force_map.tags["solver_resid"]
    )
