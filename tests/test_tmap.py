"""TMap family semantics."""

import numpy as np
import pytest

from aggforce_tpu.map import (
    AugmentedTMap,
    CLAFTMap,
    CLAMap,
    ComposedTMap,
    LinearMap,
    NullForcesTMap,
    RATMap,
    SeperableTMap,
    lmap_augvariables,
    smear_map,
)
from aggforce_tpu.trajectory import (
    AugmentedTrajectory,
    CoordsTrajectory,
    SimpleCondNormal,
    Trajectory,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(33)


@pytest.fixture()
def traj(rng):
    return Trajectory(
        coords=rng.normal(size=(6, 4, 3)), forces=rng.normal(size=(6, 4, 3))
    )


def test_seperable_tmap(traj, rng):
    cmat = rng.normal(size=(2, 4))
    fmat = rng.normal(size=(2, 4))
    tmap = SeperableTMap(coord_map=LinearMap(cmat), force_map=LinearMap(fmat))
    out = tmap(traj)
    np.testing.assert_allclose(out.coords, LinearMap(cmat)(traj.coords))
    np.testing.assert_allclose(out.forces, LinearMap(fmat)(traj.forces))
    c, f = tmap.map_arrays(traj.coords, traj.forces)
    np.testing.assert_allclose(c, out.coords)
    t32 = tmap.astype(np.float32)
    assert t32.coord_map.standard_matrix.dtype == np.float32


def test_seperable_astype_requires_support(traj):
    tmap = SeperableTMap(coord_map=lambda x: x, force_map=lambda x: x)
    with pytest.raises(TypeError):
        tmap.astype(np.float32)


def test_claftmap(traj, rng):
    cmat = rng.normal(size=(2, 4))
    scale_mat = rng.normal(size=(2, 4))

    def scale(copoints):
        return np.broadcast_to(scale_mat, (copoints.shape[0],) + scale_mat.shape)

    def trans(copoints):
        return copoints[:, :2, :] * 0.5

    clam = CLAMap(scale=scale, trans=trans, n_fg_sites=4)
    tmap = CLAFTMap(coord_map=LinearMap(cmat), force_map=clam)
    out = tmap(traj)
    expect_f = np.einsum("tfd,cf->tcd", traj.forces, scale_mat) + traj.coords[:, :2] * 0.5
    np.testing.assert_allclose(out.forces, expect_f, atol=1e-12)


def test_composed_tmap_order(traj, rng):
    a = rng.normal(size=(3, 4))
    b = rng.normal(size=(2, 3))
    first = SeperableTMap(LinearMap(a), LinearMap(a))
    second = SeperableTMap(LinearMap(b), LinearMap(b))
    comp = ComposedTMap([second, first])  # rightmost applied first
    out = comp(traj)
    np.testing.assert_allclose(
        out.coords, LinearMap(b @ a)(traj.coords), atol=1e-12
    )
    assert comp[0] is second
    assert comp[1] is first


def test_null_forces_tmap(rng):
    coords = rng.normal(size=(4, 3, 3))
    nf = NullForcesTMap(warn_input_forces=False)
    out = nf(CoordsTrajectory(coords=coords))
    assert np.isnan(out.forces).all()
    np.testing.assert_array_equal(out.coords, coords)
    c, f = nf.map_arrays(coords)
    assert np.isnan(f).all()
    with pytest.warns(UserWarning):
        NullForcesTMap(warn_input_forces=True)(
            Trajectory(coords=coords, forces=coords)
        )
    filled = NullForcesTMap(warn_input_forces=False, fill_value=0.0)(
        CoordsTrajectory(coords=coords)
    )
    np.testing.assert_array_equal(filled.forces, np.zeros_like(coords))


def test_augmented_tmap_and_ratmap(rng):
    coords = rng.normal(size=(5, 3, 3)).astype(np.float32)
    forces = rng.normal(size=(5, 3, 3)).astype(np.float32)
    augmenter = SimpleCondNormal(var=0.04, seed=5)
    aug_traj = AugmentedTrajectory(
        coords=coords, forces=forces, augmenter=augmenter, kbt=1.0
    )
    # slice map over the augmented system
    aug_cmap = lmap_augvariables(aug_traj)
    assert aug_cmap.n_fg_sites == 6
    assert aug_cmap.n_cg_sites == 3
    inner = SeperableTMap(LinearMap(np.eye(6)), LinearMap(np.eye(6)))
    atmap = AugmentedTMap(aug_tmap=inner, augmenter=augmenter, kbt=1.0)
    out = atmap(Trajectory(coords=coords, forces=forces))
    assert out.coords.shape == (5, 6, 3)
    np.testing.assert_array_equal(out.coords[:, :3, :], coords)

    # RATMap maps real block only, preserves noise block
    pre = SeperableTMap(
        LinearMap(np.array([[1.0, 0, 0]])), LinearMap(np.array([[1.0, 1, 1]]))
    )
    mapped = RATMap(pre)(aug_traj)
    assert mapped.coords.shape == (5, 4, 3)
    np.testing.assert_array_equal(
        mapped.coords[:, 1:, :], aug_traj.coords[:, aug_traj.aug_slice, :]
    )
    np.testing.assert_allclose(
        mapped.forces[:, 0, :], aug_traj.forces[:, :3, :].sum(axis=1), atol=1e-5
    )


def test_smear_map(rng):
    sm = smear_map([[0, 2]], n_sites=4)
    pts = rng.normal(size=(3, 4, 3))
    out = sm(pts)
    np.testing.assert_allclose(out[:, 0], (pts[:, 0] + pts[:, 2]) / 2, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], out[:, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 1], pts[:, 1], atol=1e-6)
    with pytest.raises(ValueError):
        smear_map([[0, 1], [1, 2]], n_sites=4)
    mat = smear_map([[0, 2]], n_sites=4, return_mapping_matrix=True)
    assert isinstance(mat, np.ndarray)


def test_separable_fused_apply_matches_piecewise():
    """SeperableTMap over two JLinearMaps (fused single-program path) must
    equal applying each map individually, including NaN raise semantics."""
    import numpy as np
    import pytest

    from aggforce_tpu.map import JLinearMap, SeperableTMap
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(0)
    cmat = rng.normal(size=(2, 5)).astype(np.float32)
    fmat = rng.normal(size=(2, 5)).astype(np.float32)
    cm, fm = JLinearMap(cmat), JLinearMap(fmat)
    tmap = SeperableTMap(coord_map=cm, force_map=fm)
    coords = rng.normal(size=(7, 5, 3)).astype(np.float32)
    forces = rng.normal(size=(7, 5, 3)).astype(np.float32)
    out = tmap(Trajectory(coords=coords, forces=forces))
    np.testing.assert_allclose(np.asarray(out.coords), cm(coords), atol=0)
    np.testing.assert_allclose(np.asarray(out.forces), fm(forces), atol=0)
    assert isinstance(out.coords, np.ndarray)  # numpy in -> numpy out

    import jax.numpy as jnp

    out_dev = tmap(
        Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    )
    import jax

    assert isinstance(out_dev.coords, jax.Array)  # jax in -> jax out
    np.testing.assert_allclose(
        np.asarray(out_dev.forces), fm(forces), atol=1e-6
    )

    # a participating NaN raises exactly like the piecewise path
    bad = coords.copy()
    bad[0, 0, 0] = np.nan
    with pytest.raises(ValueError, match="NaN handling is on"):
        tmap(Trajectory(coords=bad, forces=forces))
    # bypass maps let NaNs flow as filled zeros without raising
    tmap_bypass = SeperableTMap(
        coord_map=JLinearMap(cmat, bypass_nan_check=True),
        force_map=JLinearMap(fmat, bypass_nan_check=True),
    )
    out2 = tmap_bypass(Trajectory(coords=bad, forces=forces))
    assert np.all(np.isfinite(np.asarray(out2.coords)))
