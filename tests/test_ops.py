"""Numpy-vs-JAX parity of the core array kernels."""

import numpy as np
import pytest

from aggforce_tpu.ops import core as npops
from aggforce_tpu.ops import jaxcore as jops


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_trjdot_static_parity(rng):
    points = rng.normal(size=(11, 7, 3)).astype(np.float32)
    factor = rng.normal(size=(4, 7)).astype(np.float32)
    expect = np.einsum("tfd,cf->tcd", points, factor)
    np.testing.assert_allclose(npops.trjdot(points, factor), expect, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jops.trjdot(points, factor)), expect, atol=1e-5
    )


def test_trjdot_perframe_parity(rng):
    points = rng.normal(size=(11, 7, 3)).astype(np.float32)
    factor = rng.normal(size=(11, 4, 7)).astype(np.float32)
    expect = np.einsum("tfd,tcf->tcd", points, factor)
    np.testing.assert_allclose(npops.trjdot(points, factor), expect, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jops.trjdot(points, factor)), expect, atol=1e-5
    )


def test_trjdot_bad_rank(rng):
    points = rng.normal(size=(5, 3, 3))
    with pytest.raises(ValueError):
        npops.trjdot(points, np.ones(3))


@pytest.mark.parametrize("cross", [False, True])
def test_distances_parity(rng, cross):
    xyz = rng.normal(size=(6, 9, 3)).astype(np.float32)
    other = rng.normal(size=(6, 4, 3)).astype(np.float32) if cross else None
    got_np = npops.distances(xyz, cross_xyz=other)
    got_j = np.asarray(jops.distances(xyz, cross_xyz=other))
    np.testing.assert_allclose(got_np, got_j, atol=1e-5)
    if cross:
        assert got_np.shape == (6, 4, 9)
        # element check: distance between cross site i and xyz site j
        expect = np.linalg.norm(xyz[2, 3] - other[2, 1])
        np.testing.assert_allclose(got_np[2, 1, 3], expect, rtol=1e-5)


def test_distances_triu(rng):
    xyz = rng.normal(size=(5, 6, 3))
    flat = npops.distances(xyz, return_matrix=False)
    assert flat.shape == (5, 15)
    mat = npops.distances(xyz)
    iu, ju = np.triu_indices(6, k=1)
    np.testing.assert_allclose(flat, mat[:, iu, ju])
    np.testing.assert_allclose(
        np.asarray(jops.distances(xyz, return_matrix=False)), flat, atol=1e-5
    )


def test_distances_displacements(rng):
    xyz = rng.normal(size=(4, 5, 3))
    disp = npops.distances(xyz, return_displacements=True)
    assert disp.shape == (4, 5, 5, 3)
    np.testing.assert_allclose(
        np.linalg.norm(disp, axis=-1), npops.distances(xyz), atol=1e-12
    )


def test_distances_square(rng):
    xyz = rng.normal(size=(4, 5, 3)).astype(np.float32)
    sq = np.asarray(jops.distances(xyz, square=True))
    np.testing.assert_allclose(sq, npops.distances(xyz) ** 2, atol=1e-5)


def test_qp_form_ordering(rng):
    arr = rng.normal(size=(4, 5, 3))
    out = npops.qp_form(arr)
    assert out.shape == (12, 5)
    # row (frame t, dim d) holds all sites for that frame/dim
    np.testing.assert_allclose(out[3 * 2 + 1], arr[2, :, 1])
    np.testing.assert_allclose(np.asarray(jops.qp_form(arr)), out)


def test_abatch_matches_direct(rng):
    arr = rng.normal(size=(10, 3))

    def f(x):
        return x * 2.0

    np.testing.assert_allclose(npops.abatch(f, arr, 3), f(arr))
    np.testing.assert_allclose(npops.abatch(f, arr, None), f(arr))
