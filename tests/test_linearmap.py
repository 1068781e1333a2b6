"""LinearMap / JLinearMap semantics and numerical parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from aggforce_tpu.map import JLinearMap, LinearMap, jaxify_linearmap


@pytest.fixture()
def rng():
    return np.random.default_rng(10)


def test_list_construction_uniform_weights():
    lm = LinearMap([[0, 2, 3], [4]], n_fg_sites=6)
    expect = np.array(
        [
            [1 / 3, 0, 1 / 3, 1 / 3, 0, 0],
            [0, 0, 0, 0, 1, 0],
        ]
    )
    np.testing.assert_allclose(lm.standard_matrix, expect)
    assert lm.n_cg_sites == 2
    assert lm.n_fg_sites == 6
    assert lm.participating_fg == [[0, 2, 3], [4]]


def test_matrix_construction_rejects_n_fg():
    with pytest.raises(ValueError):
        LinearMap(np.eye(3), n_fg_sites=3)


def test_call_and_flat_call(rng):
    mat = rng.normal(size=(2, 5))
    lm = LinearMap(mat)
    pts = rng.normal(size=(7, 5, 3))
    out = lm(pts)
    np.testing.assert_allclose(out, np.einsum("tfd,cf->tcd", pts, mat), atol=1e-12)
    flat = lm.flat_call(pts.reshape(7, 15))
    np.testing.assert_allclose(flat, out.reshape(7, 6), atol=1e-12)


def test_algebra(rng):
    a = LinearMap(rng.normal(size=(3, 4)))
    b = LinearMap(rng.normal(size=(4, 3)))
    np.testing.assert_allclose(
        (a @ b).standard_matrix, a.standard_matrix @ b.standard_matrix
    )
    np.testing.assert_allclose(a.T.standard_matrix, a.standard_matrix.T)
    np.testing.assert_allclose((2.0 * a).standard_matrix, 2 * a.standard_matrix)
    np.testing.assert_allclose(
        (a + a).standard_matrix, 2 * a.standard_matrix
    )


def test_close_to_identity():
    assert LinearMap(np.eye(4)).close_to_identity()
    assert not LinearMap(2 * np.eye(4)).close_to_identity()
    assert not LinearMap(np.ones((2, 3))).close_to_identity()


def test_nan_protocol_allows_unused_nans():
    # cg site only uses site 0; NaNs on site 1 are untouched by the map
    lm = LinearMap(np.array([[1.0, 0.0]]))
    pts = np.ones((3, 2, 3))
    pts[:, 1, :] = np.nan
    out = lm(pts)
    np.testing.assert_allclose(out, np.ones((3, 1, 3)))


def test_nan_protocol_raises_on_used_nans():
    lm = LinearMap(np.array([[0.5, 0.5]]))
    pts = np.ones((3, 2, 3))
    pts[0, 1, 0] = np.nan
    with pytest.raises(ValueError):
        lm(pts)


def test_nan_protocol_safe_does_not_mutate():
    lm = LinearMap(np.array([[1.0, 0.0]]), handle_nans="safe")
    pts = np.ones((3, 2, 3))
    pts[:, 1, :] = np.nan
    before = pts.copy()
    lm(pts)
    np.testing.assert_array_equal(np.isnan(pts), np.isnan(before))


def test_handle_nans_false_passes_through():
    lm = LinearMap(np.array([[0.5, 0.5]]), handle_nans=False)
    pts = np.full((2, 2, 3), np.nan)
    out = lm(pts)
    assert np.isnan(out).all()


def test_jlinearmap_numpy_parity(rng):
    mat = rng.normal(size=(4, 9)).astype(np.float64)
    pts = rng.normal(size=(20, 9, 3))
    lm = LinearMap(mat)
    jlm = JLinearMap.from_linearmap(lm)
    out_np = lm(pts)
    out_j = jlm(pts)
    assert isinstance(out_j, np.ndarray)
    assert float(np.mean((out_np - out_j) ** 2)) ** 0.5 < 1e-6


def test_jlinearmap_type_preservation(rng):
    mat = rng.normal(size=(2, 5)).astype(np.float32)
    jlm = JLinearMap(mat)
    jpts = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    out = jlm(jpts)
    assert isinstance(out, jnp.ndarray)
    np.testing.assert_allclose(
        np.asarray(out),
        np.einsum("tfd,cf->tcd", np.asarray(jpts), mat),
        atol=1e-5,
    )


def test_jlinearmap_flat_call_and_astype(rng):
    mat = rng.normal(size=(2, 5))
    jlm = JLinearMap(mat)
    pts = rng.normal(size=(6, 5, 3))
    np.testing.assert_allclose(
        jlm.flat_call(pts.reshape(6, 15)),
        jlm(pts).reshape(6, 6),
        atol=1e-5,
    )
    lm32 = jlm.astype(np.float32)
    assert lm32.standard_matrix.dtype == np.float32
    np.testing.assert_allclose(
        lm32(pts.astype(np.float32)), jlm(pts), atol=1e-4
    )


def test_jlinearmap_nan_check_raises(rng):
    jlm = JLinearMap(np.array([[0.5, 0.5]]))
    pts = np.ones((3, 2, 3))
    pts[0, 1, 0] = np.nan
    with pytest.raises(ValueError):
        jlm(pts)
    # bypass mode computes without raising (zero-filled result)
    jlm_bypass = JLinearMap(np.array([[0.5, 0.5]]), bypass_nan_check=True)
    out = jlm_bypass(pts)
    assert np.isfinite(out).all()


def test_jaxify_linearmap(rng):
    mat = rng.normal(size=(2, 4)).astype(np.float32)
    lm = LinearMap(mat)
    pts = rng.normal(size=(5, 4, 3)).astype(np.float32)
    fn = jaxify_linearmap(lm, flattened=True)
    out = np.asarray(fn(jnp.asarray(pts.reshape(5, 12))))
    np.testing.assert_allclose(out, lm(pts).reshape(5, 6), atol=1e-5)
    fn3 = jaxify_linearmap(lm, flattened=False)
    np.testing.assert_allclose(np.asarray(fn3(jnp.asarray(pts))), lm(pts), atol=1e-5)
    # perframe single-frame path
    np.testing.assert_allclose(
        np.asarray(fn(jnp.asarray(pts.reshape(5, 12)[0]), perframe=True)),
        lm(pts).reshape(5, 6)[0],
        atol=1e-5,
    )


def test_nan_verdict_is_exact_not_comparative():
    """The NaN check must key on actual NaN participation, not on comparing
    two matmuls (which differ by reduction-order noise at large N on TPU —
    the phantom-NaN false positive found at sweep scale)."""
    import jax.numpy as jnp

    from aggforce_tpu.map import JLinearMap

    rng = np.random.default_rng(0)
    n = 512
    mat = np.zeros((4, n), dtype=np.float32)
    mat[:, : n // 2] = rng.normal(size=(4, n // 2))  # back half non-participating
    m = JLinearMap(mat)
    pts = rng.normal(size=(8, n, 3)).astype(np.float32)

    out = m(jnp.asarray(pts))  # finite input: must not raise
    assert np.all(np.isfinite(np.asarray(out)))

    bad = pts.copy()
    bad[0, 5, 0] = np.nan  # participating site -> must raise
    with pytest.raises(ValueError):
        m(jnp.asarray(bad))

    benign = pts.copy()
    benign[0, n - 1, 0] = np.nan  # zero-weight site -> tolerated
    out = m(jnp.asarray(benign))
    assert np.all(np.isfinite(np.asarray(out)))
