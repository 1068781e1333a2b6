"""Gaussian augmenter parity and correctness."""

import numpy as np
import pytest

from aggforce_tpu.map import JLinearMap
from aggforce_tpu.trajectory import JCondNormal, SimpleCondNormal


@pytest.fixture()
def rng():
    return np.random.default_rng(8)


def test_log_gradient_parity_identity_premap(rng):
    """JCondNormal with identity premap must match SimpleCondNormal closed form."""
    var = 0.07
    source = rng.normal(size=(12, 5, 3)).astype(np.float32)
    generated = rng.normal(size=(12, 5, 3)).astype(np.float32)
    simple = SimpleCondNormal(var=var, seed=0)
    jaxed = JCondNormal(cov=var, seed=0)
    jaxed.sample(source)  # initializes deferred cov
    s_src, s_gen = simple.log_gradient(source, generated)
    j_src, j_gen = jaxed.log_gradient(source, generated)
    np.testing.assert_allclose(s_src, j_src, atol=2e-6)
    np.testing.assert_allclose(s_gen, j_gen, atol=2e-6)


def test_log_gradient_requires_cov():
    j = JCondNormal(cov=0.1)
    with pytest.raises(ValueError):
        j.log_gradient(np.zeros((2, 3, 3)), np.zeros((2, 3, 3)))


def test_sample_distribution(rng):
    var = 0.05
    source = np.zeros((4000, 2, 3), dtype=np.float32)
    j = JCondNormal(cov=var, seed=123)
    out = j.sample(source)
    assert out.shape == source.shape
    assert abs(out.mean()) < 0.01
    np.testing.assert_allclose(out.var(), var, rtol=0.05)


def test_sample_premap_reduces_dimension(rng):
    cmap = JLinearMap(np.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]]),
                      bypass_nan_check=True)
    j = JCondNormal(cov=0.01, premap=cmap.flat_call, seed=5)
    source = rng.normal(size=(10, 3, 3)).astype(np.float32)
    out = j.sample(source)
    assert out.shape == (10, 2, 3)
    # noise mean is the mapped position
    big = rng.normal(size=(4000, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        j.sample(big).mean(axis=0), cmap(big).mean(axis=0), atol=0.02
    )


def test_log_gradient_premap_vjp(rng):
    """grad_x must equal A^T (y - Ax)/var for a linear premap A."""
    var = 0.3
    mat = np.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]])
    cmap = JLinearMap(mat, bypass_nan_check=True)
    j = JCondNormal(cov=var, premap=cmap.flat_call, seed=5)
    source = rng.normal(size=(6, 3, 3)).astype(np.float32)
    j.sample(source)
    generated = rng.normal(size=(6, 2, 3)).astype(np.float32)
    src_grad, gen_grad = j.log_gradient(source, generated)
    resid = generated - np.asarray(cmap(source))
    np.testing.assert_allclose(gen_grad, -resid / var, atol=1e-5)
    expect_src = np.einsum("cf,tcd->tfd", mat, resid / var)
    np.testing.assert_allclose(src_grad, expect_src, atol=1e-5)


def test_matrix_cov_matches_scalar(rng):
    """Full covariance sigma^2*I must reproduce the scalar fast path."""
    var = 0.11
    dim = 2 * 3
    source = rng.normal(size=(7, 2, 3)).astype(np.float32)
    generated = rng.normal(size=(7, 2, 3)).astype(np.float32)
    scalar = JCondNormal(cov=var, seed=0)
    scalar.sample(source)
    matrix = JCondNormal(cov=(var * np.eye(dim)).astype(np.float32), seed=0)
    s = scalar.log_gradient(source, generated)
    m = matrix.log_gradient(source, generated)
    np.testing.assert_allclose(s[0], m[0], atol=1e-4)
    np.testing.assert_allclose(s[1], m[1], atol=1e-4)


def test_source_postmap_applied(rng):
    var = 0.2
    post = JLinearMap(np.array([[2.0, 0.0], [0.0, 2.0]]), bypass_nan_check=True)
    plain = JCondNormal(cov=var, seed=0)
    plain.sample(rng.normal(size=(5, 2, 3)).astype(np.float32))
    posted = JCondNormal(cov=var, source_postmap=post, seed=0)
    posted.sample(rng.normal(size=(5, 2, 3)).astype(np.float32))
    source = rng.normal(size=(5, 2, 3)).astype(np.float32)
    generated = rng.normal(size=(5, 2, 3)).astype(np.float32)
    np.testing.assert_allclose(
        posted.log_gradient(source, generated)[0],
        2.0 * plain.log_gradient(source, generated)[0],
        atol=1e-5,
    )


def test_astype_and_downcast(rng):
    j = JCondNormal(cov=0.1, seed=1)
    j64 = j.astype(np.float64)
    out = j64.sample(rng.normal(size=(3, 2, 3)))
    assert out.dtype == np.float64
    simple = j.to_SimpleCondNormal()
    assert isinstance(simple, SimpleCondNormal)
    with pytest.raises(ValueError):
        JCondNormal(cov=0.1, premap=lambda x: x * 2).to_SimpleCondNormal()


def test_sample_rng_advances(rng):
    j = JCondNormal(cov=0.1, seed=3)
    src = np.zeros((4, 2, 3), dtype=np.float32)
    a = j.sample(src)
    b = j.sample(src)
    assert not np.allclose(a, b)


def test_simple_astype(rng):
    s = SimpleCondNormal(var=0.1, seed=0, dtype=np.float32)
    s64 = s.astype(np.float64)
    assert s64.sample(np.zeros((2, 2, 3))).dtype == np.float64
