"""Device-constant memoization (utils/devcache + fusedfeat operand cache).

These caches exist purely for transport: on remote-attached devices every
device_put is an RPC, so repeated fits must not re-upload per-system
constants. Correctness contract: content-keyed (same values -> same
buffer, changed values -> fresh buffer), bounded, and invisible to
results (parity is pinned in test_featlinear/test_gaussmap).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from aggforce_tpu.utils import devcache


def test_device_const_content_hit():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    d1 = devcache.device_const(a)
    d2 = devcache.device_const(a.copy())  # equal content, different object
    assert d1 is d2
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_device_const_content_miss_on_change():
    a = np.ones((2, 2), dtype=np.float32)
    d1 = devcache.device_const(a)
    b = a.copy()
    b[0, 0] = 7.0
    d2 = devcache.device_const(b)
    assert d1 is not d2
    assert float(np.asarray(d2)[0, 0]) == 7.0


def test_device_const_dtype_distinguishes():
    a = np.ones(3)
    d32 = devcache.device_const(a, dtype=np.float32)
    d64 = devcache.device_const(a, dtype=np.int32)
    assert d32.dtype != d64.dtype


def test_device_const_lru_bound():
    devcache._CONST_CACHE.clear()
    for i in range(devcache._CONST_CACHE_MAX + 5):
        devcache.device_const(np.full(4, i, dtype=np.float32))
    assert len(devcache._CONST_CACHE) == devcache._CONST_CACHE_MAX


def test_device_scalar_hit_and_value():
    s1 = devcache.device_scalar(1e3)
    s2 = devcache.device_scalar(1000.0)
    assert s1 is s2
    assert float(np.asarray(s1)) == 1000.0
    assert devcache.device_scalar(1e3, dtype=np.float32) is s1


def test_fit_operand_cache_reuses_buffers():
    # fusedfeat's fit operands route through the shared devcache LRU
    from aggforce_tpu.qp import fusedfeat

    devcache._CONST_CACHE.clear()
    cmap = np.eye(3, dtype=np.float32)
    onehot = np.eye(3, dtype=np.float32)
    counts = onehot.sum(axis=0)
    gmean = (onehot / np.maximum(counts, 1.0)).T
    centers = np.linspace(0.0, 1.0, 4).astype(np.float32)
    ops1 = fusedfeat._fit_device_operands(cmap, gmean, onehot, counts, centers)
    ops2 = fusedfeat._fit_device_operands(
        cmap.copy(), gmean.copy(), onehot.copy(), counts.copy(), centers.copy()
    )
    assert all(a is b for a, b in zip(ops1, ops2))
    # a different system gets a fresh buffer for the changed array only
    ops3 = fusedfeat._fit_device_operands(
        2.0 * cmap, gmean, onehot, counts, centers
    )
    assert ops3[0] is not ops1[0]
    assert ops3[1] is ops1[1]  # unchanged arrays keep their buffers


def test_device_const_byte_cap_evicts_lru():
    """The const cache evicts by total bytes, not only entry count, so
    sweep-scale operands cannot pin unbounded HBM (review finding)."""
    import aggforce_tpu.utils.devcache as dc

    old_cache = dict(dc._CONST_CACHE)
    old_cap = dc._CONST_CACHE_MAX_BYTES
    try:
        dc._CONST_CACHE.clear()
        dc._CONST_CACHE_MAX_BYTES = 3 * 4096 * 4  # three f32 4096-vectors
        keep = [
            dc.device_const(np.full(4096, i, dtype=np.float32))
            for i in range(5)
        ]
        assert len(dc._CONST_CACHE) <= 3
        total = sum(v.nbytes for v in dc._CONST_CACHE.values())
        assert total <= dc._CONST_CACHE_MAX_BYTES
        # newest entry always survives, even alone above the cap
        dc._CONST_CACHE.clear()
        dc._CONST_CACHE_MAX_BYTES = 16
        big = dc.device_const(np.zeros(4096, dtype=np.float32))
        assert len(dc._CONST_CACHE) == 1
        del keep, big
    finally:
        dc._CONST_CACHE_MAX_BYTES = old_cap
        dc._CONST_CACHE.clear()
        dc._CONST_CACHE.update(old_cache)
