"""Resilient staging: chunking, wire-dtype fidelity, report attribution.

The degraded-tunnel staging problem this subsystem addresses (405 s observed
for an 84 MB transfer in a bad window) cannot be reproduced on the CPU test
backend; these tests pin the mechanics — chunk coverage, dtype round-trips,
report accounting — and quantify the float16 wire format's effect on the
actual fit (the claim in staging.py's docstring that quantization stays far
below the solver's escalation tolerance).
"""

import jax
import numpy as np
import pytest

from aggforce_tpu.io.staging import StagingReport, stage_arrays, stage_trajectory


def test_stage_arrays_reassembles_exactly():
    rng = np.random.default_rng(0)
    arrs = [
        rng.normal(size=(100, 7, 3)).astype(np.float32),
        rng.normal(size=(33, 5)).astype(np.float32),
    ]
    staged, report = stage_arrays(arrs, chunk_bytes=2048)
    assert report.n_chunks > 2  # chunking actually happened
    assert report.bytes == sum(a.nbytes for a in arrs)
    for host, dev in zip(arrs, staged):
        assert isinstance(dev, jax.Array)
        assert dev.dtype == np.float32
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_stage_arrays_float16_wire_error_bounded():
    rng = np.random.default_rng(1)
    arr = (100.0 * rng.normal(size=(64, 16, 3))).astype(np.float32)
    (dev,), report = stage_arrays([arr], wire_dtype="float16")
    assert report.wire_dtype == "float16"
    assert report.bytes == arr.nbytes // 2  # half the tunnel traffic
    err = np.abs(np.asarray(dev) - arr)
    # float16 relative quantization ~5e-4
    assert np.max(err / np.maximum(np.abs(arr), 1e-3)) < 2e-3
    assert dev.dtype == np.float32  # compute dtype restored on device


def test_stage_trajectory_device_resident():
    rng = np.random.default_rng(2)
    coords = rng.normal(size=(50, 6, 3)).astype(np.float32)
    forces = rng.normal(size=(50, 6, 3)).astype(np.float32)
    traj, report = stage_trajectory(coords, forces)
    assert isinstance(traj.coords, jax.Array)
    assert isinstance(traj.forces, jax.Array)
    assert report.seconds > 0.0
    assert report.mbps > 0.0
    # local-backend transfers are fast; the degraded flag must be False
    assert not report.degraded


def test_report_merge_accounting():
    a = StagingReport(seconds=1.0, bytes=10**6, n_chunks=2, retries=1,
                      slow_chunks=1, chunk_mbps_min=5.0, chunk_mbps_max=50.0)
    b = StagingReport(seconds=2.0, bytes=3 * 10**6, n_chunks=3,
                      chunk_mbps_min=30.0, chunk_mbps_max=90.0)
    m = a.merge(b)
    assert m.seconds == 3.0 and m.bytes == 4 * 10**6
    assert m.n_chunks == 5 and m.retries == 1
    assert m.chunk_mbps_min == 5.0 and m.chunk_mbps_max == 90.0
    assert m.degraded  # a measured-slow chunk propagates through merge


@pytest.mark.jax
def test_float16_staging_preserves_fit_quality(waterdimer):
    """A fit from float16-staged data must match the float32 fit closely.

    This quantifies the Gram perturbation of the compressed wire format:
    float16 carries ~5e-4 relative error into the featurization; the fitted
    map's mapped forces must agree with the lossless fit to well under a
    percent, and the solver's own convergence residual must stay at its
    normal level (no escalation triggered by quantization).
    """
    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:160].astype(np.float32)
    forces = waterdimer["forces"][:160].astype(np.float32)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kw = dict(kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3)

    traj32 = Trajectory(coords=coords, forces=forces)
    traj16, report = stage_trajectory(coords, forces, wire_dtype="float16")
    assert report.bytes == coords.nbytes  # both arrays at half width

    tmap32 = fused_gb_linear_map(
        traj32, cmap, constraint_rng=np.random.default_rng(7), **kw
    )
    tmap16 = fused_gb_linear_map(
        traj16, cmap, constraint_rng=np.random.default_rng(7), **kw
    )
    assert tmap16.force_map.tags["solver_resid"] < 1e-4

    _, f32 = tmap32.map_arrays(coords[:32], forces[:32])
    _, f16 = tmap16.map_arrays(coords[:32], forces[:32])
    rms = np.sqrt(np.mean((np.asarray(f32) - np.asarray(f16)) ** 2))
    scale = np.sqrt(np.mean(np.asarray(f32) ** 2))
    assert rms < 5e-3 * scale


def test_degraded_chunk_triggers_retry(monkeypatch):
    """A chunk measuring below the degraded threshold (with a meaningful
    sample duration) must be retried within budget and flagged."""
    from aggforce_tpu.io import staging as st

    calls = {"n": 0}
    real_put = st._put_chunk

    def slow_put(chunk_np, device):
        calls["n"] += 1
        dev, _ = real_put(chunk_np, device)
        # fake a slow, meaningful sample: 1 MB chunk "took" 1 s -> 1 MB/s
        return dev, 1.0

    monkeypatch.setattr(st, "_put_chunk", slow_put)
    arr = np.zeros((64, 2048), np.float32)  # 512 KB
    (out,), report = st.stage_arrays([arr], chunk_bytes=1 << 30, max_retries=2)
    # one payload chunk + one retry
    assert calls["n"] == 2
    assert report.retries == 1
    assert report.slow_chunks == 1
    assert report.degraded
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_fast_chunks_never_retry(monkeypatch):
    from aggforce_tpu.io import staging as st

    calls = {"n": 0}
    real_put = st._put_chunk

    def counting_put(chunk_np, device):
        calls["n"] += 1
        return real_put(chunk_np, device)

    monkeypatch.setattr(st, "_put_chunk", counting_put)
    arr = np.zeros((64, 256), np.float32)
    (out,), report = st.stage_arrays([arr], chunk_bytes=1 << 14, max_retries=2)
    assert calls["n"] == report.n_chunks  # no retries on the local backend
    assert report.retries == 0 and not report.degraded
