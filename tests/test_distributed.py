"""Multi-process (multi-host) smoke test for the jax.distributed layer.

Spawns two local CPU processes joined through a localhost coordinator and
drives the real multi-host pieces: ``initialize_distributed``,
``process_frame_slice`` data loading, ``global_frame_mesh``, and a
cross-process Gram reduction (the collective at the heart of every fit in
this package) checked against a single-process numpy computation.

The reference has no distributed story at all (SURVEY.md §2 inventory); this
pins the TPU-native growth path: per-host local frames -> device Grams ->
one all-reduce across DCN.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    import numpy as np

    sys.path.insert(0, {repo!r})
    from aggforce_tpu.parallel.distributed import (
        global_frame_mesh,
        initialize_distributed,
        process_frame_slice,
    )

    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_distributed(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.process_index() == pid

    # deterministic global trajectory, loaded per process via its slice
    n_frames, n_fg = 32, 6
    rng = np.random.default_rng(0)
    forces_global = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    sl = process_frame_slice(n_frames)
    local = forces_global[sl]
    assert len(local) == n_frames // n_proc  # even split here

    mesh = global_frame_mesh()
    assert mesh.devices.size == n_proc * 2  # 2 virtual devices per process

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("frames"))
    global_forces = jax.make_array_from_process_local_data(
        sharding, local, (n_frames, n_fg, 3)
    )

    @jax.jit
    def gram_of(f):
        t, n, d = f.shape
        flat = jnp.swapaxes(f, 1, 2).reshape(t * d, n)
        # frame axis is sharded: XLA inserts the cross-process all-reduce
        return jnp.matmul(flat.T, flat, precision="highest")

    gram = gram_of(global_forces)  # replicated output
    gram_np = np.asarray(gram)

    # single-process oracle
    flat = np.swapaxes(forces_global, 1, 2).reshape(n_frames * 3, n_fg)
    expect = flat.T @ flat
    err = np.max(np.abs(gram_np - expect)) / np.max(np.abs(expect))
    assert err < 1e-5, f"gram mismatch across processes: {{err}}"
    print(f"proc {{pid}}: OK gram relerr={{err:.2e}}", flush=True)
    """
).format(repo=str(REPO_ROOT))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_psum_gram(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK gram relerr" in out, out


STREAM_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    import numpy as np

    sys.path.insert(0, {repo!r})
    from aggforce_tpu import LinearMap
    from aggforce_tpu.io import TrajectoryStream, fused_gb_linear_map_streamed
    from aggforce_tpu.parallel.distributed import (
        global_frame_mesh,
        initialize_distributed,
        process_frame_slice,
    )
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec

    coord, n_proc, pid, data_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    initialize_distributed(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )
    mesh = global_frame_mesh()

    # per-process memmap load of ONLY this process's frame slice (the
    # stream still knows the global frame count for constraint sampling)
    stream = TrajectoryStream.from_npy(
        os.path.join(data_dir, "coords.npy"),
        os.path.join(data_dir, "forces.npy"),
        chunk_size=8,
    )
    sl = process_frame_slice(stream.n_frames)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kw = dict(
        kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3,
        n_constraint_frames=10,
    )
    tmap = fused_gb_linear_map_streamed(
        stream, cmap, constraint_rng=np.random.default_rng(0),
        mesh=mesh, frame_slice=sl, **kw
    )
    # single-process oracle: same streamed fit over the full range, no mesh
    oracle = fused_gb_linear_map_streamed(
        stream, cmap, constraint_rng=np.random.default_rng(0), **kw
    )
    c = np.stack(tmap.force_map.tags["coef_list"])
    c0 = np.stack(oracle.force_map.tags["coef_list"])
    err = np.max(np.abs(c - c0)) / max(np.max(np.abs(c0)), 1e-9)
    assert err < 5e-4, f"streamed mesh coefs mismatch: {{err}}"
    print(f"proc {{pid}}: OK streamed relerr={{err:.2e}}", flush=True)
    """
).format(repo=str(REPO_ROOT))


@pytest.mark.slow
def test_two_process_streamed_fused_fit(tmp_path):
    """Each process memmap-loads its process_frame_slice and runs the
    mesh-sharded streamed featurized fit; the psum-merged Grams must
    reproduce the single-process streamed oracle on every process."""
    rng = np.random.default_rng(3)
    coords = rng.normal(size=(48, 6, 3)).astype(np.float32)
    forces = rng.normal(size=(48, 6, 3)).astype(np.float32)
    np.save(tmp_path / "coords.npy", coords)
    np.save(tmp_path / "forces.npy", forces)
    worker = tmp_path / "stream_worker.py"
    worker.write_text(STREAM_WORKER)
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("streamed distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK streamed relerr" in out, out
