"""Multi-host streamed sweep: the BASELINE config-#5 pattern as ONE driver.

Each process (host) memory-maps the shared trajectory files, streams ONLY
its own frame slice chunk-by-chunk through its local devices, and one psum
over the global mesh merges the per-device Grams — ICI within a slice, DCN
across hosts, O(K^2) bytes either way. Every process ends up with the same
fitted map.

Run one process per host (the standard jax.distributed launch):

    python examples/multihost_sweep.py --coordinator HOST:PORT \
        --nproc N --pid I --coords c.npy --forces f.npy

or locally demo the whole flow with two CPU processes:

    python examples/multihost_sweep.py --demo

Reference contrast: the upstream package is single-process and loads whole
trajectories into numpy (its only scaling device is frame chunking,
reference jaxutil.py:62-102); this driver is the TPU-native growth path
SURVEY.md §5 mandates.
"""

import argparse
import os
import sys


def worker(args) -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.io import TrajectoryStream, fused_gb_linear_map_streamed
    from aggforce_tpu.parallel.distributed import (
        global_frame_mesh,
        initialize_distributed,
        process_frame_slice,
    )
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.pid,
    )
    mesh = global_frame_mesh()
    stream = TrajectoryStream.from_npy(
        args.coords, args.forces, chunk_size=args.chunk_size
    )
    sl = process_frame_slice(stream.n_frames)
    print(
        f"proc {jax.process_index()}/{jax.process_count()}: frames "
        f"[{sl.start}, {sl.stop}) over {mesh.devices.size} global devices",
        flush=True,
    )
    cmap = LinearMap(
        [[i] for i in range(0, stream.n_sites, max(1, stream.n_sites // 8))],
        n_fg_sites=stream.n_sites,
    )
    spec = GBFeatSpec(outer=2.0, n_basis=3)
    tmap = fused_gb_linear_map_streamed(
        stream,
        cmap,
        kbt=0.7,
        spec=spec,
        constraints=set(),
        l2_regularization=1e3,
        # the same seed on EVERY process: constraint-frame samples (and
        # therefore the fitted map) must coincide across hosts
        constraint_rng=np.random.default_rng(args.seed),
        mesh=mesh,
        frame_slice=sl,
    )
    resid = tmap.force_map.tags["solver_resid"]
    print(
        f"proc {jax.process_index()}: fitted (solver resid {resid:.2e})",
        flush=True,
    )


def demo() -> None:
    """Spawn two local CPU processes and run the full flow end to end."""
    import socket
    import subprocess
    import tempfile

    import numpy as np

    workdir = tempfile.mkdtemp(prefix="aggforce_sweep_")
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(64, 9, 3)).astype(np.float32)
    forces = rng.normal(size=(64, 9, 3)).astype(np.float32)
    cpath = os.path.join(workdir, "coords.npy")
    fpath = os.path.join(workdir, "forces.npy")
    np.save(cpath, coords)
    np.save(fpath, forces)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--coordinator", f"127.0.0.1:{port}",
                "--nproc", "2", "--pid", str(pid),
                "--coords", cpath, "--forces", fpath,
                "--chunk-size", "8",
            ],
            env=env,
        )
        for pid in range(2)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    if any(codes):
        raise SystemExit(f"demo workers failed: {codes}")
    print("multihost sweep demo OK")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--nproc", type=int, default=None)
    parser.add_argument("--pid", type=int, default=None)
    parser.add_argument("--coords", default=None)
    parser.add_argument("--forces", default=None)
    parser.add_argument("--chunk-size", dest="chunk_size", type=int,
                        default=4096)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    if args.demo:
        demo()
        return
    if not (args.coords and args.forces):
        parser.error("--coords/--forces required (or use --demo)")
    worker(args)


if __name__ == "__main__":
    main()
