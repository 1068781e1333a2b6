"""Production fitting pattern: disk IO overlapped with program warm-up.

The end-to-end latency of a real fitting job is dominated by two
independent phases: loading trajectory data from disk, and preparing the
fit's compiled program (trace + XLA compile or cache load — seconds on
remote-attached accelerators). They have no data dependency, so this
example runs them concurrently:

  1. enable the persistent compiled-executable cache
     (:func:`aggforce_tpu.utils.cache.enable_compile_cache`) so later
     processes load instead of recompiling, and kick off
     :func:`aggforce_tpu.utils.warmup.warm_featurized_fit` for the known
     shapes (frames, topology, featurizer spec);
  2. load coords/forces from .npy files while the program builds;
  3. fit — the jit cache is hot, so the call runs at steady-state speed;
  4. serialize the fitted map for deployment.

For trajectories larger than host RAM or device HBM, step 2-3 switch to the
streaming fit (memory-mapped chunks through the device,
:mod:`aggforce_tpu.io`) — shown second.

Run:  python examples/production_fit.py  [--frames 2000]
"""

import argparse
import os
import tempfile
import time

# honor an explicit JAX_PLATFORMS request even under environments whose
# sitecustomize pins a platform programmatically (config wins over env)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from aggforce_tpu import LinearMap
from aggforce_tpu.io import TrajectoryStream, fused_gb_linear_map_streamed
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
from aggforce_tpu.trajectory import Trajectory
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms
from aggforce_tpu.utils.serialize import load_tmap, save_tmap
from aggforce_tpu.utils.synth import synthesize_protein_fixture
from aggforce_tpu.utils.warmup import warm_featurized_fit

PDB = "/root/reference/tests/data/cln025.pdb"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=2000)
    args = parser.parse_args()
    if not os.path.exists(PDB):
        raise SystemExit(f"missing topology fixture: {PDB}")

    workdir = tempfile.mkdtemp(prefix="aggforce_prod_")
    coords_path = os.path.join(workdir, "coords.npy")
    forces_path = os.path.join(workdir, "forces.npy")

    # stand-in for upstream MD output on disk
    fix = synthesize_protein_fixture(PDB, n_frames=args.frames, seed=5)
    np.save(coords_path, fix["coords"])
    np.save(forces_path, fix["forces"])
    kbt = float(fix["kbt"])
    constraints = set(fix["constraint_groups"])
    cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=7, width=1.0)

    # ---- 1. program prep in the background (shapes known before data) ----
    from aggforce_tpu.utils.cache import enable_compile_cache

    cache_dir = enable_compile_cache()  # honors AGGFORCE_COMPILE_CACHE
    print(f"compile cache: {cache_dir}")
    t0 = time.perf_counter()
    handle = warm_featurized_fit(
        args.frames, cmap, spec, constraints, kbt=kbt, l2_regularization=1e3
    )

    # ---- 2. data load overlaps the compile ----
    coords = np.load(coords_path)
    forces = np.load(forces_path)
    t_load = time.perf_counter() - t0
    wait = handle.wait()
    print(
        f"data load {t_load:.2f}s; program prep {handle.elapsed:.2f}s in "
        f"background ({wait:.2f}s exposed)"
    )

    # ---- 3. fit at steady-state speed ----
    t0 = time.perf_counter()
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        kbt=kbt,
        spec=spec,
        constraints=constraints,
        l2_regularization=1e3,
        constraint_rng=np.random.default_rng(0),
    )
    print(f"fit: {time.perf_counter() - t0:.3f}s "
          f"(solver resid {tmap.force_map.tags['solver_resid']:.2e})")

    # ---- 4. serialize for deployment ----
    map_path = os.path.join(workdir, "force_map.npz")
    save_tmap(map_path, tmap)
    reloaded = load_tmap(map_path)
    mc, mf = reloaded.map_arrays(coords[:32], forces[:32])
    assert np.all(np.isfinite(mf))
    print(f"serialized map round-trips: {map_path}")

    # ---- larger-than-memory variant: stream chunks from disk ----
    stream = TrajectoryStream.from_npy(coords_path, forces_path, chunk_size=512)
    t0 = time.perf_counter()
    tmap_s = fused_gb_linear_map_streamed(
        stream,
        cmap,
        kbt=kbt,
        spec=spec,
        constraints=constraints,
        l2_regularization=1e3,
        constraint_rng=np.random.default_rng(0),
    )
    mc_s, mf_s = tmap_s.map_arrays(coords[:32], forces[:32])
    rms = float(np.sqrt(np.mean((np.asarray(mf_s) - np.asarray(mf)) ** 2)))
    print(
        f"streamed fit: {time.perf_counter() - t0:.3f}s; mapped-force RMS "
        f"deviation vs in-memory fit {rms:.2e}"
    )

    # ---- multi-device variant: chunks round-robin over a mesh ----
    # (each process streams only its frame_slice in the multi-host case —
    # see tests/test_distributed.py for the two-process pattern)
    import jax

    if len(jax.devices()) > 1:
        from aggforce_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        t0 = time.perf_counter()
        tmap_m = fused_gb_linear_map_streamed(
            stream,
            cmap,
            kbt=kbt,
            spec=spec,
            constraints=constraints,
            l2_regularization=1e3,
            constraint_rng=np.random.default_rng(0),
            mesh=mesh,
        )
        _, mf_m = tmap_m.map_arrays(coords[:32], forces[:32])
        rms_m = float(
            np.sqrt(np.mean((np.asarray(mf_m) - np.asarray(mf)) ** 2))
        )
        print(
            f"mesh-streamed fit ({mesh.devices.size} devices): "
            f"{time.perf_counter() - t0:.3f}s; RMS vs in-memory {rms_m:.2e}"
        )
    print("production fit demo OK")


if __name__ == "__main__":
    main()
