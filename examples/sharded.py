"""Multi-chip force-map fitting over a jax.sharding.Mesh.

Demonstrates the framework's scaling path end to end (cf. reference
examples which are single-process numpy-only):

  1. frame-sharded optimal linear map (`sharded_linear_fit`),
  2. frame-sharded fused featurized fit (`fused_gb_linear_map(mesh=...)`),
  3. frame-sharded single-pass cross validation (`fused_gb_cv(mesh=...)`).

Run anywhere: with one accelerator attached it builds a virtual 8-device
CPU mesh (`--virtual-devices`), which compiles and executes the exact
sharded programs that run on a real TPU slice — Grams reduce with one
psum over the mesh axis, the small solves are replicated.

    python examples/sharded.py --frames 2000 --virtual-devices 8
"""

import argparse
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=2000)
    parser.add_argument("--atoms", type=int, default=60)
    parser.add_argument(
        "--virtual-devices",
        type=int,
        default=8,
        help="host-platform device count when no multi-device backend exists",
    )
    args = parser.parse_args()

    # a virtual CPU mesh must be requested before jax initializes
    if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
    import jax

    # default to the virtual CPU mesh (the platform must be chosen BEFORE the
    # first device query); set AGGFORCE_REAL_MESH=1 on a real multi-chip slice
    if os.environ.get("AGGFORCE_REAL_MESH", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.agg import force_smoothness
    from aggforce_tpu.parallel import make_mesh, sharded_linear_fit
    from aggforce_tpu.qp.cv import fused_gb_cv
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.qp.qplinear import make_bond_constraint_matrix
    from aggforce_tpu.trajectory import Trajectory
    from aggforce_tpu.utils.synth import synthesize_trajectory

    n_dev = len(jax.devices())
    mesh = make_mesh(axis_name="frames")
    print(f"devices: {n_dev} ({jax.devices()[0].platform}), mesh: {mesh.shape}")

    rng = np.random.default_rng(0)
    base = rng.normal(scale=0.8, size=(args.atoms, 3))
    groups = [frozenset((i, i + 1)) for i in range(0, args.atoms // 3, 2)]
    coords, forces = synthesize_trajectory(base, groups, args.frames, seed=1)
    cmap = LinearMap(
        [[i] for i in range(0, args.atoms, max(1, args.atoms // 8))],
        n_fg_sites=args.atoms,
    )
    constraints = set(groups)
    print(f"fixture: {coords.shape}, {cmap.n_cg_sites} cg sites")

    # 1. frame-sharded optimal linear map
    con_mat = make_bond_constraint_matrix(args.atoms, constraints)
    t0 = time.perf_counter()
    fmat = sharded_linear_fit(
        forces.astype(np.float32),
        con_mat.astype(np.float32),
        cmap.standard_matrix.astype(np.float32),
        l2_regularization=1.0,
        mesh=mesh,
    )
    ortho = cmap.standard_matrix @ np.asarray(fmat).T
    assert np.allclose(ortho, np.eye(cmap.n_cg_sites), atol=1e-3)
    print(f"sharded linear fit: {time.perf_counter() - t0:.2f}s, "
          f"orthogonality max err {np.abs(ortho - np.eye(cmap.n_cg_sites)).max():.1e}")

    # 2. frame-sharded fused featurized fit
    traj = Trajectory(coords=coords, forces=forces)
    spec = GBFeatSpec(outer=3.0, n_basis=5)
    t0 = time.perf_counter()
    tmap = fused_gb_linear_map(
        traj,
        cmap,
        kbt=1.0,
        spec=spec,
        constraints=constraints,
        l2_regularization=1e2,
        constraint_rng=np.random.default_rng(3),
        mesh=mesh,
    )
    _, mf = tmap.map_arrays(coords[:256], forces[:256])
    print(f"sharded featurized fit: {time.perf_counter() - t0:.2f}s, "
          f"holdout residual {force_smoothness(mf):.4f}")

    # 3. frame-sharded single-pass CV over an l2 grid
    t0 = time.perf_counter()
    table = fused_gb_cv(
        coords, forces, cmap, constraints,
        kbt=1.0, spec=spec, l2_values=[1e0, 1e2, 1e4], n_folds=3,
        rng=np.random.default_rng(5), mesh=mesh,
    )
    best = min(table, key=lambda k: table[k][0])
    print(f"sharded CV ({len(table)} l2 x 3 folds): "
          f"{time.perf_counter() - t0:.2f}s, best l2 {best:g}")
    for l2, (mean, sd, n) in sorted(table.items()):
        print(f"  l2={l2:<8g} holdout={mean:.4f} sd={sd:.4f} n={n}")
    print("sharded demo OK")


if __name__ == "__main__":
    sys.exit(main())
