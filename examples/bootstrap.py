"""Bootstrap uncertainty for a featurized force map via batched fits.

The featurized QP fit enforces orthogonality on a random subsample of
frames (``n_constraint_frames``), so the fitted coefficients carry
sampling noise. This example quantifies it: fit B maps, one per
constraint-frame seed, with :func:`fused_gb_linear_map_batch` — every
window of fits shares ONE trajectory Gram pass and one per-site
factorization, and the wrapper's software pipeline overlaps each
window's fetch/packaging with the next window's device compute, so the
marginal map costs a few milliseconds instead of a full fit.

Reported: the spread of the per-fit solver residuals, the coefficient
standard deviation (relative to the mean coefficient magnitude), and the
spread of the physical observable — the mean squared mapped force.

The reference has no batched-fit facility (each qp_feat_linear_map call
re-runs detection + featurization + per-site OSQP solves, reference
src/aggforce/qp/featlinearmap.py:191-303); this is an extra enabled by
the shared-Gram batch architecture.

Run:  python examples/bootstrap.py [--n-maps 32] [--window 16]
"""

import argparse
import os
import time

# honor an explicit JAX_PLATFORMS request even under environments whose
# sitecustomize pins a platform programmatically (config wins over env)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from aggforce_tpu import LinearMap
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map_batch
from aggforce_tpu.trajectory import Trajectory

WATERDIMER = "/root/reference/tests/data/waterdimer.npz"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-maps", type=int, default=32)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--data", default=WATERDIMER)
    args = ap.parse_args()

    raw = np.load(args.data)
    coords, forces = raw["coords"], raw["Fs"]
    cmap = LinearMap([[0], [3]], n_fg_sites=coords.shape[1])
    # device-resident trajectory: every fit stays on device end to end
    traj = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    spec = GBFeatSpec(outer=1.0, inner=0.0, n_basis=5, width=1.0)

    t0 = time.perf_counter()
    maps = fused_gb_linear_map_batch(
        traj,
        cmap,
        kbt=0.6955215,
        spec=spec,
        seeds=range(args.n_maps),
        constraints=set(),
        l2_regularization=1e1,
        chunk_size=256,
        flush_every=args.window,
    )
    wall = time.perf_counter() - t0
    print(
        f"fitted {len(maps)} maps in {wall:.3f}s "
        f"({wall / len(maps) * 1e3:.1f} ms/map, {args.window}-fit windows)"
    )

    resids = np.array([m.force_map.tags["solver_resid"] for m in maps])
    coefs = np.stack(
        [np.asarray(m.force_map.tags["coef_list"]) for m in maps]
    )  # (B, S, K)
    rel_spread = float(coefs.std(axis=0).mean() / np.abs(coefs).mean())
    print(
        f"solver residuals: min {resids.min():.2e} / "
        f"median {np.median(resids):.2e} / max {resids.max():.2e}"
    )
    print(f"coefficient spread (std/|mean|): {rel_spread:.3f}")

    # physical observable: mean squared mapped force per bootstrap map
    msf = []
    for m in maps:
        _, mf = m.map_arrays(coords, forces)
        msf.append(float(np.mean(np.asarray(mf) ** 2)))
    msf = np.array(msf)
    print(
        f"mean squared mapped force: {msf.mean():.4f} "
        f"+/- {msf.std():.4f} across {len(maps)} constraint-frame samples"
    )


if __name__ == "__main__":
    main()
