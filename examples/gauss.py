"""Gaussian (noised) force maps on a CLN025-scale system.

Counterpart of the reference's examples/gauss.py: builds each of the four
Gaussian map variants, compares their in-sample force residuals against the
deterministic optimal linear map, and demonstrates the staged save/load
workflow (serialize the fitted map, reload, keep mapping).

Run:  python examples/gauss.py  [--frames 2000]
"""

import argparse
import os
import tempfile

# honor an explicit JAX_PLATFORMS request even under environments whose
# sitecustomize pins a platform programmatically (config wins over env)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from aggforce_tpu import (
    LinearMap,
    Trajectory,
    project_forces,
    joptgauss_map,
    stagedjforcegauss_map,
    stagedjoptgauss_map,
    stagedjslicegauss_map,
)
from aggforce_tpu.agg import RESIDUAL_KNAME, TMAP_KNAME
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms
from aggforce_tpu.utils.prof import PhaseTimer
from aggforce_tpu.utils.serialize import load_tmap, save_tmap
from aggforce_tpu.utils.synth import synthesize_protein_fixture

PDB = "/root/reference/tests/data/cln025.pdb"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=2000)
    args = parser.parse_args()

    if not os.path.exists(PDB):
        raise SystemExit(f"missing topology fixture: {PDB}")
    fix = synthesize_protein_fixture(PDB, n_frames=args.frames, seed=11)
    coords, forces, kbt = fix["coords"], fix["forces"], float(fix["kbt"])
    constraints = set(fix["constraint_groups"])
    cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))

    timer = PhaseTimer()
    results = {}
    with timer.phase("optimal linear (baseline)"):
        results["linear"] = project_forces(
            coords=coords, forces=forces, coord_map=cmap,
            constrained_inds=constraints,
        )
    for name, method, extra in [
        ("joptgauss", joptgauss_map, {}),
        ("stagedjoptgauss", stagedjoptgauss_map, {}),
        ("stagedjslicegauss", stagedjslicegauss_map, {}),
        ("stagedjforcegauss", stagedjforcegauss_map, {}),
    ]:
        with timer.phase(name):
            results[name] = project_forces(
                coords=coords, forces=forces, coord_map=cmap,
                constrained_inds=constraints, method=method,
                var=0.002, kbt=kbt, seed=42, **extra,
            )

    print("\nin-sample force residuals (mean squared mapped force):")
    for name, res in results.items():
        print(f"  {name:<20s} {res[RESIDUAL_KNAME]:12.4f}")

    # staged workflow: map with the deterministic premap now, noise later
    staged = results["stagedjoptgauss"][TMAP_KNAME]
    premapped = staged[1](Trajectory(coords=coords, forces=forces))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "staged_map.npz")
        save_tmap(path, staged)
        reloaded = load_tmap(path)
        final = reloaded[0](premapped)
    print(
        f"\nstaged save/load OK: premapped {premapped.coords.shape} -> "
        f"noised {final.coords.shape}"
    )
    print("\n" + timer.report())


if __name__ == "__main__":
    main()
