"""Generate golden force-map matrices for regression tests.

Writes tests/data/golden_basic_force_mat.txt and
tests/data/golden_opt_force_mat.txt from the deterministic synthetic CLN025
fixture (seed 1234, 2000 frames) using the float64 host solver — the same
role the reference's cln_*_force_mat.txt files play (regression oracles
pinning the exact fitted matrices).

Run from the repo root:  python tools/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from aggforce_tpu import LinearMap, project_forces  # noqa: E402
from aggforce_tpu.agg import TMAP_KNAME  # noqa: E402
from aggforce_tpu.qp import constraint_aware_uni_map  # noqa: E402
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms  # noqa: E402
from aggforce_tpu.utils.synth import synthesize_protein_fixture  # noqa: E402

PDB = "/root/reference/tests/data/cln025.pdb"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    fix = synthesize_protein_fixture(PDB, n_frames=2000, seed=1234)
    cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
    constraints = set(fix["constraint_groups"])

    basic = project_forces(
        coords=fix["coords"], forces=fix["forces"], coord_map=cmap,
        constrained_inds=constraints, method=constraint_aware_uni_map,
    )[TMAP_KNAME].force_map.standard_matrix
    np.savetxt(os.path.join(OUT, "golden_basic_force_mat.txt"), basic)

    opt = project_forces(
        coords=fix["coords"], forces=fix["forces"], coord_map=cmap,
        constrained_inds=constraints,
        solver_args={"backend": "host"},
    )[TMAP_KNAME].force_map.standard_matrix
    np.savetxt(os.path.join(OUT, "golden_opt_force_mat.txt"), opt)
    print("wrote goldens:", basic.shape, opt.shape)


if __name__ == "__main__":
    main()
