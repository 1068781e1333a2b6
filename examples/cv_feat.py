"""Cross-validated featurized force maps with hyperparameter grids.

Counterpart of the reference's examples/cv_feat.py: sweeps featurizer
hyperparameters (number of Gaussian basis functions, cutoff, l2 penalty) with
k-fold cross validation, then tabulates holdout residuals with pandas.

Run:  python examples/cv_feat.py  [--frames 1000] [--folds 3]
"""

import argparse
import os

import numpy as np

from aggforce_tpu import LinearMap
from aggforce_tpu.agg import (
    NRUNS_KNAME,
    SCORES_KNAME,
    SDS_KNAME,
    project_forces_grid_cv,
)
from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
from aggforce_tpu.utils import Curry
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms
from aggforce_tpu.utils.synth import synthesize_protein_fixture

PDB = "/root/reference/tests/data/cln025.pdb"


def make_featurizer(n_basis: int, outer: float) -> Multifeaturize:
    """Canonical id+gb featurizer with baked hyperparameters."""
    return Multifeaturize(
        [id_feat, Curry(gb_feat, inner=0.0, outer=outer, width=1.0, n_basis=n_basis)]
    )


def make_df(cv_results):
    """Tabulate CV output: one row per grid point."""
    import pandas as pd

    rows = []
    for label, score in cv_results[SCORES_KNAME].items():
        rows.append(
            {
                **label._asdict(),
                "score": score,
                "sd": cv_results[SDS_KNAME][label],
                "n_runs": cv_results[NRUNS_KNAME][label],
            }
        )
    return pd.DataFrame(rows).sort_values("score")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=1000)
    parser.add_argument("--folds", type=int, default=3)
    args = parser.parse_args()

    if not os.path.exists(PDB):
        raise SystemExit(f"missing topology fixture: {PDB}")
    fix = synthesize_protein_fixture(PDB, n_frames=args.frames, seed=31)
    cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))

    grid = {
        "featurizer": [make_featurizer(5, 1.0), make_featurizer(9, 2.0)],
        "l2_regularization": [1e1, 1e3],
    }
    results = project_forces_grid_cv(
        cv_arg_dict=grid,
        coords=fix["coords"],
        forces=fix["forces"],
        n_folds=args.folds,
        coord_map=cmap,
        constrained_inds=set(fix["constraint_groups"]),
        method=qp_feat_linear_map,
        kbt=float(fix["kbt"]),
        rng=np.random.default_rng(0),
    )
    df = make_df(results)
    print(df.to_string(index=False))
    best = df.iloc[0]
    print(
        f"\nbest grid point: l2={best['l2_regularization']} "
        f"(holdout residual {best['score']:.4f} ± {best['sd']:.4f})"
    )


if __name__ == "__main__":
    main()
