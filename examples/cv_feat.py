"""Cross-validated featurized force maps with hyperparameter grids.

Counterpart of the reference's examples/cv_feat.py (reference
examples/cv_feat.py:324-442): a realistic hyperparameter study for a
configuration-dependent force map on a CLN025-scale system —

  1. load data, build the C-alpha configurational map, detect constraints;
  2. score a configuration-INdependent control map by cross validation so
     the featurized results have a meaningful baseline;
  3. build a grid of composite id+gb featurizers (``gen_feater_grid``) over
     basis size / cutoff / width, crossed with l2 regularization values;
  4. run k-fold CV over the full grid — here every (featurizer, l2, fold)
     fit is dispatched through the single-pass device CV (one Gram pass per
     featurizer, all fold/l2 solves batched) instead of the reference's
     refit-per-triple loop;
  5. tabulate with pandas (``make_df``), drop constant columns (``prune``),
     save CSV, and refit the best configuration on the full data.

Run:  python examples/cv_feat.py  [--frames 2000] [--folds 5] [--quick]
"""

import argparse
import os
from itertools import product
from typing import Any, Dict, List

# honor an explicit JAX_PLATFORMS request even under environments whose
# sitecustomize pins a platform programmatically (config wins over env)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from aggforce_tpu import LinearMap
from aggforce_tpu.agg import (
    NRUNS_KNAME,
    SCORES_KNAME,
    SDS_KNAME,
    TMAP_KNAME,
    RESIDUAL_KNAME,
    project_forces,
    project_forces_grid_cv,
)
from aggforce_tpu.constraints import guess_pairwise_constraints
from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
from aggforce_tpu.utils import Curry
from aggforce_tpu.utils.pdblite import ca_map_from_pdb, n_atoms
from aggforce_tpu.utils.synth import synthesize_protein_fixture

PDB = "/root/reference/tests/data/cln025.pdb"

DEFAULT_FEAT_ARGS: Dict[str, Any] = {
    "inner": 0.0,
    "outer": 8.0,
    "width": 1.0,
    "n_basis": 7,
}


def gen_feater(**kwargs: Any) -> Multifeaturize:
    """Composite featurizer: one-hot identity features + curried gb_feat."""
    prod_kwargs = dict(DEFAULT_FEAT_ARGS)
    prod_kwargs.update(kwargs)
    return Multifeaturize([id_feat, Curry(gb_feat, **prod_kwargs)])


def gen_feater_grid(**kwargs: Any) -> List[Multifeaturize]:
    """All-combinations grid of composite featurizers.

    ``gen_feater_grid(n_basis=[5, 7], outer=[6.0, 8.0])`` yields the four
    featurizers with those hyperparameters baked in via Curry.
    """
    arg_keys, arg_values = zip(*kwargs.items())
    return [
        gen_feater(**dict(zip(arg_keys, values)))
        for values in product(*arg_values)
    ]


def make_df(cv_results, key: str = SCORES_KNAME):
    """Tabulate CV output: one row per grid point, hyperparameters unpacked.

    Featurizer labels are expanded into their curried gb_feat keyword
    arguments (mirroring the reference's make_df) so the table reads as a
    flat hyperparameter study.
    """
    import pandas as pd

    rows = []
    for label, value in cv_results[key].items():
        row: Dict[str, Any] = {}
        if hasattr(label, "featurizer"):
            row.update(label.featurizer.featurizers[1].kwargs)
        if hasattr(label, "l2_regularization"):
            row["l2"] = label.l2_regularization
        row[key] = value
        row["sd"] = cv_results[SDS_KNAME][label]
        row["n_runs"] = cv_results[NRUNS_KNAME][label]
        rows.append(row)
    return pd.DataFrame(rows).sort_values(key)


def prune(tab):
    """Drop columns carrying a single unique value (readability helper)."""
    for col in list(tab.columns):
        if tab[col].nunique(dropna=False) == 1:
            tab = tab.drop(col, axis=1)
    return tab


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=2000)
    parser.add_argument("--folds", type=int, default=5)
    parser.add_argument(
        "--quick", action="store_true", help="tiny grid for smoke runs"
    )
    parser.add_argument("--csv", default=None, help="write pruned table here")
    args = parser.parse_args()

    if not os.path.exists(PDB):
        raise SystemExit(f"missing topology fixture: {PDB}")
    fix = synthesize_protein_fixture(PDB, n_frames=args.frames, seed=31)
    coords, forces, kbt = fix["coords"], fix["forces"], float(fix["kbt"])
    cmap = LinearMap(ca_map_from_pdb(PDB), n_fg_sites=n_atoms(PDB))
    constraints = guess_pairwise_constraints(coords[:10], threshold=1e-3)

    # --- control: configuration-independent optimal map, same CV protocol ---
    control = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [1e3]},
        coords=coords,
        forces=forces,
        n_folds=args.folds,
        coord_map=cmap,
        constrained_inds=constraints,
        rng=np.random.default_rng(0),
    )
    control_score = next(iter(control[SCORES_KNAME].values()))
    print(f"static-map control holdout residual: {control_score:.4f}\n")

    # --- featurized hyperparameter study ---
    if args.quick:
        feats = gen_feater_grid(n_basis=[5, 7], outer=[8.0])
        l2s = [1e1, 1e3]
    else:
        feats = gen_feater_grid(
            n_basis=[5, 7, 9], outer=[6.0, 8.0], width=[1.0, 2.0]
        )
        l2s = [1e1, 1e2, 1e3, 1e4]
    grid = {"featurizer": feats, "l2_regularization": l2s}
    print(
        f"grid: {len(feats)} featurizers x {len(l2s)} l2 values "
        f"x {args.folds} folds = {len(feats) * len(l2s) * args.folds} fits"
    )
    results = project_forces_grid_cv(
        cv_arg_dict=grid,
        coords=coords,
        forces=forces,
        n_folds=args.folds,
        coord_map=cmap,
        constrained_inds=constraints,
        method=qp_feat_linear_map,
        kbt=kbt,
        rng=np.random.default_rng(0),
    )

    df = make_df(results)
    pruned = prune(df.copy())
    print(pruned.to_string(index=False))
    if args.csv:
        pruned.to_csv(args.csv)
        print(f"saved pruned table to {args.csv}")

    best_label = min(results[SCORES_KNAME], key=results[SCORES_KNAME].get)
    improvement = control_score / results[SCORES_KNAME][best_label]
    print(
        f"\nbest point: {best_label.featurizer.featurizers[1].kwargs} "
        f"l2={best_label.l2_regularization:g} "
        f"(residual {results[SCORES_KNAME][best_label]:.4f}, "
        f"{improvement:.2f}x below the static control)"
    )

    # --- refit the winner on the full trajectory ---
    final = project_forces(
        coords=coords,
        forces=forces,
        coord_map=cmap,
        constrained_inds=constraints,
        method=qp_feat_linear_map,
        featurizer=best_label.featurizer,
        l2_regularization=best_label.l2_regularization,
        kbt=kbt,
    )
    print(
        f"full-data refit residual: {final[RESIDUAL_KNAME]:.4f} "
        f"(tmap: {type(final[TMAP_KNAME]).__name__})"
    )


if __name__ == "__main__":
    main()
