"""Statistical map-consistency tests (the reference's core validation idea).

Different valid force maps of the same system estimate the same mean-force
functional; projecting their mapped forces onto many random CG force-fields
must therefore produce strongly correlated values, and residual *differences*
(where mapping noise cancels) must agree tightly. A negative control checks
that the tests can actually detect a broken map.

Mirrors reference tests/test_forces.py:188-397 (basic vs optimized) and
:400-612 (featurized vs linear), and the negative control of
tests/test_gaussmap.py:329-407.
"""

import numpy as np
import pytest

from aggforce_tpu import jaxmapval as mv, project_forces
from aggforce_tpu.agg import TMAP_KNAME
from aggforce_tpu.qp import (
    Multifeaturize,
    constraint_aware_uni_map,
    gb_feat,
    id_feat,
    qp_feat_linear_map,
)
from aggforce_tpu.utils import Curry

PROJ_KWARGS = dict(inner=0.2, outer=1.2, width=0.5)
N_SAMPLES = 120


def _proj(coords, forces, seed=777):
    return np.array(
        mv.random_force_proj(
            coords=coords,
            forces=forces,
            n_samples=N_SAMPLES,
            randg=np.random.default_rng(seed),
            average=False,
            **PROJ_KWARGS,
        )
    )


def _shift(coords, forces, seed=778):
    return np.array(
        mv.random_residual_shift(
            coords=coords,
            forces=forces,
            n_samples=N_SAMPLES,
            randg=np.random.default_rng(seed),
            average=False,
            **PROJ_KWARGS,
        )
    )


@pytest.fixture(scope="module")
def fitted(cln_fixture_module, cln_ca_map_module):
    fix, cmap = cln_fixture_module, cln_ca_map_module
    coords, forces = fix["coords"], fix["forces"]
    constraints = set(fix["constraint_groups"])
    train = slice(0, 1400)
    test = slice(1400, None)
    basic = project_forces(
        coords=coords[train], forces=forces[train], coord_map=cmap,
        constrained_inds=constraints, method=constraint_aware_uni_map,
    )[TMAP_KNAME]
    opt = project_forces(
        coords=coords[train], forces=forces[train], coord_map=cmap,
        constrained_inds=constraints,
    )[TMAP_KNAME]
    feat = project_forces(
        coords=coords[train], forces=forces[train], coord_map=cmap,
        constrained_inds=constraints, method=qp_feat_linear_map,
        featurizer=Multifeaturize(
            [id_feat, Curry(gb_feat, inner=0.0, outer=2.0, width=1.0, n_basis=5)]
        ),
        kbt=float(fix["kbt"]),
        l2_regularization=1e3,
        constraint_rng=np.random.default_rng(0),
    )[TMAP_KNAME]
    data = {}
    for name, tmap in [("basic", basic), ("opt", opt), ("feat", feat)]:
        c, f = tmap.map_arrays(coords[test], forces[test])
        data[name] = (c, f)
    return data, cmap


def test_basic_vs_opt_projection_consistency(fitted):
    data, _ = fitted
    pa = _proj(*data["basic"])
    pb = _proj(*data["opt"])
    corr = np.corrcoef(pa, pb)[0, 1]
    rel = abs(pa.mean() - pb.mean()) / (abs(pa.mean()) + 1e-12)
    assert corr > 0.5, (corr, rel)
    assert rel < 0.08, (corr, rel)


def test_basic_vs_opt_residual_shift_consistency(fitted):
    data, _ = fitted
    sa = _shift(*data["basic"])
    sb = _shift(*data["opt"])
    corr = np.corrcoef(sa, sb)[0, 1]
    rel = abs(sa.mean() - sb.mean()) / (abs(sa.mean()) + 1e-12)
    assert corr > 0.99, (corr, rel)
    assert rel < 0.02, (corr, rel)


def test_feat_vs_opt_projection_consistency(fitted):
    """Featurized and linear optimal maps estimate the same projections.

    The mean-difference tolerance is looser than the correlation one: the
    divergence-corrected featurized estimator relies on unconstrained
    integration by parts, which is only approximate on the rigid-group
    synthetic ensemble, leaving a small systematic offset (the correlation
    across random basis functions is the sharp check).
    """
    data, _ = fitted
    pa = _proj(*data["feat"])
    pb = _proj(*data["opt"])
    corr = np.corrcoef(pa, pb)[0, 1]
    rel = abs(pa.mean() - pb.mean()) / (abs(pa.mean()) + 1e-12)
    assert corr > 0.99, (corr, rel)
    assert rel < 0.2, (corr, rel)


def test_feat_vs_opt_residual_shift_consistency(fitted):
    data, _ = fitted
    sa = _shift(*data["feat"])
    sb = _shift(*data["opt"])
    corr = np.corrcoef(sa, sb)[0, 1]
    assert corr > 0.99, corr


def test_negative_control_detects_broken_map(fitted, cln_fixture_module):
    """A deliberately wrong map (doubled coordinates) must FAIL the check."""
    data, _ = fitted
    c, f = data["opt"]
    pa = _proj(c, f)
    pb = _proj(2.0 * c, f)  # broken: coordinates scaled, projections shift
    rel = abs(pa.mean() - pb.mean()) / (abs(pa.mean()) + 1e-12)
    assert rel > 0.08, rel
