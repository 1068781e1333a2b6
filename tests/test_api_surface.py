"""Public-API parity: every reference entry point exists at the analogous
path with a compatible call surface (SURVEY.md §2 inventory; BASELINE.json
requires the public API to match the reference)."""
# ruff: noqa: F401  # importing the surface IS the test

import inspect

import numpy as np
import pytest


def test_top_level_exports():
    import aggforce_tpu as ag

    for name in [
        "Trajectory",
        "project_forces",
        "guess_pairwise_constraints",
        "qp_linear_map",
        "constraint_aware_uni_map",
        "LinearMap",
        "joptgauss_map",
        "stagedjoptgauss_map",
        "stagedjslicegauss_map",
        "stagedjforcegauss_map",
    ]:
        assert hasattr(ag, name), name


def test_map_module_exports():
    from aggforce_tpu.map import (  # noqa: F401
        LinearMap,
        CLAMap,
        TMap,
        SeperableTMap,
        CLAFTMap,
        AugmentedTMap,
        ComposedTMap,
        NullForcesTMap,
        RATMap,
        lmap_augvariables,
        smear_map,
        jaxify_linearmap,
        JLinearMap,
        trjdot,
    )


def test_qp_module_exports():
    from aggforce_tpu.qp import (  # noqa: F401
        qp_linear_map,
        qp_form,
        make_bond_constraint_matrix,
        constraint_aware_uni_map,
        FeatZipper,
        Multifeaturize,
        GeneralizedFeatures,
        GeneralizedFeaturizer,
        qp_feat_linear_map,
        id_feat,
        gb_feat,
        joptgauss_map,
        stagedjoptgauss_map,
        stagedjslicegauss_map,
        stagedjforcegauss_map,
    )


def test_trajectory_module_exports():
    from aggforce_tpu.trajectory import (  # noqa: F401
        ForcesTrajectory,
        CoordsTrajectory,
        Trajectory,
        AugmentedTrajectory,
        Augmenter,
        JCondNormal,
    )


def test_constraints_module_exports():
    from aggforce_tpu.constraints import (  # noqa: F401
        Constraints,
        guess_pairwise_constraints,
        reduce_constraint_sets,
        constraint_lookup_dict,
    )


def test_util_alias_modules():
    from aggforce_tpu.util import trjdot, distances, flatten, curry, Curry  # noqa: F401
    from aggforce_tpu.jaxutil import trjdot as jtrjdot, abatch, distances as jd  # noqa: F401
    from aggforce_tpu import jaxmapval

    for name in [
        "random_force_proj",
        "random_residual_shift",
        "mscg_ip",
        "rsqpg_forces",
        "sq_gaussian_energies",
        "sq_gaussian_forces",
        "random_uniform_forces",
    ]:
        assert hasattr(jaxmapval, name), name


def test_agg_constants_and_keys(waterdimer):
    from aggforce_tpu import LinearMap, project_forces
    from aggforce_tpu.agg import (
        CONSTRAINTS_KNAME,
        NRUNS_KNAME,
        PROJCOORDS_KNAME,
        PROJFORCES_KNAME,
        RESIDUAL_KNAME,
        SCORES_KNAME,
        SDS_KNAME,
        TMAP_KNAME,
        force_smoothness,
        project_forces_grid_cv,
    )

    forces = waterdimer["forces"][:50]
    coords = waterdimer["coords"][:50]
    res = project_forces(
        coords=coords,
        forces=forces,
        coord_map=LinearMap([[0], [3]], n_fg_sites=6),
        constrained_inds=set(),
    )
    assert set(res.keys()) == {
        PROJCOORDS_KNAME,
        PROJFORCES_KNAME,
        TMAP_KNAME,
        RESIDUAL_KNAME,
        CONSTRAINTS_KNAME,
    }


def test_reference_signature_kwargs():
    """Keyword names users pass in reference code must be accepted."""
    from aggforce_tpu import qp_linear_map
    from aggforce_tpu.qp import qp_feat_linear_map
    from aggforce_tpu.qp.jgauss import joptgauss_map, stagedjoptgauss_map

    params = inspect.signature(qp_linear_map).parameters
    for name in ["traj", "coord_map", "constraints", "l2_regularization",
                 "solver_args"]:
        assert name in params, name
    params = inspect.signature(qp_feat_linear_map).parameters
    for name in ["traj", "coord_map", "featurizer", "kbt",
                 "n_constraint_frames", "constraints", "sparse",
                 "solver_args", "l2_regularization"]:
        assert name in params, name
    params = inspect.signature(joptgauss_map).parameters
    for name in ["traj", "coord_map", "var", "kbt", "constraints", "seed"]:
        assert name in params, name
    params = inspect.signature(stagedjoptgauss_map).parameters
    for name in ["force_map", "premap_l2_regularization",
                 "premap_solver_args"]:
        assert name in params, name


def test_lazy_protocol_featurizer_path(waterdimer):
    """gb_feat's lazy generators through the generic protocol solver."""
    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
    from aggforce_tpu.trajectory import Trajectory
    from aggforce_tpu.utils import Curry

    coords = waterdimer["coords"][:80]
    forces = waterdimer["forces"][:80]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    m = Multifeaturize(
        [id_feat, Curry(gb_feat, outer=1.0, n_basis=3, lazy=True, batch_size=32)]
    )
    tmap = qp_feat_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        featurizer=m,
        kbt=0.5,
        constraints=set(),
        l2_regularization=10.0,
        constraint_rng=np.random.default_rng(0),
        allow_fused=False,  # force the generic protocol path
    )
    _, mapped = tmap.map_arrays(coords[:10], forces[:10])
    assert np.isfinite(mapped).all()


def test_models_registry(waterdimer):
    from aggforce_tpu import LinearMap, project_forces
    from aggforce_tpu.models import MAP_FAMILIES, available_families, get_map_builder

    assert set(available_families()) == set(MAP_FAMILIES)
    with pytest.raises(ValueError):
        get_map_builder("bogus")
    res = project_forces(
        coords=waterdimer["coords"][:40],
        forces=waterdimer["forces"][:40],
        coord_map=LinearMap([[0], [3]], n_fg_sites=6),
        constrained_inds=set(),
        method=get_map_builder("basic"),
    )
    assert np.isfinite(res["mapped_forces"]).all()


def test_curry_semantics():
    from aggforce_tpu.utils import Curry, curry

    def f(a, b, c=0):
        return (a, b, c)

    g = curry(f, 2, c=3)
    assert g(1) == (1, 2, 3)
    h = Curry(f, 2, c=3)
    assert h(1) == (1, 2, 3)
    assert "Curry" in repr(h)
