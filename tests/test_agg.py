"""End-to-end linear optimization: water dimer and synthetic fixtures.

Mirrors the reference's headline integration check (tests/test_agg.py:17-44):
the optimal force map for an oxygen-slice coordinate map on a flexible water
dimer aggregates whole molecules, [[1,1,1,0,0,0],[0,0,0,1,1,1]].
"""

import numpy as np
import pytest

from aggforce_tpu import LinearMap, project_forces
from aggforce_tpu.agg import (
    CONSTRAINTS_KNAME,
    RESIDUAL_KNAME,
    TMAP_KNAME,
    force_smoothness,
)
from aggforce_tpu.qp import constraint_aware_uni_map

AGG_EXPECT = np.array(
    [[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]], dtype=float
)


@pytest.mark.parametrize("backend", ["host", "device"])
def test_waterdimer_optimal_map(waterdimer, backend):
    forces = waterdimer["forces"]
    cmap = LinearMap([[0], [3]], n_fg_sites=forces.shape[1], handle_nans=False)
    coords = np.full_like(forces, np.nan)  # exercises NaN-tolerant path
    res = project_forces(
        coords=coords,
        forces=forces,
        coord_map=cmap,
        constrained_inds=set(),
        solver_args={"backend": backend},
    )
    fmap = res[TMAP_KNAME].force_map
    np.testing.assert_allclose(fmap.standard_matrix, AGG_EXPECT, atol=5e-3)
    # residual of the optimal map must beat the raw oxygen-slice map
    slice_res = force_smoothness(forces[:, [0, 3], :])
    assert res[RESIDUAL_KNAME] < slice_res


def test_waterdimer_reference_solver_options(waterdimer):
    """Reference-style OSQP/SCS option dicts are accepted and ignored."""
    forces = waterdimer["forces"]
    cmap = LinearMap([[0], [3]], n_fg_sites=forces.shape[1], handle_nans=False)
    res = project_forces(
        coords=np.full_like(forces, np.nan),
        forces=forces,
        coord_map=cmap,
        constrained_inds=set(),
        solver_args={"solver": "scs", "eps_abs": 1e-7, "max_iter": 1000,
                     "polish": True},
    )
    np.testing.assert_allclose(
        res[TMAP_KNAME].force_map.standard_matrix, AGG_EXPECT, atol=5e-3
    )


def test_synthetic_dimer_optimal_map():
    from aggforce_tpu.utils.synth import synthesize_dimer_fixture

    data = synthesize_dimer_fixture(n_frames=4000)
    cmap = LinearMap([[0], [3]], n_fg_sites=6, handle_nans=False)
    res = project_forces(
        coords=data["coords"],
        forces=data["forces"],
        coord_map=cmap,
        constrained_inds=set(),
        solver_args={"backend": "host"},
    )
    np.testing.assert_allclose(
        res[TMAP_KNAME].force_map.standard_matrix, AGG_EXPECT, atol=3e-2
    )


def test_auto_constraints_and_uni_map(cln_fixture, cln_ca_map):
    coords = cln_fixture["coords"][:200]
    forces = cln_fixture["forces"][:200]
    res = project_forces(
        coords=coords,
        forces=forces,
        coord_map=cln_ca_map,
        constrained_inds="auto",
        method=constraint_aware_uni_map,
    )
    found = res[CONSTRAINTS_KNAME]
    from aggforce_tpu.constraints import reduce_constraint_sets

    expected_groups = reduce_constraint_sets(
        set(cln_fixture["constraint_groups"])
    )
    assert reduce_constraint_sets(found) == expected_groups
    # force map rows are 0/1 and aggregate at least the CA's constraint group
    fmap = res[TMAP_KNAME].force_map.standard_matrix
    assert set(np.unique(fmap)) <= {0.0, 1.0}
    for row, members in zip(fmap, cln_ca_map.participating_fg):
        ca = members[0]
        for group in expected_groups:
            if ca in group:
                assert all(row[i] == 1.0 for i in group)


def test_device_resident_pipeline_stays_on_device(cln_fixture, cln_ca_map):
    """Fitting on jax arrays must return maps that keep jax arrays on device."""
    import jax
    import jax.numpy as jnp

    from aggforce_tpu.map import JLinearMap
    from aggforce_tpu.qp import qp_linear_map
    from aggforce_tpu.trajectory import Trajectory

    coords = jnp.asarray(cln_fixture["coords"][:200])
    forces = jnp.asarray(cln_fixture["forces"][:200])
    tmap = qp_linear_map(
        Trajectory(coords=coords, forces=forces),
        cln_ca_map,
        constraints=set(cln_fixture["constraint_groups"]),
    )
    assert isinstance(tmap.force_map, JLinearMap)
    mapped = tmap.force_map(forces)
    assert isinstance(mapped, jax.Array)
    # numpy callers still get numpy out
    mapped_np = tmap.force_map(np.asarray(forces))
    assert isinstance(mapped_np, np.ndarray)


def test_optimal_map_obeys_orthogonality(cln_fixture, cln_ca_map):
    """Force map must satisfy M F^T = I (constraint orthogonality)."""
    coords = cln_fixture["coords"][:500]
    forces = cln_fixture["forces"][:500]
    res = project_forces(
        coords=coords,
        forces=forces,
        coord_map=cln_ca_map,
        constrained_inds=set(cln_fixture["constraint_groups"]),
        solver_args={"backend": "host"},
    )
    fmat = res[TMAP_KNAME].force_map.standard_matrix
    gram = cln_ca_map.standard_matrix @ fmat.T
    np.testing.assert_allclose(gram, np.eye(cln_ca_map.n_cg_sites), atol=1e-6)


def test_optimal_beats_basic(cln_fixture, cln_ca_map):
    """In-sample, the optimal map must beat any feasible map (basic is one)."""
    coords = cln_fixture["coords"]
    forces = cln_fixture["forces"]
    constraints = set(cln_fixture["constraint_groups"])
    train, test = slice(0, 1500), slice(1500, None)
    opt = project_forces(
        coords=coords[train],
        forces=forces[train],
        coord_map=cln_ca_map,
        constrained_inds=constraints,
    )[TMAP_KNAME]
    basic = constraint_aware_uni_map(
        traj=None, coord_map=cln_ca_map, constraints=constraints
    )
    # exact optimality guarantee holds on the training frames
    _, opt_train = opt.map_arrays(coords[train], forces[train])
    _, basic_train = basic.map_arrays(coords[train], forces[train])
    assert force_smoothness(opt_train) <= force_smoothness(basic_train) * (1 + 1e-5)
    # on holdout, allow sampling slack but demand comparable quality
    _, opt_forces = opt.map_arrays(coords[test], forces[test])
    _, basic_forces = basic.map_arrays(coords[test], forces[test])
    assert force_smoothness(opt_forces) <= force_smoothness(basic_forces) * 1.2


def test_constrained_pairs_share_coefficients(cln_fixture, cln_ca_map):
    res = project_forces(
        coords=cln_fixture["coords"][:300],
        forces=cln_fixture["forces"][:300],
        coord_map=cln_ca_map,
        constrained_inds=set(cln_fixture["constraint_groups"]),
    )
    fmat = res[TMAP_KNAME].force_map.standard_matrix
    from aggforce_tpu.constraints import reduce_constraint_sets

    for group in reduce_constraint_sets(set(cln_fixture["constraint_groups"])):
        members = sorted(group)
        cols = fmat[:, members]
        for j in range(1, len(members)):
            np.testing.assert_allclose(cols[:, j], cols[:, 0], atol=1e-5)
