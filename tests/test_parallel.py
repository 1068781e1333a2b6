"""Mesh-sharded fits on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.agg import force_smoothness
from aggforce_tpu.parallel import (
    make_mesh,
    sharded_force_smoothness,
    sharded_linear_fit,
)
from aggforce_tpu.qp import qp_linear_map
from aggforce_tpu.qp.qplinear import make_bond_constraint_matrix
from aggforce_tpu.trajectory import Trajectory

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) mesh"
)


@needs_mesh
def test_sharded_linear_fit_matches_single_device():
    rng = np.random.default_rng(0)
    n_frames, n_fg = 203, 9  # deliberately not divisible by the mesh size
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    constraints = {frozenset({1, 2})}
    cmap = LinearMap([[0], [4]], n_fg_sites=n_fg)
    con_mat = make_bond_constraint_matrix(n_fg, constraints)

    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    sharded = sharded_linear_fit(
        forces, con_mat.astype(np.float32), cmap.standard_matrix.astype(np.float32),
        l2_regularization=0.5, mesh=mesh,
    )
    single = qp_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        constraints=constraints,
        l2_regularization=0.5,
        solver_args={"backend": "host"},
    ).force_map.standard_matrix
    np.testing.assert_allclose(sharded, single, atol=2e-4)


@needs_mesh
def test_sharded_force_smoothness():
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(101, 5, 3)).astype(np.float32)
    got = sharded_force_smoothness(arr, mesh=make_mesh())
    np.testing.assert_allclose(got, force_smoothness(arr), rtol=1e-5)


@needs_mesh
def test_sharded_fused_feat_fit_matches_single_device():
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map

    rng = np.random.default_rng(3)
    n_frames, n_fg = 97, 8
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    cmap = LinearMap([[0], [4]], n_fg_sites=n_fg)
    constraints = {frozenset({1, 2})}
    spec = GBFeatSpec(outer=1.5, n_basis=4)
    common = dict(
        kbt=0.7,
        spec=spec,
        constraints=constraints,
        l2_regularization=1.0,
        n_constraint_frames=10,
    )
    traj = Trajectory(coords=coords, forces=forces)
    single = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(5), **common
    )
    sharded = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(5),
        mesh=make_mesh(axis_name="frames"), chunk_size=8, **common
    )
    _, f_single = single.map_arrays(coords[:20], forces[:20])
    _, f_sharded = sharded.map_arrays(coords[:20], forces[:20])
    np.testing.assert_allclose(f_sharded, f_single, atol=2e-3)


@needs_mesh
def test_sharded_pallas_feat_fit_matches_single_device():
    """Pallas gram inside shard_map (interpret mode on CPU) == single device."""
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map

    rng = np.random.default_rng(9)
    n_frames, n_fg = 70, 8
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    cmap = LinearMap([[0], [4]], n_fg_sites=n_fg)
    constraints = {frozenset({1, 2})}
    spec = GBFeatSpec(outer=1.5, n_basis=4)
    common = dict(
        kbt=0.7,
        spec=spec,
        constraints=constraints,
        l2_regularization=1.0,
        n_constraint_frames=10,
    )
    traj = Trajectory(coords=coords, forces=forces)
    single = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(5),
        use_pallas=True, **common,
    )
    sharded = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(5),
        mesh=make_mesh(axis_name="frames"), use_pallas=True, **common,
    )
    _, f_single = single.map_arrays(coords[:20], forces[:20])
    _, f_sharded = sharded.map_arrays(coords[:20], forces[:20])
    np.testing.assert_allclose(f_sharded, f_single, atol=2e-3)


@needs_mesh
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (4, 24)


@needs_mesh
def test_mesh_through_top_level_driver(waterdimer):
    """project_forces and grid CV accept mesh= and route it to the fused path."""
    from aggforce_tpu import project_forces
    from aggforce_tpu.agg import SCORES_KNAME, TMAP_KNAME, project_forces_grid_cv
    from aggforce_tpu.qp import Multifeaturize, gb_feat, id_feat, qp_feat_linear_map
    from aggforce_tpu.utils import Curry

    coords = waterdimer["coords"][:160]
    forces = waterdimer["forces"][:160]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    featurizer = Multifeaturize([id_feat, Curry(gb_feat, outer=1.0, n_basis=3)])
    res = project_forces(
        coords=coords, forces=forces, coord_map=cmap, constrained_inds=set(),
        method=qp_feat_linear_map, featurizer=featurizer, kbt=0.5,
        constraint_rng=np.random.default_rng(0), mesh=make_mesh(axis_name="frames"),
    )
    from aggforce_tpu.qp.fusedfeat import FusedGBMap

    assert isinstance(res[TMAP_KNAME].force_map, FusedGBMap)
    assert np.all(np.isfinite(res["mapped_forces"]))

    out = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [1e1, 1e3]},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), method=qp_feat_linear_map,
        featurizer=featurizer, kbt=0.5, rng=np.random.default_rng(1),
        mesh=make_mesh(axis_name="frames"),
    )
    assert all(np.isfinite(v) for v in out[SCORES_KNAME].values())

    # linear grid CV with a mesh: GSPMD-partitioned fold Grams
    out_lin = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [0.0, 1e2]},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), rng=np.random.default_rng(2),
        mesh=make_mesh(axis_name="frames"),
    )
    ref = project_forces_grid_cv(
        cv_arg_dict={"l2_regularization": [0.0, 1e2]},
        coords=coords, forces=forces, n_folds=3, coord_map=cmap,
        constrained_inds=set(), rng=np.random.default_rng(2),
    )
    for k, v in out_lin[SCORES_KNAME].items():
        np.testing.assert_allclose(v, ref[SCORES_KNAME][k], rtol=2e-3)


@needs_mesh
def test_qp_linear_map_mesh_matches_single_device(waterdimer):
    from aggforce_tpu import project_forces
    from aggforce_tpu.agg import TMAP_KNAME

    coords = waterdimer["coords"][:200]
    forces = waterdimer["forces"][:200]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    res_mesh = project_forces(
        coords=coords, forces=forces, coord_map=cmap, constrained_inds=set(),
        mesh=make_mesh(axis_name="frames"),
    )
    res_single = project_forces(
        coords=coords, forces=forces, coord_map=cmap, constrained_inds=set(),
    )
    np.testing.assert_allclose(
        res_mesh[TMAP_KNAME].force_map.standard_matrix,
        res_single[TMAP_KNAME].force_map.standard_matrix,
        atol=2e-4,
    )


def test_sharded_linear_fit_blocked_solver_dimension():
    """Mesh fit at a reduced dimension above the blocked-Cholesky threshold:
    the fori_loop panel kernels must compose with shard_map/psum and agree
    with the float64 host oracle."""
    from aggforce_tpu.ops.eqp import _BLOCKED_N_THRESHOLD
    from aggforce_tpu.qp.qplinear import _host_linear_fit

    rng = np.random.default_rng(11)
    n_fg = _BLOCKED_N_THRESHOLD + 44  # 300: forces the blocked path
    n_frames = 160
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    cmap_rows = [[i] for i in range(0, n_fg, n_fg // 4)][:4]
    cmap = LinearMap(cmap_rows, n_fg_sites=n_fg)
    con_mat = make_bond_constraint_matrix(n_fg, set())

    sharded = np.asarray(
        sharded_linear_fit(
            forces, con_mat.astype(np.float32),
            np.asarray(cmap.standard_matrix, dtype=np.float32),
            l2_regularization=1e-3, mesh=make_mesh(axis_name="frames"),
        )
    )
    oracle = _host_linear_fit(
        forces, con_mat.astype(np.float64), cmap.standard_matrix, 1e-3
    )
    np.testing.assert_allclose(sharded, oracle, atol=5e-4)
    # orthogonality of the fitted map
    ortho = np.asarray(cmap.standard_matrix) @ sharded.T
    np.testing.assert_allclose(ortho, np.eye(4), atol=1e-3)


def test_sharded_fit_escalates_unconverged_solves(waterdimer):
    """The mesh path must honor the same convergence contract as the
    single-device path: solves past resid_tol escalate to the f64 oracle."""
    from aggforce_tpu.qp.qplinear import qp_linear_map
    from aggforce_tpu.trajectory import Trajectory

    forces = waterdimer["forces"]
    coords = waterdimer["coords"]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    traj = Trajectory(coords=coords, forces=forces)
    # resid_tol=-1 forces escalation on every solve
    tmap = qp_linear_map(
        traj, cmap, constraints=set(), mesh=make_mesh(axis_name="frames"),
        solver_args={"resid_tol": -1.0},
    )
    fm = np.asarray(tmap.force_map.standard_matrix)
    assert np.all(np.isfinite(fm))
    expected = np.array([[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]], dtype=float)
    np.testing.assert_allclose(fm, expected, atol=5e-3)


def test_batch_fit_over_mesh_matches_single_device(
    cln_fixture_module, cln_ca_map_module
):
    """fused_gb_linear_map_batch(mesh=...): the frame-sharded shared-Gram
    window must reproduce the single-device batch per seed (up to f32
    Gram-reduction-order noise, which the well-conditioned protein
    fixture keeps small)."""
    import numpy as np

    from aggforce_tpu.parallel.mesh import make_mesh
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map_batch
    from aggforce_tpu.trajectory import Trajectory

    fix, cmap = cln_fixture_module, cln_ca_map_module
    coords = fix["coords"][:512].astype(np.float32)
    forces = fix["forces"][:512].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    spec = GBFeatSpec(outer=8.0, inner=0.0, n_basis=3, width=1.0)
    kw = dict(
        kbt=float(fix["kbt"]), spec=spec, seeds=[3, 4, 5],
        constraints=set(fix["constraint_groups"]),
        l2_regularization=1e3, flush_every=4,
    )
    mesh = make_mesh()
    assert mesh.devices.size > 1
    batch_mesh = fused_gb_linear_map_batch(traj, cmap, mesh=mesh, **kw)
    batch_one = fused_gb_linear_map_batch(traj, cmap, **kw)
    assert len(batch_mesh) == len(batch_one) == 3
    for tm, to in zip(batch_mesh, batch_one):
        _, fm = tm.map_arrays(coords[:16], forces[:16])
        _, fo = to.map_arrays(coords[:16], forces[:16])
        scale = np.abs(np.asarray(fo)).max()
        np.testing.assert_allclose(
            np.asarray(fm), np.asarray(fo), atol=2e-3 * scale
        )


def test_shared_solve_mesh_matches_replicated():
    """Sharded shared-factor solve == replicated solver, per problem.

    Covers both partitions riding the mesh axis: sites (10, non-multiple
    of 8 -> identity padding) for the factorization and fits (5,
    non-multiple -> repeat padding) for the Schur stage.
    """
    import jax.numpy as jnp

    from aggforce_tpu.ops.eqp import (
        batched_eqp_solve_shared,
        batched_eqp_solve_shared_mesh,
    )

    rng = np.random.default_rng(11)
    f, s, m, n = 5, 10, 13, 40
    A_ = rng.normal(size=(s, n, n)).astype(np.float32)
    P = jnp.asarray(
        A_ @ A_.transpose(0, 2, 1) / n + 0.5 * np.eye(n, dtype=np.float32)
    )
    A = jnp.asarray(rng.normal(size=(f, s, m, n)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(f, s, m, 1)).astype(np.float32))
    x_ref, r_ref = batched_eqp_solve_shared(
        P, A, B, iters=40, return_resid=True
    )
    x_mesh, r_mesh = batched_eqp_solve_shared_mesh(
        P, A, B, mesh=make_mesh(), iters=40, return_resid=True
    )
    assert x_mesh.shape == x_ref.shape
    np.testing.assert_allclose(
        np.asarray(x_mesh), np.asarray(x_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_mesh), np.asarray(r_ref), rtol=1e-3, atol=1e-6
    )


def test_batch_mesh_fit_uses_sharded_solve(waterdimer):
    """Batched mesh fits match single-device batched fits seed for seed."""
    import jax.numpy as jnp

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords, forces = waterdimer["coords"], waterdimer["forces"]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    constraints = {
        frozenset((0, 1)), frozenset((0, 2)), frozenset((1, 2)),
        frozenset((3, 4)), frozenset((3, 5)), frozenset((4, 5)),
    }
    traj = Trajectory(
        coords=jnp.asarray(coords, jnp.float32),
        forces=jnp.asarray(forces, jnp.float32),
    )
    spec = GBFeatSpec(outer=1.0, n_basis=5)
    common = dict(
        kbt=0.6955215, spec=spec, constraints=constraints,
        l2_regularization=10.0, n_constraint_frames=8,
    )
    plain = fused_gb_linear_map_batch(traj, cmap, seeds=range(5), **common)
    meshed = fused_gb_linear_map_batch(
        traj, cmap, seeds=range(5), mesh=make_mesh(), **common
    )
    # coefs live in a weakly-determined basis where f32 Gram
    # reduction-order differences (mesh psum vs serial scan) swing them;
    # the physical output — mapped forces — is the stable comparison
    for a, b in zip(plain, meshed):
        _, fa = a.map_arrays(coords[:32], forces[:32])
        _, fb = b.map_arrays(coords[:32], forces[:32])
        scale = np.abs(np.asarray(fa)).max()
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), atol=2e-3 * scale
        )


def test_staged_gauss_mesh_matches_unsharded():
    """Mesh-composed fused staged-Gaussian pipeline == unsharded, seed for seed.

    GSPMD partitioning is value-semantic: the frame-sharded program must
    reproduce the unsharded one's noise draws and fits exactly up to f32
    reduction order (compared through mapped outputs).
    """
    import jax.numpy as jnp

    from aggforce_tpu.qp.jgauss import stagedjoptgauss_map
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(3)
    coords = rng.normal(size=(64, 9, 3)).astype(np.float32)
    forces = rng.normal(size=(64, 9, 3)).astype(np.float32)
    cmap = LinearMap([[0, 1, 2], [3, 4, 5], [6, 7, 8]], n_fg_sites=9)
    traj = Trajectory(
        coords=jnp.asarray(coords), forces=jnp.asarray(forces)
    )
    plain = stagedjoptgauss_map(traj, cmap, var=0.3, kbt=0.7, seed=11)
    meshed = stagedjoptgauss_map(
        traj, cmap, var=0.3, kbt=0.7, seed=11, mesh=make_mesh()
    )
    # the noised map redraws per application; the FITTED pieces are the
    # deterministic artifacts to compare (premap + noise-site force maps)
    # submap [1] is the deterministic premap stage (rightmost applies
    # first); its fitted force map is the artifact to compare
    f_plain = plain[1].force_map.standard_matrix
    f_mesh = meshed[1].force_map.standard_matrix
    np.testing.assert_allclose(
        np.asarray(f_mesh), np.asarray(f_plain), atol=5e-5
    )
