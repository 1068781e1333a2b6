"""Featurized force-map optimization: protocol path, fused path, parity."""

import numpy as np
import pytest

from aggforce_tpu import LinearMap
from aggforce_tpu.constraints import reduce_constraint_sets
from aggforce_tpu.qp import (
    Multifeaturize,
    id_feat,
    gb_feat,
    qp_feat_linear_map,
    qp_linear_map,
)
from aggforce_tpu.qp.featlinearmap import FeatZipper
from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
from aggforce_tpu.trajectory import Trajectory
from aggforce_tpu.utils import Curry


@pytest.fixture()
def rng():
    return np.random.default_rng(77)


@pytest.fixture()
def small_system(rng):
    n_frames, n_fg = 120, 8
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32) * 0.3
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    cmap = LinearMap([[0], [4]], n_fg_sites=n_fg)
    constraints = {frozenset({1, 2}), frozenset({5, 6})}
    return coords, forces, cmap, constraints


def test_id_feat_structure(small_system):
    coords, _, cmap, constraints = small_system
    out = id_feat(coords, cmap, constraints)
    feats = list(out["feats"])
    divs = list(out["divs"])
    assert len(feats) == cmap.n_cg_sites
    f = feats[0]
    n_groups = len(
        reduce_constraint_sets(
            constraints | {frozenset([i]) for i in range(8)}
        )
    )
    assert f.shape == (coords.shape[0], 8, n_groups)
    # one-hot rows; constrained pairs share a column
    np.testing.assert_allclose(f.sum(axis=2), 1.0)
    np.testing.assert_array_equal(f[:, 1, :], f[:, 2, :])
    np.testing.assert_array_equal(f[:, 5, :], f[:, 6, :])
    assert not (f[:, 1, :] == f[:, 5, :]).all()
    assert (divs[0] == 0).all()


def test_id_feat_return_ids(small_system):
    coords, _, cmap, constraints = small_system
    ids = id_feat(coords, cmap, constraints, return_ids=True)
    assert ids.shape == (8,)
    assert ids[1] == ids[2]
    assert ids[5] == ids[6]
    assert ids[0] != ids[1]


def test_gb_feat_shapes_and_constraint_sharing(small_system):
    coords, _, cmap, constraints = small_system
    out = gb_feat(coords, cmap, constraints, outer=1.0, n_basis=5, lazy=False)
    feats = out["feats"]
    divs = out["divs"]
    assert len(feats) == 2
    t, n = coords.shape[:2]
    ids = id_feat(coords, cmap, constraints, return_ids=True)
    n_channels = ids.max() + 1
    assert feats[0].shape == (t, n, 5 * n_channels)
    assert divs[0].shape == (t, 5 * n_channels, 3)
    # constrained (smeared) atoms have identical features
    np.testing.assert_allclose(feats[0][:, 1, :], feats[0][:, 2, :], atol=1e-6)
    # different cg sites give different features
    assert not np.allclose(feats[0], feats[1])


@pytest.mark.parametrize("method_pair", [("closed", "reorder"), ("closed", "basic")])
def test_divergence_methods_agree(small_system, method_pair):
    coords, _, cmap, _ = small_system
    # constrain each cg atom to a partner: the smeared position then differs
    # from the cg point, so the autodiff reference paths (which NaN at
    # coincident points, as in the upstream implementation) stay finite.
    constraints = {frozenset({0, 3}), frozenset({4, 7}), frozenset({1, 2})}
    subset = coords[:6]
    outs = []
    for method in method_pair:
        out = gb_feat(
            subset, cmap, constraints, outer=1.0, n_basis=4, lazy=False,
            div_method=method,
        )
        outs.append(np.stack(out["divs"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4, rtol=1e-3)


def test_featzipper_concatenates(small_system):
    coords, _, cmap, constraints = small_system
    a = id_feat(coords, cmap, constraints)
    b = gb_feat(coords, cmap, constraints, outer=1.0, n_basis=3, lazy=False)
    na = a["feats"][0].shape[2]
    nb = b["feats"][0].shape[2]
    z = FeatZipper(content=[a, b])
    feats = list(z["feats"])
    divs = list(z["divs"])
    assert len(feats) == cmap.n_cg_sites
    assert feats[0].shape[2] == na + nb
    assert divs[0].shape[1] == na + nb
    np.testing.assert_array_equal(feats[0][..., :na], a["feats"][0])
    assert z["names"] is None
    with pytest.raises(KeyError):
        z["bogus"]
    assert z.keys() == frozenset({"feats", "divs", "names"})


def test_multifeaturize_callable(small_system):
    coords, _, cmap, constraints = small_system
    m = Multifeaturize([id_feat, Curry(gb_feat, outer=1.0, n_basis=3, lazy=False)])
    z = m(coords, cmap, constraints)
    assert isinstance(z, FeatZipper)
    repr(m), str(m)  # smoke


def test_idfeat_qp_matches_linear_qp(small_system):
    """id_feat-only featurized map == constrained linear map (both l2=0)."""
    coords, forces, cmap, constraints = small_system
    traj = Trajectory(coords=coords, forces=forces)
    lin = qp_linear_map(
        traj, cmap, constraints=constraints, solver_args={"backend": "host"}
    )
    feat = qp_feat_linear_map(
        traj,
        cmap,
        featurizer=id_feat,
        kbt=0.5,
        constraints=constraints,
        l2_regularization=0.0,
        n_constraint_frames=10,
        solver_args={"backend": "host"},
        constraint_rng=np.random.default_rng(0),
    )
    _, lin_forces = lin.map_arrays(coords, forces)
    _, feat_forces = feat.map_arrays(coords, forces)
    np.testing.assert_allclose(lin_forces, feat_forces, atol=2e-3)


def test_feat_map_satisfies_sampled_orthogonality(small_system):
    coords, forces, cmap, constraints = small_system
    traj = Trajectory(coords=coords, forces=forces)
    m = Multifeaturize([id_feat, Curry(gb_feat, outer=1.0, n_basis=4, lazy=False)])
    tmap = qp_feat_linear_map(
        traj, cmap, featurizer=m, kbt=0.5, constraints=constraints,
        l2_regularization=1.0,
        constraint_rng=np.random.default_rng(0),
        solver_args={"backend": "host"},
    )
    # scale weights applied to the coordinate map must reproduce identity rows
    scale = tmap.force_map.scale(coords[:5])
    proj = np.einsum("cj,tsj->tsc", cmap.standard_matrix, scale)
    expect = np.broadcast_to(np.eye(2), (5, 2, 2))
    np.testing.assert_allclose(proj, expect, atol=1e-3)


def test_fused_matches_protocol(small_system):
    """Fused device fit must agree with the protocol (host-oracle) fit."""
    coords, forces, cmap, constraints = small_system
    traj = Trajectory(coords=coords, forces=forces)
    spec = GBFeatSpec(outer=1.0, inner=0.0, n_basis=4, width=1.0)
    m = Multifeaturize(
        [
            id_feat,
            Curry(
                gb_feat,
                outer=spec.outer,
                inner=spec.inner,
                n_basis=spec.n_basis,
                width=spec.width,
                dist_power=spec.dist_power,
                lazy=False,
            ),
        ]
    )
    kbt = 0.5
    # use every frame as a constraint frame so both paths share the same
    # feasible set regardless of per-site sampling order
    n_cf = len(coords)
    proto = qp_feat_linear_map(
        traj, cmap, featurizer=m, kbt=kbt, constraints=constraints,
        l2_regularization=1.0,
        constraint_rng=np.random.default_rng(42),
        n_constraint_frames=n_cf,
        solver_args={"backend": "host"},
    )
    fused = fused_gb_linear_map(
        traj, cmap, kbt=kbt, spec=spec, constraints=constraints,
        l2_regularization=1.0,
        constraint_rng=np.random.default_rng(42),
        n_constraint_frames=n_cf,
    )
    test_coords = coords[:30]
    test_forces = forces[:30]
    _, f_proto = proto.map_arrays(test_coords, test_forces)
    _, f_fused = fused.map_arrays(test_coords, test_forces)
    scale = np.abs(f_proto).mean()
    # the device solver carries a ~3e-4 relative regularization bias (delta
    # sits above the float32 Gram noise floor); weakly-determined entries
    # amplify it, hence the tolerance
    np.testing.assert_allclose(f_fused, f_proto, atol=1e-2 * scale)


def test_auto_dispatch_to_fused(small_system):
    """The reference-style API call must route to the fused fast path."""
    from aggforce_tpu.map import CLAFTMap
    from aggforce_tpu.qp.fusedfeat import FusedGBMap, recognize_canonical_featurizer

    coords, forces, cmap, constraints = small_system
    gb_curry = Curry(gb_feat, inner=0.0, outer=1.0, width=1.0, n_basis=4,
                     lazy=True, batch_size=100)
    m = Multifeaturize([id_feat, gb_curry])
    spec = recognize_canonical_featurizer(m)
    assert spec is not None
    assert spec.n_basis == 4 and spec.include_id

    traj = Trajectory(coords=coords, forces=forces)
    tmap = qp_feat_linear_map(
        traj, cmap, featurizer=m, kbt=0.5, constraints=constraints,
        l2_regularization=1.0, constraint_rng=np.random.default_rng(0),
    )
    assert isinstance(tmap, CLAFTMap)
    assert isinstance(tmap.force_map, FusedGBMap)
    # unknown featurizers never dispatch
    assert recognize_canonical_featurizer(id_feat) is None
    assert recognize_canonical_featurizer(
        Curry(gb_feat, outer=1.0, div_method="basic")
    ) is None


def test_kbt_changes_divergence_term(small_system):
    coords, forces, cmap, constraints = small_system
    traj = Trajectory(coords=coords, forces=forces)
    spec = GBFeatSpec(outer=1.0, n_basis=4)
    maps = [
        fused_gb_linear_map(
            traj, cmap, kbt=k, spec=spec, constraints=constraints,
            constraint_rng=np.random.default_rng(1),
        )
        for k in (0.1, 2.0)
    ]
    outs = [m.map_arrays(coords[:20], forces[:20])[1] for m in maps]
    assert not np.allclose(outs[0], outs[1], atol=1e-5)


def test_fused_fit_short_trajectory_clamps_constraint_frames(waterdimer):
    """n_constraint_frames > n_frames must clamp, not raise (found by probe)."""
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:9]
    forces = waterdimer["forces"][:9]
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    tmap = fused_gb_linear_map(
        Trajectory(coords=coords, forces=forces),
        cmap,
        kbt=0.7,
        spec=GBFeatSpec(outer=1.5, n_basis=3),
        constraints={frozenset({1, 2})},
        l2_regularization=1.0,
        n_constraint_frames=20,  # > 9 frames
        constraint_rng=np.random.default_rng(0),
    )
    _, mf = tmap.map_arrays(coords, forces)
    assert np.all(np.isfinite(mf))


def test_fused_batch_matches_single(waterdimer):
    """Pipelined multi-seed fits must equal one-at-a-time fits."""
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:160].astype(np.float32)
    forces = waterdimer["forces"][:160].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kw = dict(kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3)
    batch = fused_gb_linear_map_batch(traj, cmap, seeds=[3, 4], **kw)
    assert len(batch) == 2
    for seed, tmap_b in zip([3, 4], batch):
        tmap_s = fused_gb_linear_map(
            traj, cmap, constraint_rng=np.random.default_rng(seed), **kw
        )
        _, f_b = tmap_b.map_arrays(coords[:16], forces[:16])
        _, f_s = tmap_s.map_arrays(coords[:16], forces[:16])
        np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_s), atol=1e-5)


def test_fused_batch_windows_and_tail(waterdimer):
    """Window splitting + tail padding must preserve per-seed results."""
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:96].astype(np.float32)
    forces = waterdimer["forces"][:96].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kw = dict(kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3)
    seeds = [11, 12, 13, 14, 15]  # flush_every=2 -> windows 2+2+1 (padded tail)
    batch = fused_gb_linear_map_batch(traj, cmap, seeds=seeds, flush_every=2, **kw)
    assert len(batch) == len(seeds)
    for seed, tmap_b in zip(seeds, batch):
        tmap_s = fused_gb_linear_map(
            traj, cmap, constraint_rng=np.random.default_rng(seed), **kw
        )
        _, f_b = tmap_b.map_arrays(coords[:8], forces[:8])
        _, f_s = tmap_s.map_arrays(coords[:8], forces[:8])
        np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_s), atol=1e-5)


def test_fused_batch_tail_padding_warns(waterdimer):
    """A tail window dominated by padding must emit a real warning
    (warnings.warn, catchable by user filters), and the padded fits must
    still be correct. Matches the reference's warning discipline
    (reference map/tmap.py:356-359)."""
    import numpy as np
    import pytest

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map_batch
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:64].astype(np.float32)
    forces = waterdimer["forces"][:64].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    # 5 seeds over 4-fit windows -> tail of 1 seed padded by 3 (> 1 valid)
    with pytest.warns(UserWarning, match="padded to the 4-fit window"):
        batch = fused_gb_linear_map_batch(
            traj, cmap, kbt=0.5, spec=spec, seeds=range(5),
            constraints=set(), l2_regularization=1e3, flush_every=4,
        )
    assert len(batch) == 5
    for tmap in batch:
        _, mf = tmap.map_arrays(coords[:4], forces[:4])
        assert np.all(np.isfinite(mf))


def test_fused_batch_lazy_coef_tags(waterdimer):
    """Batched maps defer the coefficient fetch: tags behave as a plain
    dict, `solver_resid` reads must NOT materialize the device->host copy,
    and `coef_list` reads must produce the same rows as the single fit."""
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        _LazyCoefTags,
        fused_gb_linear_map,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:96].astype(np.float32)
    forces = waterdimer["forces"][:96].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    # loose resid_tol keeps the f32 device solve (no escalation): the lazy
    # packaging exists precisely for converged device-resident results
    kw = dict(
        kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3,
        resid_tol=0.5,
    )
    batch = fused_gb_linear_map_batch(traj, cmap, seeds=[9], **kw)
    tags = batch[0].force_map.tags
    assert isinstance(tags, _LazyCoefTags)
    # reading other keys leaves the device handle unmaterialized
    assert tags["solver_resid"] >= 0.0
    assert tags._coefs_dev is not None
    # coef_list access materializes and matches the single fit's rows
    single = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(9), **kw
    )
    got = np.stack(tags["coef_list"])
    want = np.stack(single.force_map.tags["coef_list"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert tags._coefs_dev is None
    # whole-dict views include the materialized key
    assert set(tags.keys()) == {"solver_resid", "coef_list"}
    assert "coef_list" in dict(tags.copy())


def test_fused_batch_escalation_materializes_deferred_rows(waterdimer):
    """Batch fits that miss tolerance must materialize their deferred
    constraint systems and recover via the float64 oracle."""
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map_batch
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:64].astype(np.float32)
    forces = waterdimer["forces"][:64].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    batch = fused_gb_linear_map_batch(
        traj, cmap, kbt=0.5, spec=spec, seeds=[1, 2], constraints=set(),
        l2_regularization=1e3, resid_tol=-1.0,  # force escalation everywhere
    )
    for tmap in batch:
        _, mf = tmap.map_arrays(coords[:8], forces[:8])
        assert np.all(np.isfinite(mf))


def test_fused_batch_frees_window_buffers(waterdimer):
    """After a batch fit returns, the per-window device constraint systems
    must be freed — only per-map artifacts (coefficients, geometry) may
    stay resident. Guards against closures pinning the (B, S, m, K) buffers
    for the lifetime of the returned maps."""
    import gc

    import jax
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map_batch
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:96].astype(np.float32)
    forces = waterdimer["forces"][:96].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    window = 8
    batch = fused_gb_linear_map_batch(
        traj, cmap, seeds=range(window), flush_every=window,
        kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3,
    )
    assert len(batch) == window
    gc.collect()
    leaked = [
        a.shape
        for a in jax.live_arrays()
        if a.ndim >= 3 and a.shape[0] == window
    ]
    assert not leaked, f"window-sized device buffers still live: {leaked}"


def test_fused_batch_escalation_path(waterdimer):
    """resid_tol=-1 declares every batched solve unconverged: the per-fit
    constraint systems must be fetched and the float64 escalation must
    produce maps matching the single-fit escalation."""
    import numpy as np

    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map,
        fused_gb_linear_map_batch,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"][:96].astype(np.float32)
    forces = waterdimer["forces"][:96].astype(np.float32)
    traj = Trajectory(coords=coords, forces=forces)
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    spec = GBFeatSpec(outer=1.0, n_basis=3)
    kw = dict(kbt=0.5, spec=spec, constraints=set(), l2_regularization=1e3)
    batch = fused_gb_linear_map_batch(
        traj, cmap, seeds=[5, 6], resid_tol=-1.0, **kw
    )
    single = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(5),
        resid_tol=-1.0, **kw
    )
    assert batch[0].force_map.tags["solver_resid"] < 1e-6  # f64 achieved
    _, f_b = batch[0].map_arrays(coords[:16], forces[:16])
    _, f_s = single.map_arrays(coords[:16], forces[:16])
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_s), atol=1e-5)


def test_fused_blocked_matches_full(waterdimer):
    """Site-blocked fit (sweep-scale HBM path) == unblocked fit exactly.

    The per-site QPs are independent and the solver is batch-composition
    invariant, so any site_block must reproduce the full program's
    coefficients bit-for-bit on a well-conditioned problem (this config's
    f32 solves converge: no escalation in either path). Escalation policy
    DIFFERS by design — the full program escalates every site when the max
    residual misses tol, the blocked path escalates per site — so the
    escalation leg forces it for all blocks (resid_tol=-1) where both
    paths end on the f64 oracle.
    """
    import jax.numpy as jnp

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map,
        fused_gb_linear_map_blocked,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"].astype(np.float32)
    forces = waterdimer["forces"].astype(np.float32)
    traj = Trajectory(
        coords=jnp.asarray(coords), forces=jnp.asarray(forces)
    )
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    constraints = {
        frozenset((0, 1)), frozenset((0, 2)), frozenset((1, 2)),
        frozenset((3, 4)), frozenset((3, 5)), frozenset((4, 5)),
    }
    kw = dict(
        kbt=0.6955215, spec=GBFeatSpec(outer=1.0, n_basis=5),
        constraints=constraints, l2_regularization=10.0,
        n_constraint_frames=8,
    )
    full = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(0), **kw
    )
    _, f_full = full.map_arrays(coords[:24], forces[:24])
    for site_block in (1, 2):
        blocked = fused_gb_linear_map_blocked(
            traj, cmap, constraint_rng=np.random.default_rng(0),
            site_block=site_block, **kw
        )
        _, f_blk = blocked.map_arrays(coords[:24], forces[:24])
        np.testing.assert_allclose(
            np.asarray(f_blk), np.asarray(f_full), atol=1e-5
        )
    # escalation: impossible tolerance routes every block to the f64 oracle
    esc = fused_gb_linear_map_blocked(
        traj, cmap, constraint_rng=np.random.default_rng(0),
        site_block=2, resid_tol=-1.0, **kw
    )
    assert esc.force_map.tags["solver_resid"] < 1e-6
    _, f_esc = esc.map_arrays(coords[:24], forces[:24])
    np.testing.assert_allclose(
        np.asarray(f_esc), np.asarray(f_full), atol=1e-4
    )


def test_fused_blocked_pipeline_matches_serial(waterdimer, monkeypatch):
    """Depth-1 pipelined block loop == strictly-serial loop, bit for bit.

    The pipeline only reorders HOST work (dispatch block k+1 before
    draining block k); every device program and every escalation decision
    is identical, so coefficients must match exactly — including when an
    impossible tolerance routes every block through the f64 escalation
    oracle inside the drain.
    """
    import jax.numpy as jnp

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map_blocked,
    )
    from aggforce_tpu.trajectory import Trajectory

    coords = waterdimer["coords"].astype(np.float32)
    forces = waterdimer["forces"].astype(np.float32)
    traj = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    cmap = LinearMap([[0], [3]], n_fg_sites=6)
    constraints = {
        frozenset((0, 1)), frozenset((0, 2)), frozenset((1, 2)),
        frozenset((3, 4)), frozenset((3, 5)), frozenset((4, 5)),
    }
    kw = dict(
        kbt=0.6955215, spec=GBFeatSpec(outer=1.0, n_basis=5),
        constraints=constraints, l2_regularization=10.0,
        n_constraint_frames=8, site_block=1,
    )
    for resid_tol in (1e-4, -1.0):  # converged and forced-escalation legs
        monkeypatch.setenv("AGGFORCE_SWEEP_PIPELINE", "1")
        piped = fused_gb_linear_map_blocked(
            traj, cmap, constraint_rng=np.random.default_rng(0),
            resid_tol=resid_tol, **kw
        )
        monkeypatch.setenv("AGGFORCE_SWEEP_PIPELINE", "0")
        serial = fused_gb_linear_map_blocked(
            traj, cmap, constraint_rng=np.random.default_rng(0),
            resid_tol=resid_tol, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(piped.force_map.tags["coef_list"]),
            np.asarray(serial.force_map.tags["coef_list"]),
        )


def test_fused_blocked_pallas_matches_scan():
    """Gram-tiled Pallas blocked fit == XLA-scan blocked fit.

    The tiled kernel (sweep-scale Gram without a K_pad-wide VMEM live
    set) differs from the scan only in f32 reduction order, so the test
    runs on well-conditioned random-normal data; the waterdimer geometry
    above has Gram scale ~1.5e7 where reduction-order noise amplifies
    through the KKT conditioning into percent-level coef shifts (the
    escalation gate, not bit-parity, is the production guarantee there).
    """
    import jax.numpy as jnp

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map_blocked,
    )
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(11)
    n_frames, n_fg = 60, 8
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    traj = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    cmap = LinearMap([[0], [4]], n_fg_sites=n_fg)
    kw = dict(
        kbt=0.7, spec=GBFeatSpec(outer=1.5, n_basis=4),
        constraints={frozenset({1, 2})}, l2_regularization=1.0,
        n_constraint_frames=10, site_block=2,
    )
    scan = fused_gb_linear_map_blocked(
        traj, cmap, constraint_rng=np.random.default_rng(5), **kw
    )
    pal = fused_gb_linear_map_blocked(
        traj, cmap, constraint_rng=np.random.default_rng(5),
        use_pallas=True, **kw
    )
    _, f_scan = scan.map_arrays(coords[:20], forces[:20])
    _, f_pal = pal.map_arrays(coords[:20], forces[:20])
    np.testing.assert_allclose(
        np.asarray(f_pal), np.asarray(f_scan), atol=2e-3
    )


def test_fused_blocked_mesh_matches_single():
    """Site-sharded blocked fit (one block per device) == single-device.

    The mesh variant shards the site-block axis with no collectives; each
    shard runs the identical block program, so parity is arithmetic
    identity up to f32 noise on this well-conditioned geometry.
    """
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    from jax.sharding import Mesh

    from aggforce_tpu.qp.fusedfeat import (
        GBFeatSpec,
        fused_gb_linear_map_blocked,
    )
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(12)
    n_frames, n_fg = 48, 10
    coords = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    forces = rng.normal(size=(n_frames, n_fg, 3)).astype(np.float32)
    traj = Trajectory(coords=jnp.asarray(coords), forces=jnp.asarray(forces))
    cmap = LinearMap([[0], [3], [6], [9]], n_fg_sites=n_fg)
    kw = dict(
        kbt=0.7, spec=GBFeatSpec(outer=1.5, n_basis=4),
        constraints={frozenset({1, 2})}, l2_regularization=1.0,
        n_constraint_frames=10, site_block=1,
    )
    single = fused_gb_linear_map_blocked(
        traj, cmap, constraint_rng=np.random.default_rng(5), **kw
    )
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("siteblocks",))
    sharded = fused_gb_linear_map_blocked(
        traj, cmap, constraint_rng=np.random.default_rng(5), mesh=mesh, **kw
    )
    _, f_single = single.map_arrays(coords[:16], forces[:16])
    _, f_sharded = sharded.map_arrays(coords[:16], forces[:16])
    np.testing.assert_allclose(
        np.asarray(f_sharded), np.asarray(f_single), atol=2e-3
    )


def test_lazy_coef_tags_mutators_and_equality():
    """_LazyCoefTags mutator/equality semantics: a user-assigned coef_list
    must win over the pending device fetch, pop/setdefault/== must
    materialize first, and copy() returns a plain dict with the key."""
    import numpy as np

    from aggforce_tpu.qp.fusedfeat import _LazyCoefTags

    dev = np.arange(6.0, dtype=np.float32).reshape(2, 3)

    # user assignment cancels the pending fetch (no later clobber)
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    t["coef_list"] = ["mine"]
    assert t["coef_list"] == ["mine"]
    assert t._coefs_dev is None

    # pop materializes (no KeyError) and removes the key
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    popped = t.pop("coef_list")
    assert len(popped) == 2 and "coef_list" not in t

    # setdefault materializes: the device rows win over the default
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    got = t.setdefault("coef_list", ["default"])
    np.testing.assert_array_equal(np.stack(got), dev)

    # == materializes first, so a not-yet-fetched tags dict is not
    # spuriously unequal to an eager dict missing nothing but coef_list
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    assert t != {"solver_resid": 0.5}  # eager dict WITHOUT coef_list
    assert t._coefs_dev is None  # the comparison materialized

    # copy() materializes and returns a plain dict
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    c = t.copy()
    assert type(c) is dict and "coef_list" in c


def test_lazy_coef_tags_ne_non_dict_and_c_level_copies():
    """Review regressions: ``!=`` against non-dicts must not boolean-test
    NotImplemented (tags != None was False), and C-level copy paths
    (dict(tags), {**tags}) must materialize via the overridden iterators."""
    import numpy as np

    from aggforce_tpu.qp.fusedfeat import _LazyCoefTags

    dev = np.arange(6.0, dtype=np.float32).reshape(2, 3)

    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    assert (t != None) is True  # noqa: E711 — the regression under test
    assert (t != 5) is True
    assert (t == None) is False  # noqa: E711

    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    assert "coef_list" in dict(t)
    t = _LazyCoefTags(dev, {"solver_resid": 0.5})
    assert "coef_list" in {**t}
