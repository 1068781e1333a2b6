"""Constraint detection and algebra."""

import numpy as np

from aggforce_tpu.constraints import (
    constraint_lookup_dict,
    guess_pairwise_constraints,
    reduce_constraint_sets,
)


def test_reduce_merges_overlaps():
    inp = {frozenset({1, 2}), frozenset({2, 3}), frozenset({4, 5})}
    out = reduce_constraint_sets(inp)
    assert out == {frozenset({1, 2, 3}), frozenset({4, 5})}


def test_reduce_chained_overlaps():
    inp = {frozenset({i, i + 1}) for i in range(6)}
    assert reduce_constraint_sets(inp) == {frozenset(range(7))}


def test_reduce_trivial_cases():
    assert reduce_constraint_sets(set()) == set()
    single = {frozenset({3, 9})}
    assert reduce_constraint_sets(single) == single


def test_lookup_dict():
    groups = {frozenset({1, 2, 3}), frozenset({4, 5}), frozenset({6, 7})}
    assert constraint_lookup_dict(groups) == {2: 1, 3: 1, 5: 4, 7: 6}


def test_guess_pairwise_constraints_detects_rigid_pair():
    rng = np.random.default_rng(3)
    n_frames, n_sites = 50, 5
    coords = rng.normal(size=(n_frames, n_sites, 3))
    # sites 1 and 3 move rigidly together: fixed offset added to shared motion
    base = rng.normal(size=(n_frames, 3))
    coords[:, 1, :] = base
    coords[:, 3, :] = base + np.array([0.1, 0.0, 0.0])
    found = guess_pairwise_constraints(coords, threshold=1e-3)
    assert found == {frozenset({1, 3})}


def test_guess_pairwise_constraints_cross():
    rng = np.random.default_rng(4)
    coords = rng.normal(size=(40, 4, 3))
    other = rng.normal(size=(40, 2, 3))
    other[:, 1, :] = coords[:, 2, :] + np.array([0.0, 0.2, 0.0])
    found = guess_pairwise_constraints(coords, cross_xyz=other, threshold=1e-3)
    assert found == {(1, 2)}


def test_ragged_tail_frames_all_count(monkeypatch):
    """Trailing frames beyond a full chunk must participate in the screen
    (an earlier revision silently dropped them)."""
    import aggforce_tpu.constraints.finder as finder
    from aggforce_tpu.constraints import guess_pairwise_constraints

    rng = np.random.default_rng(0)
    n_frames, n_sites = 67, 8  # 67 is deliberately ragged for any chunking
    base = rng.normal(size=(n_sites, 3))
    coords = base[None] + 1e-6 * rng.normal(size=(n_frames, n_sites, 3))
    # pair (0, 1) rigid everywhere; pair (2, 3) rigid in every frame EXCEPT
    # the last one — only a screen that sees the tail can reject it
    coords[:, 1] = coords[:, 0] + np.array([1.0, 0.0, 0.0])
    coords[:, 3] = coords[:, 2] + np.array([0.0, 1.0, 0.0])
    coords[-1, 3] += np.array([0.0, 0.5, 0.0])
    coords = coords.astype(np.float32)

    # force multi-chunk streaming with a ragged tail
    monkeypatch.setattr(finder, "_frame_chunk", lambda n_a, n_b: 16)  # 67 = 4*16+3
    found = guess_pairwise_constraints(coords, threshold=1e-3)
    assert frozenset((0, 1)) in found
    assert frozenset((2, 3)) not in found, (
        "tail frame was ignored: (2,3) breaks rigidity only in frame 66"
    )


def test_detection_far_from_origin():
    """Distance fluctuations must be detected regardless of the absolute
    coordinate magnitude (the Gram-trick distance loses ~|a|^2 * eps_f32 to
    cancellation; per-frame centering restores molecular-scale precision)."""
    rng = np.random.default_rng(8)
    n_frames, n = 200, 8
    base = rng.normal(scale=0.4, size=(n, 3))
    coords = base[None] + rng.normal(scale=0.05, size=(n_frames, n, 3))
    # rigid pair: site 1 always exactly 0.1 from site 0
    coords[:, 1] = coords[:, 0] + np.array([0.1, 0.0, 0.0])
    # translate the whole system far from the origin, differently per frame
    shift = 100.0 + rng.normal(scale=5.0, size=(n_frames, 1, 3))
    far = (coords + shift).astype(np.float32)
    found = guess_pairwise_constraints(far, threshold=1e-3)
    assert frozenset({0, 1}) in found
    near = guess_pairwise_constraints(coords.astype(np.float32), threshold=1e-3)
    assert found == near


def test_fold_probe_matches_exact_detection():
    """The one-pass per-fold probe must predict exactly what detection on
    each training subset returns (far from the threshold)."""
    from aggforce_tpu.constraints import guess_pairwise_constraints
    from aggforce_tpu.constraints.finder import fold_train_constraint_probe

    rng = np.random.default_rng(0)
    n_frames, n = 240, 12
    base = rng.normal(scale=0.8, size=(n, 3))
    # pairs (0,1) and (4,5) rigidly constrained, everything else floppy
    coords = np.empty((n_frames, n, 3), np.float32)
    for t in range(n_frames):
        wiggle = 0.05 * rng.normal(size=(n, 3))
        wiggle[1] = wiggle[0]
        wiggle[5] = wiggle[4]
        coords[t] = base + wiggle
    coords[:, 1] = coords[:, 0] + np.array([0.15, 0.0, 0.0], np.float32)
    coords[:, 5] = coords[:, 4] + np.array([0.0, 0.2, 0.0], np.float32)

    frames = np.arange(n_frames)
    rng.shuffle(frames)
    folds = np.array_split(frames, 4)
    predicted = fold_train_constraint_probe(coords, folds)
    assert predicted is not None
    for held, pred in zip(folds, predicted):
        train_idx = np.setdiff1d(np.arange(n_frames), held)
        exact = guess_pairwise_constraints(coords[train_idx])
        assert pred == exact, (pred, exact)


def test_fold_probe_flags_near_threshold():
    """A pair whose train sd sits at the threshold must force the exact
    fallback (None) instead of guessing."""
    from aggforce_tpu.constraints.finder import fold_train_constraint_probe

    rng = np.random.default_rng(1)
    n_frames, n = 120, 6
    coords = rng.normal(scale=0.5, size=(n_frames, n, 3)).astype(np.float32)
    # engineer pair (0,1): distance sd right at the 1e-3 threshold
    coords[:, 1] = coords[:, 0]
    coords[:, 1, 0] += 0.3 + 1e-3 * rng.normal(size=n_frames).astype(np.float32)
    folds = np.array_split(np.arange(n_frames), 3)
    # the engineered sd lands within ~10% of the threshold; a margin wide
    # enough to see it must force the exact fallback
    assert fold_train_constraint_probe(coords, folds, margin_rel=0.2) is None
