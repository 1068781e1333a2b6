"""Pallas fused Gram kernel vs numpy oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aggforce_tpu.ops.pallas_gram import (
    pack_operands,
    pallas_site_grams,
    reference_site_grams,
    unpack_gram,
)

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.fixture()
def packed():
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, _basis_centers

    rng = np.random.default_rng(0)
    t, n, s, g, k = 16, 24, 3, 5, 4
    spec = GBFeatSpec(outer=2.0, inner=0.1, n_basis=k, width=1.0)
    coords = rng.normal(size=(t, n, 3)).astype(np.float32)
    forces = rng.normal(size=(t, n, 3)).astype(np.float32)
    mask = np.ones(t, np.float32)
    mask[-2:] = 0.0
    cmap = rng.normal(size=(s, n)).astype(np.float32)
    onehot = np.zeros((n, g), np.float32)
    onehot[np.arange(n), rng.integers(0, g, n)] = 1.0
    counts = onehot.sum(0)
    group_mean = (onehot / np.maximum(counts, 1)).T.astype(np.float32)
    centers = _basis_centers(spec).astype(np.float32)
    kbt = np.float32(0.7)
    ops = pack_operands(
        jnp.asarray(coords), jnp.asarray(forces), jnp.asarray(mask),
        jnp.asarray(cmap), jnp.asarray(group_mean), jnp.asarray(onehot),
        jnp.asarray(counts), kbt, k, jnp.asarray(centers),
    )
    return ops, mask, g, k, spec, (coords, forces, cmap, onehot, counts, group_mean, centers)


def test_pallas_gram_matches_oracle(packed):
    (gpos, cg, fg, centers_flat, kcounts), mask, g, k, _, _ = packed
    width, clip = 1.0, 1e-3
    got = np.asarray(
        pallas_site_grams(
            gpos, cg, fg, jnp.asarray(mask), centers_flat, kcounts,
            n_basis=k, width=width, clip=clip, t_block=8,
            interpret=INTERPRET,
        )
    )
    expect = reference_site_grams(
        np.asarray(gpos), np.asarray(cg), np.asarray(fg), mask,
        np.asarray(centers_flat), np.asarray(kcounts), k, width, clip,
    )
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(got, expect, atol=3e-4 * scale)


def test_unpack_gram_layout(packed):
    (gpos, cg, fg, centers_flat, kcounts), mask, g, k, _, _ = packed
    got = pallas_site_grams(
        gpos, cg, fg, jnp.asarray(mask), centers_flat, kcounts,
        n_basis=k, width=1.0, clip=1e-3, t_block=8, interpret=INTERPRET,
    )
    sliced = np.asarray(unpack_gram(got, g, k))
    k_exp = g * (1 + k)
    assert sliced.shape == (cg.shape[0], k_exp, k_exp)
    # padded id-block columns of the full gram must be exactly zero, as must
    # padded-group columns inside every k-major basis slab
    g_pad = gpos.shape[1]
    full = np.asarray(got)
    assert np.abs(full[:, g:g_pad, :]).max() == 0.0
    for kk in range(k):
        lo = g_pad + kk * g_pad
        assert np.abs(full[:, lo + g : lo + g_pad, :]).max() == 0.0


def test_fused_fit_pallas_vs_xla():
    """End-to-end fused fit agrees between Pallas and XLA gram paths."""
    from aggforce_tpu import LinearMap
    from aggforce_tpu.qp.fusedfeat import GBFeatSpec, fused_gb_linear_map
    from aggforce_tpu.trajectory import Trajectory

    rng = np.random.default_rng(5)
    t, n = 64, 10
    coords = (rng.normal(size=(t, n, 3)) * 0.3).astype(np.float32)
    forces = rng.normal(size=(t, n, 3)).astype(np.float32)
    cmap = LinearMap([[0], [5]], n_fg_sites=n)
    constraints = {frozenset({1, 2})}
    traj = Trajectory(coords=coords, forces=forces)
    common = dict(
        kbt=0.7,
        spec=GBFeatSpec(outer=1.5, n_basis=4),
        constraints=constraints,
        l2_regularization=1.0,
        n_constraint_frames=12,
    )
    xla_map = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(3),
        use_pallas=False, **common,
    )
    pal_map = fused_gb_linear_map(
        traj, cmap, constraint_rng=np.random.default_rng(3),
        use_pallas=True, **common,
    )
    _, f_xla = xla_map.map_arrays(coords[:20], forces[:20])
    _, f_pal = pal_map.map_arrays(coords[:20], forces[:20])
    scale = np.abs(f_xla).mean() + 1e-6
    np.testing.assert_allclose(f_pal, f_xla, atol=2e-3 * scale)


def test_pallas_gram_matches_fused_xla_path(packed):
    """The kernel must agree with the production XLA scan-gram path."""
    from aggforce_tpu.qp.fusedfeat import _scan_gram

    (gpos, cg, fg, centers_flat, kcounts), mask, g, k, spec, raw = packed
    coords, forces, cmap, onehot, counts, group_mean, centers = raw
    xla = np.asarray(
        _scan_gram(
            jnp.asarray(coords), jnp.asarray(forces), jnp.asarray(mask),
            jnp.asarray(cmap), jnp.asarray(group_mean), jnp.asarray(onehot),
            jnp.asarray(counts), jnp.asarray(centers), jnp.float32(0.7),
            spec, 2,
        )
    )
    pal = np.asarray(
        unpack_gram(
            pallas_site_grams(
                gpos, cg, fg, jnp.asarray(mask), centers_flat, kcounts,
                n_basis=k, width=1.0, clip=1e-3, t_block=8,
                interpret=INTERPRET,
            ),
            g,
            k,
        )
    )
    scale = np.abs(xla).max() + 1.0
    np.testing.assert_allclose(pal, xla, atol=3e-4 * scale)


def test_pallas_tiled_gram_matches_oracle(packed):
    """The sweep-scale Gram-tiled kernel == the flat oracle, same layout."""
    from aggforce_tpu.ops.pallas_gram import pallas_site_grams_tiled

    (gpos, cg, fg, centers_flat, kcounts), mask, g, k, spec, extras = packed
    centers = extras[6]
    counts = extras[4]
    width, clip = 1.0, 1e-3
    g_pad = gpos.shape[2]
    kbt_counts = np.zeros(g_pad, np.float32)
    kbt_counts[:g] = 0.7 * counts
    got = np.asarray(
        pallas_site_grams_tiled(
            gpos, cg, fg, jnp.asarray(mask), jnp.asarray(centers),
            jnp.asarray(kbt_counts),
            n_basis=k, width=width, clip=clip, t_block=8,
            interpret=INTERPRET,
        )
    )
    expect = reference_site_grams(
        np.asarray(gpos), np.asarray(cg), np.asarray(fg), mask,
        np.asarray(centers_flat), np.asarray(kcounts), k, width, clip,
    )
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(got, expect, atol=3e-4 * scale)


def test_unpack_gram_matches_index_formula():
    """The reshape/transpose/concat unpack must be bit-identical to the
    index-formula permutation it replaces (the double fancy-index lowers
    to a per-element gather on TPU — ~1 s per sweep-scale site block)."""
    for g, nb, g_pad, s in [(5, 3, 8, 2), (17, 7, 32, 3), (16, 4, 16, 1)]:
        n = (1 + nb) * g_pad
        x = np.random.default_rng(g).normal(size=(s, n, n)).astype(np.float32)
        got = np.asarray(unpack_gram(jnp.asarray(x), g, nb))
        gi, kk = np.arange(g), np.arange(nb)
        basis_idx = (g_pad + kk[None, :] * g_pad + gi[:, None]).reshape(-1)
        idx = np.concatenate([np.arange(g), basis_idx])
        np.testing.assert_array_equal(got, x[:, idx[:, None], idx[None, :]])
