r"""Pallas TPU kernel: fused featurized design-row construction + Gram.

The hot op of the featurized force-map fit is, per cg site s,

    P_s = sum_{t,a} row(t,a)^T row(t,a),
    row(t,a) = [ Fg[t,:,a] | Fg[t,g,a]*gz[t,s,g,k] + dph[t,s,g,k]*u[t,s,g,a] ]

with gz the Gaussian basis of the group<->site distance, dph its scaled
radial derivative (the divergence factor), and u the unit displacement. The
XLA path materializes the (chunk, S, 3, K_exp) design tensor in HBM before a
batched GEMM. This kernel instead builds each (t-block, K_exp) operand tile
in VMEM *from the raw group positions* — distances, basis, divergences, and
the rank-1 a-expansion are all computed in-registers — and feeds the MXU
directly, accumulating P_s across sequential grid steps. HBM traffic drops
from O(chunk * S * 3 * K_exp) to O(chunk * G * 3) reads plus one P
write-back per site.

Layout contract: feature index f ∈ [0, G_pad) is the one-hot id block;
f = G_pad + k*G_pad + g is basis function k of group g (k-major — the
natural layout of ``pltpu.repeat``'s tile semantics). Padded groups carry
zero Fg and zero counts so their columns vanish; :func:`unpack_gram`
permutes the valid block into the canonical g-major (f = g*K + k) layout
used by :mod:`aggforce_tpu.qp.fusedfeat`.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(
    gpos_ref,  # (3, tb, G_pad) group positions, component-major
    cg_ref,  # (1, 3, tb) this site's cg positions (site-major array)
    fg_ref,  # (3, tb, G_pad) per-group force sums (mask folded in)
    maskd_ref,  # (tb, 1) frame validity for the divergence term
    centers_ref,  # (1, GK_pad) per-column basis centers (tiled per group)
    counts_ref,  # (1, GK_pad) per-column kbt * group size (0 for padding)
    out_ref,  # (1, K_pad, K_pad) per-site Gram accumulator
    *,
    n_basis: int,
    width: float,
    clip: float,
    g_pad: int,
):
    # NOTE: xyz components lead the layout so the minor dims stay lane/
    # sublane aligned — a trailing dim of 3 would be padded to 128 lanes by
    # Mosaic, inflating the VMEM windows ~42x.
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    inv_w = 1.0 / width

    # distances of every (frame, group) pair to this site's cg point
    disp0 = gpos_ref[0] - cg_ref[0, 0, :][:, None]
    disp1 = gpos_ref[1] - cg_ref[0, 1, :][:, None]
    disp2 = gpos_ref[2] - cg_ref[0, 2, :][:, None]
    dsq = disp0 * disp0 + disp1 * disp1 + disp2 * disp2  # (tb, G_pad)
    d = jnp.sqrt(dsq)
    inv_d = 1.0 / jnp.maximum(d, 1e-30)

    # expand to per-(g, k) columns and evaluate the clipped basis
    drep = pltpu.repeat(d, n_basis, axis=1)  # (tb, GK_pad)
    offset = (drep - centers_ref[0, :]) * inv_w
    raw = jnp.exp(-(offset * offset))
    gz = jnp.maximum(raw, clip) - clip
    live = (raw > clip).astype(raw.dtype)
    # dph = kbt * count * d(phi)/dd  (counts_ref carries kbt * |group|),
    # masked for padded frames (the fg terms carry the mask already)
    dph = (
        counts_ref[0, :]
        * live
        * raw
        * (-2.0 * inv_w)
        * offset
        * maskd_ref[:, 0:1]
    )

    acc = jnp.zeros_like(out_ref[0])
    for a, disp_a in ((0, disp0), (1, disp1), (2, disp2)):
        fg_a = fg_ref[a]  # (tb, G_pad)
        u_a = disp_a * inv_d
        row_gb = pltpu.repeat(fg_a, n_basis, axis=1) * gz + dph * pltpu.repeat(
            u_a, n_basis, axis=1
        )
        row = jnp.concatenate([fg_a, row_gb], axis=1)  # (tb, K_pad)
        acc = acc + jax.lax.dot_general(
            row,
            row,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out_ref[0] + acc


@partial(
    jax.jit,
    static_argnames=("n_basis", "width", "clip", "t_block", "interpret"),
)
def pallas_site_grams(
    gpos: jax.Array,  # (3, T, G_pad) — component-major
    cg: jax.Array,  # (S, 3, T) — site-major
    fg: jax.Array,  # (3, T, G_pad) — mask folded in by caller
    mask: jax.Array,  # (T,)
    centers_flat: jax.Array,  # (GK_pad,)
    kbt_counts_flat: jax.Array,  # (GK_pad,)
    n_basis: int,
    width: float,
    clip: float,
    t_block: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """All-site featurized Grams: returns (S, K_pad, K_pad).

    Shapes must satisfy: T % t_block == 0 and G_pad % 16 == 0 (zero-padded
    group columns vanish; a multiple of 16 keeps the expanded feature
    dimension K_pad = G_pad * (1 + n_basis) lane-aligned for n_basis=7
    while avoiding the ~1.7x FLOP waste of padding G all the way to 128).

    ``t_block`` is a pure performance knob: measured on v5e (amortized
    device time, tunnel latency excluded), t_block=256 leaves the MXU
    pipeline stalled at ~10 TF/s while t_block=1024 reaches ~95 TF/s
    executed (~48% of the bf16 MXU peak) on the CLN025-scale fit — deeper
    frame blocks amortize the per-step window swaps and keep the systolic
    array fed.
    """
    _, t, g_pad = gpos.shape
    s_dim = cg.shape[0]
    gk_pad = g_pad * n_basis
    k_pad = g_pad + gk_pad
    n_steps = t // t_block

    grid = (s_dim, n_steps)
    kernel = partial(
        _gram_kernel,
        n_basis=n_basis,
        width=width,
        clip=clip,
        g_pad=g_pad,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, t_block, g_pad),
                lambda s, i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, t_block),
                lambda s, i: (s, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, t_block, g_pad),
                lambda s, i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (t_block, 1), lambda s, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gk_pad), lambda s, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gk_pad), lambda s, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k_pad, k_pad), lambda s, i: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, k_pad, k_pad), jnp.float32),
        # the kernel's live set (basis/divergence tiles + the Gram
        # accumulator) exceeds the default 16M scoped-vmem budget; the chip
        # has 128M of VMEM, so grant the kernel most of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        gpos,
        cg,
        fg,
        mask[:, None],
        centers_flat[None, :],
        kbt_counts_flat[None, :],
    )


def reference_site_grams(
    gpos: np.ndarray,
    cg: np.ndarray,
    fg: np.ndarray,
    mask: np.ndarray,
    centers_flat: np.ndarray,
    kbt_counts_flat: np.ndarray,
    n_basis: int,
    width: float,
    clip: float,
) -> np.ndarray:
    """Plain-numpy oracle for the kernel (float64, used by tests).

    Mirrors the kernel's k-major tiled layout (np.tile ≡ pltpu.repeat).
    """
    _, t, g_pad = gpos.shape
    s_dim = cg.shape[0]
    k_pad = g_pad * (1 + n_basis)
    out = np.zeros((s_dim, k_pad, k_pad))
    for s in range(s_dim):
        disp = gpos.transpose(1, 2, 0) - cg[s].T[:, None, :]  # (T, G, 3)
        d = np.linalg.norm(disp, axis=-1)
        u = disp / np.maximum(d, 1e-30)[..., None]
        drep = np.tile(d, (1, n_basis))
        offset = (drep - centers_flat[None, :]) / width
        raw = np.exp(-(offset**2))
        gz = np.maximum(raw, clip) - clip
        dph = (
            kbt_counts_flat[None, :]
            * (raw > clip)
            * raw
            * (-2.0 / width)
            * offset
            * mask[:, None]
        )
        for a in range(3):
            row = np.concatenate(
                [
                    fg[a],
                    np.tile(fg[a], (1, n_basis)) * gz
                    + dph * np.tile(u[:, :, a], (1, n_basis)),
                ],
                axis=1,
            )
            out[s] += row.T @ row
    return out


def pack_operands(
    coords: jax.Array,  # (T, N, 3)
    forces: jax.Array,  # (T, N, 3)
    mask: jax.Array,  # (T,)
    cmap_mat: jax.Array,  # (S, N)
    group_mean: jax.Array,  # (G, N)
    onehot: jax.Array,  # (N, G)
    counts: jax.Array,  # (G,)
    kbt: jax.Array,
    n_basis: int,
    centers: jax.Array,  # (K,)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """XLA-side prep: group positions/forces + padded flat per-column params.

    Returns (gpos, cg, fg_masked, centers_flat, kbt_counts_flat) in
    component-major layout — (3, T, G_pad) / (3, S, T) — with the group axis
    zero-padded to a multiple of 16 (padded columns vanish because both fg
    and counts are zero there; see :func:`pallas_site_grams` for why 16).
    """
    g = group_mean.shape[0]
    g_pad = max(16, -(-g // 16) * 16)
    pad = g_pad - g
    gpos = jnp.einsum("gj,tjd->dtg", group_mean, coords, precision="highest")
    cg = jnp.einsum("sj,tjd->sdt", cmap_mat, coords, precision="highest")
    fg = jnp.einsum("tja,jg->atg", forces, onehot, precision="highest")
    fg = fg * mask[None, :, None]
    gpos = jnp.pad(gpos, ((0, 0), (0, 0), (0, pad)))
    fg = jnp.pad(fg, ((0, 0), (0, 0), (0, pad)))
    # k-major flat layout: column k*G_pad + g
    centers_flat = jnp.repeat(centers, g_pad)
    kbt_counts_flat = jnp.tile(jnp.pad(kbt * counts, (0, pad)), n_basis)
    return gpos, cg, fg, centers_flat, kbt_counts_flat


def unpack_gram(gram_pad: jax.Array, g: int, n_basis: int) -> jax.Array:
    """Extract + permute the valid block into the canonical g-major layout.

    Kernel column for basis k of group gi sits at G_pad + k*G_pad + gi; the
    canonical fused layout expects g + gi*n_basis + k.

    Implemented as reshape/slice/transpose/concat — NOT as the equivalent
    double fancy-index ``gram_pad[:, idx[:, None], idx[None, :]]``: XLA
    lowers that to a per-element gather, which a device profile showed
    costing ~1.0 s per 6-site block at sweep scale (K_pad ~ 9k; 56% of the
    whole fit) where the same permutation as blocked data movement is
    HBM-bandwidth (~tens of ms). The permutation is identical: both axes
    are reordered by [0..g-1] ++ [G_pad*(k+1) + gi for gi, then k].
    """
    s = gram_pad.shape[0]
    n = gram_pad.shape[-1]
    g_pad = n // (1 + n_basis)
    m = g * (1 + n_basis)

    def permute_cols(x):  # reorder the LAST axis; x (s, r, n) -> (s, r, m)
        r = x.shape[1]
        blocks = x.reshape(s, r, 1 + n_basis, g_pad)[..., :g]
        id_cols = blocks[:, :, 0, :]  # (s, r, g)
        basis = jnp.swapaxes(blocks[:, :, 1:, :], 2, 3)  # (s, r, g, n_basis)
        return jnp.concatenate(
            [id_cols, basis.reshape(s, r, g * n_basis)], axis=-1
        )

    cols = permute_cols(gram_pad)  # (s, n, m)
    rows = permute_cols(jnp.swapaxes(cols, 1, 2))  # (s, m, m)
    return jnp.swapaxes(rows, 1, 2)


def _gram_tiled_kernel(
    pair_bi_ref,  # (n_pairs,) SMEM: basis-block row index of pair p
    pair_bj_ref,  # (n_pairs,) SMEM: basis-block col index of pair p
    centers_ref,  # (B,) SMEM: basis centers; index 0 = id block (unused)
    gpos_ref,  # (3, tb, G_pad)
    cg_ref,  # (1, 3, tb)
    fg_ref,  # (3, tb, G_pad)
    maskd_ref,  # (tb, 1)
    counts_ref,  # (1, G_pad) kbt * group size
    out_ref,  # (1, 1, G_pad, G_pad) accumulator of pair p's tile
    *,
    width: float,
    clip: float,
):
    """One upper-triangle (basis-block i, basis-block j) Gram tile.

    In the k-major layout every K_pad-wide design row is B = 1 + n_basis
    contiguous G_pad-wide blocks: block 0 is the id columns (fg itself),
    block b >= 1 is fg * gz_b + dph_b * u for basis center b-1. A Gram
    tile therefore needs only the two blocks' (tb, G_pad) rows — no
    K_pad-wide tensor ever exists, which is what lets solvated-scale
    Grams (K_pad ~ 9k, full accumulator ~330 MB >> VMEM) run as a Pallas
    kernel at all. The grid walks only the B(B+1)/2 upper-triangle block
    pairs (scalar-prefetched (bi, bj) lists); the caller mirrors the
    strictly-lower tiles, so the kernel does the symmetric-minimum FLOPs.
    """
    p = pl.program_id(1)
    step = pl.program_id(2)
    bi = pair_bi_ref[p]
    bj = pair_bj_ref[p]

    @pl.when(step == 0)
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    inv_w = 1.0 / width
    disp0 = gpos_ref[0] - cg_ref[0, 0, :][:, None]
    disp1 = gpos_ref[1] - cg_ref[0, 1, :][:, None]
    disp2 = gpos_ref[2] - cg_ref[0, 2, :][:, None]
    d = jnp.sqrt(disp0 * disp0 + disp1 * disp1 + disp2 * disp2)
    inv_d = 1.0 / jnp.maximum(d, 1e-30)

    def block_parts(b, center):
        # gz == 1, dph == 0 degenerate the block to the id columns
        offset = (d - center) * inv_w
        raw = jnp.exp(-(offset * offset))
        gz = jnp.maximum(raw, clip) - clip
        live = (raw > clip).astype(raw.dtype)
        dph = (
            counts_ref[0, :]
            * live
            * raw
            * (-2.0 * inv_w)
            * offset
            * maskd_ref[:, 0:1]
        )
        is_id = (b == 0).astype(raw.dtype)
        return is_id + (1.0 - is_id) * gz, (1.0 - is_id) * dph

    # scalar loads with a dynamic index are legal from SMEM (the usual
    # scalar-prefetch pattern); a dynamic_slice of a VMEM vector is not
    gz_i, dph_i = block_parts(bi, centers_ref[bi])
    gz_j, dph_j = block_parts(bj, centers_ref[bj])

    acc = jnp.zeros_like(out_ref[0, 0])
    for disp_a, fg_a in (
        (disp0, fg_ref[0]),
        (disp1, fg_ref[1]),
        (disp2, fg_ref[2]),
    ):
        u_a = disp_a * inv_d
        row_i = fg_a * gz_i + dph_i * u_a
        row_j = fg_a * gz_j + dph_j * u_a
        acc = acc + jax.lax.dot_general(
            row_i,
            row_j,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = out_ref[0, 0] + acc


@partial(
    jax.jit,
    static_argnames=("n_basis", "width", "clip", "t_block", "interpret"),
)
def pallas_site_grams_tiled(
    gpos: jax.Array,  # (3, T, G_pad)
    cg: jax.Array,  # (S, 3, T)
    fg: jax.Array,  # (3, T, G_pad)
    mask: jax.Array,  # (T,)
    centers: jax.Array,  # (n_basis,) RAW centers (not flat-tiled)
    kbt_counts: jax.Array,  # (G_pad,) kbt * group size (not flat-tiled)
    n_basis: int,
    width: float,
    clip: float,
    t_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Sweep-scale per-site Grams, Gram-tiled: returns (S, K_pad, K_pad).

    Same contract as :func:`pallas_site_grams` (T % t_block == 0, G_pad a
    multiple of 16, k-major column layout) but the Gram is computed one
    (G_pad, G_pad) basis-block pair at a time, so VMEM holds two row
    blocks plus one tile accumulator instead of the full K_pad-wide
    design row and K_pad^2 accumulator — the flagship kernel's live set
    is O(K_pad^2) and caps out around K_pad ~ 1-2k, this one is
    O(G_pad^2) and runs the 9k-feature solvated geometry. The grid walks
    only the B(B+1)/2 upper-triangle block pairs (the Gram is symmetric;
    tile (bj, bi) is tile (bi, bj) transposed) — the symmetric-minimum
    FLOPs, mirrored into the full square by one XLA gather/where.
    """
    _, t, g_pad = gpos.shape
    s_dim = cg.shape[0]
    b_dim = 1 + n_basis
    n_steps = t // t_block
    centers_b = jnp.concatenate(
        [jnp.zeros((1,), centers.dtype), centers]
    )  # index 0 = id block (value unused)

    pairs = [(i, j) for i in range(b_dim) for j in range(i, b_dim)]
    n_pairs = len(pairs)
    pair_bi = jnp.asarray([p[0] for p in pairs], jnp.int32)
    pair_bj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    # (bi, bj) -> pair index and whether the stored tile needs transposing
    pair_of = np.zeros((b_dim, b_dim), np.int32)
    mirrored = np.zeros((b_dim, b_dim), np.bool_)
    for p, (i, j) in enumerate(pairs):
        pair_of[i, j] = p
        pair_of[j, i] = p
        mirrored[j, i] = i != j

    grid = (s_dim, n_pairs, n_steps)
    kernel = partial(_gram_tiled_kernel, width=width, clip=clip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # pair_bi, pair_bj, centers
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, t_block, g_pad),
                lambda s, p, i, *refs: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, t_block),
                lambda s, p, i, *refs: (s, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, t_block, g_pad),
                lambda s, p, i, *refs: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (t_block, 1),
                lambda s, p, i, *refs: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g_pad),
                lambda s, p, i, *refs: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, g_pad),
            lambda s, p, i, *refs: (s, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (s_dim, n_pairs, g_pad, g_pad), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        pair_bi,
        pair_bj,
        centers_b,
        gpos,
        cg,
        fg,
        mask[:, None],
        kbt_counts[None, :],
    )
    # mirror the upper-triangle tiles into the full block square, then
    # reassemble into the flat k-major (S, K_pad, K_pad) layout the
    # existing unpack_gram permutation understands
    full = blocks[:, pair_of.reshape(-1)].reshape(
        s_dim, b_dim, b_dim, g_pad, g_pad
    )
    full = jnp.where(
        jnp.asarray(mirrored)[None, :, :, None, None],
        jnp.swapaxes(full, 3, 4),
        full,
    )
    k_pad = b_dim * g_pad
    gram = jnp.swapaxes(full, 2, 3).reshape(s_dim, k_pad, k_pad)
    return gram
