r"""Fully fused on-device featurized force-map fit (the flagship fast path).

The protocol path (:func:`aggforce_tpu.qp.featlinearmap.qp_feat_linear_map`)
materializes each cg site's dense feature tensor (n_frames, n_fg, K_exp) —
gigabytes for production trajectories (the reference streams it through host
numpy, qp/featlinearmap.py:343-384). For the canonical featurization
(``Multifeaturize([id_feat, gb_feat])``, reference README.md:133-147) the
features factorize:

    feat[t, j, (g)]      = onehot[j, g]                      (id part)
    feat[t, j, (g, k)]   = onehot[j, g] * gauss[t, j, k]     (gb part)

so the Gram/constraint/apply contractions never need the expanded tensor.
This module exploits that: one jitted ``lax.scan`` over frame chunks computes
smear -> distances -> Gaussian basis -> factorized force contraction ->
per-site Gram accumulation for ALL cg sites at once, followed by one batched
KKT solve. Nothing round-trips to the host; HBM holds only
O(chunk * n_cg * n_fg * n_basis) intermediates.

Map application is fused the same way: each frame chunk runs one jitted
kernel that computes the geometry once and emits the mapped forces directly
(FusedGBMap.__call__), with the protocol-compatible scale/trans closures
retained for CLAMap API parity.
"""

import os
import sys
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints
from ..map import CLAFTMap, CLAMap, LinearMap
from ..ops.eqp import batched_eqp_solve_auglag, batched_eqp_solve_shared
from ..trajectory import Trajectory
from .featlinearmap import id_feat


@dataclass(frozen=True)
class GBFeatSpec:
    """Hyperparameters of the Gaussian-basis distance featurization."""

    outer: float
    inner: float = 0.0
    n_basis: int = 10
    width: float = 1.0
    dist_power: float = 0.5
    clip: float = 1e-3
    include_id: bool = True  # prepend the one-hot id features (id_feat)


def _basis_centers(spec: GBFeatSpec) -> np.ndarray:
    pow_grid = np.linspace(
        spec.inner**spec.dist_power, spec.outer**spec.dist_power, spec.n_basis
    )
    return pow_grid ** (1.0 / spec.dist_power)


@partial(jax.jit, static_argnames=("spec",))
def _group_feature_blocks(
    coords: jax.Array,  # (t, N, 3) chunk
    cg_points: jax.Array,  # (t, S, 3)
    group_mean: jax.Array,  # (G, N): row g averages the members of group g
    counts: jax.Array,  # (G,) group sizes
    centers: jax.Array,  # (K,)
    spec: GBFeatSpec,
) -> Tuple[jax.Array, jax.Array]:
    """Per-GROUP Gaussian basis values and closed-form divergences.

    Key structural fact: smearing assigns every member of a constraint group
    its group-mean position, and channels coincide with groups — so all
    members share identical features. Everything therefore reduces from
    per-atom (N) to per-group (G) tensors:

        gauss[t, s, g, k]   — basis value of group g's mean position
        div[t, s, g, k, a]  = count[g] * phi_k'(d) * unit_vector

    (the count factor is the sum over the group's identical member
    contributions). This is an O(N/G) compute and memory reduction over the
    naive per-atom channelized form, with no approximation.
    """
    gpos = jnp.einsum("gj,tjd->tgd", group_mean, coords, precision="highest")
    disp = gpos[:, None, :, :] - cg_points[:, :, None, :]  # (t, S, G, 3)
    d = jnp.sqrt(jnp.sum(disp * disp, axis=-1))  # (t, S, G)
    offset = (d[..., None] - centers) / spec.width  # (t, S, G, K)
    raw = jnp.exp(-(offset**2))
    gauss = jnp.maximum(raw, spec.clip) - spec.clip
    u = disp / jnp.maximum(d, 1e-30)[..., None]
    dphi = jnp.where(raw > spec.clip, raw * (-2.0 * offset / spec.width), 0.0)
    div = (
        counts[None, None, :, None, None]
        * dphi[..., None]
        * u[..., None, :]
    )  # (t, S, G, K, 3)
    return gauss, div


@partial(jax.jit, static_argnames=("spec",))
def _chunk_gram(
    coords: jax.Array,  # (t, N, 3)
    forces: jax.Array,  # (t, N, 3)
    mask: jax.Array,  # (t,) 1.0 for valid frames
    cg_points: jax.Array,  # (t, S, 3)
    group_mean: jax.Array,  # (G, N)
    onehot: jax.Array,  # (N, G)
    counts: jax.Array,  # (G,)
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Per-site Gram contribution of one frame chunk: (S, K_exp, K_exp).

    The design row for (frame t, Cartesian a) at site s is
    [ Fg[t,:,a] | Fg[t,g,a]*gauss[t,s,g,k] + kbt*div[t,s,g,k,a] ] where
    Fg = onehot^T F are per-group force sums — one small GEMM plus an outer
    product, then one batched GEMM for the Gram itself.
    """
    gauss, div = _group_feature_blocks(
        coords, cg_points, group_mean, counts, centers, spec
    )
    fg = jnp.einsum("tja,jg->tga", forces, onehot, precision="highest")
    # outer product: (t,S,3,G,K)
    g_gb = fg[:, None, :, :].transpose(0, 1, 3, 2)[..., None] * gauss[
        :, :, None, :, :
    ]
    g_gb = g_gb + kbt * jnp.moveaxis(div, -1, 2)  # div (t,S,G,K,3)->(t,S,3,G,K)
    t, s_dim = g_gb.shape[0], g_gb.shape[1]
    g_gb = g_gb.reshape(t, s_dim, 3, -1)
    if spec.include_id:
        g_id = jnp.broadcast_to(
            jnp.swapaxes(fg, 1, 2)[:, None], (t, s_dim, 3, fg.shape[1])
        )
        g_all = jnp.concatenate([g_id, g_gb], axis=-1)  # (t, S, 3, K_exp)
    else:
        g_all = g_gb
    g_all = g_all * mask[:, None, None, None]
    return jnp.einsum("tsaf,tsag->sfg", g_all, g_all, precision="highest")


@partial(jax.jit, static_argnames=("spec",))
def _constraint_rows(
    coords: jax.Array,  # (tc, N, 3) sampled frames
    cg_points: jax.Array,  # (tc, S, 3)
    cmap_mat: jax.Array,  # (S, N)
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Sampled orthogonality rows per site: (S, tc*S, K_exp)."""
    gauss, _ = _group_feature_blocks(
        coords, cg_points, group_mean, counts, centers, spec
    )
    mg = jnp.matmul(cmap_mat, onehot, precision="highest")  # (c, G)
    # rows_gb[t,s,c,(g,k)] = Mg[c,g] * gauss[t,s,g,k]
    rows_gb = mg[None, None, :, :, None] * gauss[:, :, None, :, :]
    tc, s_dim, c_dim = rows_gb.shape[0], rows_gb.shape[1], rows_gb.shape[2]
    rows_gb = rows_gb.reshape(tc, s_dim, c_dim, -1)
    if spec.include_id:
        rows_id = jnp.broadcast_to(
            mg[None, None, :, :], (tc, s_dim) + mg.shape
        )
        rows = jnp.concatenate([rows_id, rows_gb], axis=-1)
    else:
        rows = rows_gb
    # flatten (frame, cg-row) into the constraint-row axis, per site
    rows = jnp.swapaxes(rows, 0, 1)  # (S, tc, c, K_exp)
    return rows.reshape(s_dim, tc * c_dim, -1)


def _scan_gram(
    coords: jax.Array,
    forces: jax.Array,
    mask: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    vary_axis: Optional[str] = None,
) -> jax.Array:
    """Accumulate per-site Grams over frame chunks with lax.scan.

    ``vary_axis`` marks the carry as device-varying when called inside a
    shard_map over that mesh axis (required by the scan carry typing).
    """
    t_pad, n = coords.shape[0], coords.shape[1]
    s_dim = cmap_mat.shape[0]
    k_exp = spec.n_basis * onehot.shape[1] + (
        onehot.shape[1] if spec.include_id else 0
    )
    chunk = t_pad // n_chunks
    coords_c = coords.reshape(n_chunks, chunk, n, 3)
    forces_c = forces.reshape(n_chunks, chunk, n, 3)
    mask_c = mask.reshape(n_chunks, chunk)

    def body(gram, inp):
        cc, fc, mc = inp
        cg = jnp.einsum("sj,tjd->tsd", cmap_mat, cc, precision="highest")
        gram = gram + _chunk_gram(
            cc, fc, mc, cg, group_mean, onehot, counts, centers, kbt, spec
        )
        return gram, None

    gram0 = jnp.zeros((s_dim, k_exp, k_exp), dtype=coords.dtype)
    if vary_axis is not None:
        gram0 = jax.lax.pcast(gram0, (vary_axis,), to="varying")
    gram, _ = jax.lax.scan(body, gram0, (coords_c, forces_c, mask_c))
    return gram


def _assemble_constraint_system(
    constr_coords: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
    dtype,
    cmap_rows: Optional[jax.Array] = None,
    site_sel: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-site constraint rows and targets shared by both fit paths.

    The orthogonality system of ONE fitted site spans ALL CG sites (its
    weight function must integrate to delta against every site's
    configurational map), so the row axis is always the full ``cmap_mat``.
    ``cmap_rows``/``site_sel`` restrict only WHICH sites are being fitted:
    ``cmap_rows`` (Sb, N) selects the evaluation sites of a site block and
    ``site_sel`` (Sb, S) is the one-hot of each block row's global site
    index (the Kronecker target of its constraint system). The default is
    the full map (Sb == S, site_sel == I).
    """
    rows_map = cmap_rows if cmap_rows is not None else cmap_mat
    cg_constr = jnp.einsum(
        "sj,tjd->tsd", rows_map, constr_coords, precision="highest"
    )
    a_rows = _constraint_rows(
        constr_coords, cg_constr, cmap_mat, group_mean, onehot, counts,
        centers, spec,
    )  # (Sb, tc*S, K_exp)
    s_all = cmap_mat.shape[0]
    s_blk = rows_map.shape[0]
    tc = constr_coords.shape[0]
    # b[s, (t, c)] = 1 when c == (global index of block row s)
    sel = (
        site_sel.astype(dtype)
        if site_sel is not None
        else jnp.eye(s_all, dtype=dtype)
    )
    b = jnp.broadcast_to(sel[:, None, :], (s_blk, tc, s_all)).reshape(
        s_blk, tc * s_all
    )
    return a_rows, b


@partial(
    jax.jit,
    static_argnames=("spec", "n_chunks", "mesh"),
)
def _sharded_scan_gram(
    coords: jax.Array,
    forces: jax.Array,
    mask: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    mesh,
) -> jax.Array:
    """Frame-sharded fused Gram: local scans per device + one psum over ICI.

    ``n_chunks`` is the global chunk count and must be divisible by the mesh
    size; each device scans its n_chunks/n_dev local chunks.
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size

    def local(cc, fc, mc):
        g = _scan_gram(
            cc, fc, mc, cmap_mat, group_mean, onehot, counts, centers,
            kbt, spec, n_chunks // n_dev, vary_axis="frames",
        )
        return jax.lax.psum(g, "frames")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("frames"), P("frames"), P("frames")),
        out_specs=P(),
    )(coords, forces, mask)


def _fused_fit_parts(
    coords: jax.Array,  # (T_pad, N, 3)
    forces: jax.Array,  # (T_pad, N, 3)
    mask: jax.Array,  # (T_pad,)
    constr_coords: jax.Array,  # (tc, N, 3)
    cmap_mat: jax.Array,  # (S, N)
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    mesh=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused assembly of the per-site QPs: (gram, constraint rows, targets).

    With ``mesh`` given (a 1-D Mesh over axis "frames"), the frame axis is
    sharded: each device scans its local chunks and one psum over the ICI
    combines the per-site Grams; the small constraint stage is replicated.
    """
    s_dim = cmap_mat.shape[0]
    k_exp = spec.n_basis * onehot.shape[1] + (
        onehot.shape[1] if spec.include_id else 0
    )
    if mesh is None:
        gram = _scan_gram(
            coords, forces, mask, cmap_mat, group_mean, onehot, counts,
            centers, kbt, spec, n_chunks,
        )
    else:
        gram = _sharded_scan_gram(
            coords, forces, mask, cmap_mat, group_mean, onehot, counts,
            centers, kbt, spec, n_chunks, mesh,
        )
    gram = gram + l2_regularization * jnp.eye(k_exp, dtype=coords.dtype)
    a_rows, b = _assemble_constraint_system(
        constr_coords, cmap_mat, group_mean, onehot, counts, centers, spec,
        coords.dtype,
    )
    return gram, a_rows, b


@partial(jax.jit, static_argnames=("spec", "t_block", "mesh"))
def _pallas_mesh_fit_parts(
    coords: jax.Array,  # (T_pad, N, 3), frame-sharded over the mesh
    forces: jax.Array,
    mask: jax.Array,
    constr_coords: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    mesh,
    t_block: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-chip Pallas assembly: each device runs the fused Gram kernel on
    its local frame shard; one psum over the ICI merges per-site Grams."""
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_gram import pack_operands, pallas_site_grams, unpack_gram

    interpret = jax.devices()[0].platform != "tpu"

    def local(cc, fc, mc):
        gpos, cgp, fgp, centers_flat, kcounts = pack_operands(
            cc, fc, mc, cmap_mat, group_mean, onehot, counts, kbt,
            spec.n_basis, centers,
        )
        g_pad = pallas_site_grams(
            gpos, cgp, fgp, mc, centers_flat, kcounts,
            n_basis=spec.n_basis, width=spec.width, clip=spec.clip,
            t_block=t_block, interpret=interpret,
        )
        return jax.lax.psum(g_pad, "frames")

    gram_pad = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("frames"), P("frames"), P("frames")),
        out_specs=P(),
        # CHECK_VMA_REGISTRY (1/2 — see ARCHITECTURE.md "check_vma=False
        # registry"): pallas_call outputs do not carry varying-mesh-axis
        # metadata yet, so shard_map's varying-axis checking must be
        # bypassed for this program. The safety net it would provide
        # (catching a missing psum) is pinned instead by
        # tests/test_parallel.py::test_sharded_pallas_feat_fit_matches_single_device,
        # which runs this exact path at 8 shards against the single-device
        # result. Re-enable once Mosaic propagates vma metadata.
        check_vma=False,
    )(coords, forces, mask)
    g = group_mean.shape[0]
    gram = unpack_gram(gram_pad, g, spec.n_basis)
    if not spec.include_id:
        gram = gram[:, g:, g:]
    k_exp = gram.shape[-1]
    gram = gram + l2_regularization * jnp.eye(k_exp, dtype=coords.dtype)
    a_rows, b = _assemble_constraint_system(
        constr_coords, cmap_mat, group_mean, onehot, counts, centers, spec,
        coords.dtype,
    )
    return gram, a_rows, b


@partial(jax.jit, static_argnames=("spec", "t_block"))
def _pallas_fit_parts(
    coords: jax.Array,  # (T_pad, N, 3)
    forces: jax.Array,
    mask: jax.Array,
    constr_coords: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    t_block: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-site QP assembly with the fused Pallas Gram kernel."""
    from ..ops.pallas_gram import pack_operands, pallas_site_grams, unpack_gram

    t = coords.shape[0]
    extra = (-t) % t_block
    pad3 = ((0, extra), (0, 0), (0, 0))
    coords_p = jnp.pad(coords, pad3)
    forces_p = jnp.pad(forces, pad3)
    mask_p = jnp.pad(mask, (0, extra))
    gpos, cgp, fgp, centers_flat, kcounts = pack_operands(
        coords_p, forces_p, mask_p, cmap_mat, group_mean, onehot, counts,
        kbt, spec.n_basis, centers,
    )
    gram_pad = pallas_site_grams(
        gpos, cgp, fgp, mask_p, centers_flat, kcounts,
        n_basis=spec.n_basis, width=spec.width, clip=spec.clip,
        t_block=t_block,
        # non-TPU backends run the kernel in interpreter mode (tests)
        interpret=jax.devices()[0].platform != "tpu",
    )
    g = group_mean.shape[0]
    gram = unpack_gram(gram_pad, g, spec.n_basis)
    if not spec.include_id:
        gram = gram[:, g:, g:]
    k_exp = gram.shape[-1]
    gram = gram + l2_regularization * jnp.eye(k_exp, dtype=coords.dtype)
    a_rows, b = _assemble_constraint_system(
        constr_coords, cmap_mat, group_mean, onehot, counts, centers, spec,
        coords.dtype,
    )
    return gram, a_rows, b


@partial(jax.jit, static_argnames=("spec",))
def _fused_apply(
    points: jax.Array,  # (t, N, 3) forces to map
    copoints: jax.Array,  # (t, N, 3) coordinates (copoints)
    coefs: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """One-pass map application: geometry computed once, (t, S, 3) out."""
    cg = jnp.einsum("sj,tjd->tsd", cmap_mat, copoints, precision="highest")
    gauss, div = _group_feature_blocks(
        copoints, cg, group_mean, counts, centers, spec
    )
    g = onehot.shape[1]
    if spec.include_id:
        coef_id, coef_gb = coefs[:, :g], coefs[:, g:]
    else:
        coef_id, coef_gb = None, coefs
    coef_gb = coef_gb.reshape(coefs.shape[0], g, spec.n_basis)
    w_group = jnp.einsum("tsgk,sgk->tsg", gauss, coef_gb, precision="highest")
    if coef_id is not None:
        w_group = w_group + coef_id[None]
    w = jnp.einsum("tsg,jg->tsj", w_group, onehot, precision="highest")
    tr = kbt * jnp.einsum(
        "tsgka,sgk->tsa", div, coef_gb, precision="highest"
    )
    return jnp.einsum("tsj,tjd->tsd", w, points, precision="highest") + tr


@partial(jax.jit, static_argnames=("spec",))
def _fused_scale(
    copoints: jax.Array,  # (t, N, 3)
    coefs: jax.Array,  # (S, K_exp)
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Per-frame scale weights w[t, s, j] = sum_f feat[t,j,f] coef[s,f].

    Computed per group then broadcast to member atoms through the one-hot.
    """
    cg = jnp.einsum("sj,tjd->tsd", cmap_mat, copoints, precision="highest")
    gauss, _ = _group_feature_blocks(
        copoints, cg, group_mean, counts, centers, spec
    )  # gauss (t, S, G, K)
    g = onehot.shape[1]
    if spec.include_id:
        coef_id, coef_gb = coefs[:, :g], coefs[:, g:]
    else:
        coef_id, coef_gb = None, coefs
    coef_gb = coef_gb.reshape(coefs.shape[0], g, spec.n_basis)
    w_group = jnp.einsum("tsgk,sgk->tsg", gauss, coef_gb, precision="highest")
    if coef_id is not None:
        w_group = w_group + coef_id[None]
    return jnp.einsum("tsg,jg->tsj", w_group, onehot, precision="highest")


@partial(jax.jit, static_argnames=("spec",))
def _fused_trans(
    copoints: jax.Array,
    coefs: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Divergence translation term: (t, S, 3)."""
    cg = jnp.einsum("sj,tjd->tsd", cmap_mat, copoints, precision="highest")
    _, div = _group_feature_blocks(
        copoints, cg, group_mean, counts, centers, spec
    )  # div (t, S, G, K, 3)
    g = onehot.shape[1]
    coef_gb = coefs[:, g:] if spec.include_id else coefs
    coef_gb = coef_gb.reshape(coefs.shape[0], g, spec.n_basis)
    return kbt * jnp.einsum(
        "tsgka,sgk->tsa", div, coef_gb, precision="highest"
    )


class FusedGBMap(CLAMap):
    """CLAMap whose scale/trans run the fused device kernels.

    The trans term carries the kbt-scaled divergence correction, matching the
    reference decomposition of featurized maps into scale (force mixing) and
    trans (divergence offset) — reference qp/featlinearmap.py:462-530 — while
    its ``kbt`` scaling mirrors the G = force-term + kbt*div construction
    (reference qp/featlinearmap.py:361-368: the coefficient vector multiplies
    both the force features and the kbt-scaled divergence).
    """

    def __init__(
        self,
        coefs: np.ndarray,
        cmap_mat: np.ndarray,
        onehot: np.ndarray,
        centers: np.ndarray,
        kbt: float,
        spec: GBFeatSpec,
        tags=None,
        device_consts: Optional[tuple] = None,
    ) -> None:
        """Store fit artifacts (group structure derives from the one-hot).

        ``device_consts`` — (cmap_mat, onehot, counts, group_mean, centers)
        as device arrays — lets a batch of maps over the same system share
        ONE set of host->device transfers: without it every map's
        construction issues ~7 small device_puts, and on remote-attached
        devices those RPCs (not the solve) dominate the per-fit cost of a
        batched window (measured ~7-13 ms/fit of pure packaging).
        ``coefs`` may be a device array (e.g. a slice of the batch
        program's output), which skips its re-upload too.
        """
        self._coefs = jnp.asarray(coefs)
        if device_consts is not None:
            (
                self._cmap_mat,
                self._onehot,
                self._counts,
                self._group_mean,
                self._centers,
            ) = device_consts
        else:
            self._cmap_mat = jnp.asarray(cmap_mat)
            self._onehot = jnp.asarray(onehot)
            counts = np.asarray(onehot).sum(axis=0)
            self._counts = jnp.asarray(counts, dtype=self._coefs.dtype)
            self._group_mean = jnp.asarray(
                (np.asarray(onehot) / np.maximum(counts, 1.0)).T,
                dtype=self._coefs.dtype,
            )
            self._centers = jnp.asarray(centers)
        self._kbt = jnp.asarray(kbt, dtype=self._coefs.dtype)
        self._spec = spec

        def scale(copoints: np.ndarray) -> np.ndarray:
            return np.asarray(
                _fused_scale(
                    jnp.asarray(copoints, dtype=self._coefs.dtype),
                    self._coefs,
                    self._cmap_mat,
                    self._group_mean,
                    self._onehot,
                    self._counts,
                    self._centers,
                    spec,
                )
            )

        def trans(copoints: np.ndarray) -> np.ndarray:
            return np.asarray(
                _fused_trans(
                    jnp.asarray(copoints, dtype=self._coefs.dtype),
                    self._coefs,
                    self._cmap_mat,
                    self._group_mean,
                    self._onehot,
                    self._counts,
                    self._centers,
                    self._kbt,
                    spec,
                )
            )

        super().__init__(
            scale=scale,
            trans=trans,
            n_fg_sites=cmap_mat.shape[1],
            n_cg_sites=cmap_mat.shape[0],
            zeroes_check=False,
            tags=tags,
        )

    @staticmethod
    def make_device_consts(
        cmap_mat: np.ndarray, onehot: np.ndarray, centers: np.ndarray
    ) -> tuple:
        """One set of device-resident construction constants, shareable by
        every map fitted over the same system (see ``device_consts``)."""
        dtype = jnp.float32
        counts = np.asarray(onehot).sum(axis=0)
        return (
            jnp.asarray(cmap_mat, dtype=dtype),
            jnp.asarray(onehot, dtype=dtype),
            jnp.asarray(counts, dtype=dtype),
            jnp.asarray(
                (np.asarray(onehot) / np.maximum(counts, 1.0)).T, dtype=dtype
            ),
            jnp.asarray(centers, dtype=dtype),
        )

    def __call__(self, points, copoints):
        """Fused, frame-chunked application (type-preserving).

        Overrides the generic CLAMap path (which materializes the full
        (T, S, N) scale tensor and recomputes the geometry for scale and
        trans separately): each chunk runs one jitted kernel computing the
        geometry once and emitting the mapped forces directly, so
        sweep-scale trajectories apply in bounded memory. Device (jax)
        inputs yield device outputs — chunk results concatenate on device
        and nothing round-trips to the host; numpy inputs fetch per chunk
        (bounded host memory) and return numpy, matching CLAMap semantics.
        """
        device_in = isinstance(points, jax.Array) or isinstance(
            copoints, jax.Array
        )
        t = points.shape[0]
        chunk = 4096
        outs = []
        for lo in range(0, t, chunk):
            hi = min(t, lo + chunk)
            mapped = _fused_apply(
                jnp.asarray(points[lo:hi], dtype=self._coefs.dtype),
                jnp.asarray(copoints[lo:hi], dtype=self._coefs.dtype),
                self._coefs, self._cmap_mat, self._group_mean,
                self._onehot, self._counts, self._centers, self._kbt,
                self._spec,
            )
            outs.append(mapped if device_in else np.asarray(mapped))
        if device_in:
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return np.concatenate(outs, axis=0)


def recognize_canonical_featurizer(featurizer) -> Optional[GBFeatSpec]:
    """Detect the canonical id_feat+gb_feat featurizer and extract its spec.

    Recognized shapes: ``Multifeaturize([id_feat, Curry(gb_feat, ...)])``
    (in either order) and a bare ``Curry(gb_feat, ...)``. Returns None for
    anything else (the protocol path handles those).
    """
    from ..utils.funcs import Curry
    from .featlinearmap import Multifeaturize, id_feat as _id_feat
    from .jaxfeat import DIVMETHOD_CLOSED, gb_feat as _gb_feat

    def curry_spec(obj, include_id: bool) -> Optional[GBFeatSpec]:
        if not (isinstance(obj, Curry) and obj.func is _gb_feat and not obj.args):
            return None
        kw = dict(obj.kwargs)
        # options that do not change the math are irrelevant here
        kw.pop("batch_size", None)
        kw.pop("lazy", None)
        if kw.pop("div_method", DIVMETHOD_CLOSED) != DIVMETHOD_CLOSED:
            return None
        if "outer" not in kw:
            return None
        allowed = {"outer", "inner", "n_basis", "width", "dist_power"}
        if not set(kw) <= allowed:
            return None
        return GBFeatSpec(include_id=include_id, **kw)

    if isinstance(featurizer, Multifeaturize):
        subs = list(featurizer.featurizers)
        if len(subs) == 2 and _id_feat in subs:
            # either ordering: the fitted map is invariant to feature-column
            # permutation, and the fused path uses its own internal layout
            other = subs[1] if subs[0] is _id_feat else subs[0]
            return curry_spec(other, include_id=True)
        return None
    return curry_spec(featurizer, include_id=False)


@partial(
    jax.jit,
    static_argnames=("spec", "n_chunks", "solver_iters", "use_pallas", "mesh", "t_block"),
)
def _fit_coefs(
    coords: jax.Array,
    forces: jax.Array,
    mask: jax.Array,
    constr_coords: jax.Array,
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    solver_delta: jax.Array,
    solver_iters: int,
    use_pallas: bool,
    mesh=None,
    t_block: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused Gram/constraint assembly + batched KKT solve, one dispatch.

    Keeping assembly and solve under one trace matters on remote-attached
    devices where every executable launch carries transport latency; the
    coefficient fetch is then the fit's only host round-trip. Returns
    (coefs, gram, a_rows, b) — the QP pieces stay on device unless the
    float64 fallback needs them.
    """
    if use_pallas and mesh is not None:
        gram, a_rows, b = _pallas_mesh_fit_parts(
            coords, forces, mask, constr_coords, cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec,
            mesh=mesh, t_block=t_block,
        )
    elif use_pallas:
        gram, a_rows, b = _pallas_fit_parts(
            coords, forces, mask, constr_coords, cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec,
        )
    else:
        gram, a_rows, b = _fused_fit_parts(
            coords, forces, mask, constr_coords, cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec,
            n_chunks, mesh=mesh,
        )
    # the same rho-free shared-factor solver the batch path uses (with a
    # fit-batch of one), so single fits and batched fits are numerically
    # identical per problem
    coefs, resids = batched_eqp_solve_shared(
        gram, a_rows[None], b[None, ..., None], delta=solver_delta,
        iters=solver_iters, return_resid=True,
    )
    return coefs[0, ..., 0], jnp.max(resids), gram, a_rows, b


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_chunks", "t_pad", "solver_iters", "use_pallas", "t_block"
    ),
)
def _fit_coefs_e2e(
    coords: jax.Array,  # (T, N, 3) — unpadded
    forces: jax.Array,
    frame_idx: jax.Array,  # (F,) constraint-frame indices
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    t_pad: int,
    solver_delta: jax.Array,
    solver_iters: int,
    use_pallas: bool,
    t_block: int = 256,
):
    """Single-program fit: pad + mask + constraint-frame gather + Gram +
    solve in ONE executable.

    The split version (:func:`_fit_coefs` plus host-side pad/gather/mask
    staging) dispatches ~6 small XLA programs per fit; on a remote-attached
    device each dispatch is an RPC and each program is a separate
    cache-load at cold start — measured, that is seconds of the <10 s
    fresh-process budget. Folding everything into one traced program makes
    the fit one dispatch and one executable.
    """
    t = coords.shape[0]
    dtype = jnp.float32
    constr_coords = coords[frame_idx].astype(dtype)
    pad_spec = ((0, t_pad - t), (0, 0), (0, 0))
    coords_p = jnp.pad(coords.astype(dtype), pad_spec)
    forces_p = jnp.pad(forces.astype(dtype), pad_spec)
    mask = (jnp.arange(t_pad) < t).astype(dtype)
    return _fit_coefs(
        coords_p, forces_p, mask, constr_coords, cmap_mat, group_mean,
        onehot, counts, centers, kbt, l2_regularization, spec, n_chunks,
        solver_delta, solver_iters, use_pallas, mesh=None, t_block=t_block,
    )


def _siteblock_fit_body(
    coords: jax.Array,  # (T, N, 3) — unpadded
    forces: jax.Array,
    frame_idx: jax.Array,  # (F,) constraint-frame indices
    cmap_block: jax.Array,  # (Sb, N) rows of this site block
    site_sel: jax.Array,  # (Sb, S) one-hot of global site indices
    cmap_mat: jax.Array,  # (S, N) full map (constraint-row axis)
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    t_pad: int,
    solver_delta: jax.Array,
    solver_iters: int,
    use_pallas: bool,
    t_block: int,
):
    """Traceable body of the site-block fit (shared by jit and shard_map).

    Everything here is per-site-block arithmetic with no cross-block
    dependency, which is exactly what lets the mesh variant shard the
    site-block axis with NO collectives (cf. reference qp/qplinear.py's
    serial per-map OSQP loop, the stage this distributes).
    """
    t = coords.shape[0]
    dtype = jnp.float32
    constr_coords = coords[frame_idx].astype(dtype)
    pad_spec = ((0, t_pad - t), (0, 0), (0, 0))
    coords_p = jnp.pad(coords.astype(dtype), pad_spec)
    forces_p = jnp.pad(forces.astype(dtype), pad_spec)
    mask = (jnp.arange(t_pad) < t).astype(dtype)
    k_exp = spec.n_basis * onehot.shape[1] + (
        onehot.shape[1] if spec.include_id else 0
    )
    if use_pallas:
        from ..ops.pallas_gram import (
            pack_operands,
            pallas_site_grams_tiled,
            unpack_gram,
        )

        gpos, cgp, fgp, _, _ = pack_operands(
            coords_p, forces_p, mask, cmap_block, group_mean, onehot,
            counts, kbt, spec.n_basis, centers,
        )
        g = onehot.shape[1]
        g_pad = gpos.shape[2]
        kbt_counts = jnp.pad(kbt * counts, (0, g_pad - g))
        gram_pad = pallas_site_grams_tiled(
            gpos, cgp, fgp, mask, centers, kbt_counts,
            n_basis=spec.n_basis, width=spec.width, clip=spec.clip,
            t_block=t_block,
            interpret=jax.devices()[0].platform != "tpu",
        )
        gram = unpack_gram(gram_pad, g, spec.n_basis)
        if not spec.include_id:
            gram = gram[:, g:, g:]
    else:
        gram = _scan_gram(
            coords_p, forces_p, mask, cmap_block, group_mean, onehot,
            counts, centers, kbt, spec, n_chunks,
        )
    gram = gram + l2_regularization * jnp.eye(k_exp, dtype=dtype)
    a_rows, b = _assemble_constraint_system(
        constr_coords, cmap_mat, group_mean, onehot, counts, centers, spec,
        dtype, cmap_rows=cmap_block, site_sel=site_sel,
    )
    coefs, resids = batched_eqp_solve_shared(
        gram, a_rows[None], b[None, ..., None], delta=solver_delta,
        iters=solver_iters, return_resid=True,
    )
    return coefs[0, ..., 0], resids[0], gram, a_rows, b


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_chunks", "t_pad", "solver_iters", "use_pallas", "t_block"
    ),
)
def _fit_coefs_siteblock_e2e(
    coords, forces, frame_idx, cmap_block, site_sel, cmap_mat, group_mean,
    onehot, counts, centers, kbt, l2_regularization,
    spec: GBFeatSpec, n_chunks: int, t_pad: int, solver_delta,
    solver_iters: int, use_pallas: bool = False, t_block: int = 512,
):
    """One site block of the fused featurized fit, as ONE program.

    The per-site QPs are independent (the whole-map Gram is block-diagonal
    across sites), so fitting Sb sites at a time is EXACT — it bounds peak
    HBM at ~3*Sb*K_exp^2 floats (block Gram + factor + explicit inverse)
    instead of the full map's S*K_exp^2, which at solvated-system scale
    (K_exp = G*(1+n_basis) ~ 18k for ~3k atoms) exceeds device memory as
    one program. Every block reuses this executable: blocks are padded to
    a common Sb so the trace is shape-stable.
    """
    return _siteblock_fit_body(
        coords, forces, frame_idx, cmap_block, site_sel, cmap_mat,
        group_mean, onehot, counts, centers, kbt, l2_regularization,
        spec, n_chunks, t_pad, solver_delta, solver_iters, use_pallas,
        t_block,
    )


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_chunks", "t_pad", "solver_iters", "use_pallas",
        "t_block", "mesh",
    ),
)
def _fit_coefs_siteblock_mesh(
    coords, forces, frame_idx, cmap_blocks, site_sels, cmap_mat, group_mean,
    onehot, counts, centers, kbt, l2_regularization,
    spec: GBFeatSpec, n_chunks: int, t_pad: int, solver_delta,
    solver_iters: int, use_pallas: bool, t_block: int, mesh=None,
):
    """Site-sharded super-block fit: n_dev site blocks, one per device.

    The per-site QPs are independent, so the site-block axis shards with
    NO collectives: every device runs the whole block program (Gram —
    Pallas-tiled or scan — constraint assembly, shared-factor KKT solve)
    on its own ``Sb``-site slice of ``cmap_blocks``/``site_sels`` while
    the trajectory operands are replicated. This is the multi-chip form
    of SURVEY's "shard the cg-site axis for the per-site QPs": the sweep
    fit's device floor divides by the mesh size.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(cb, sel):
        return _siteblock_fit_body(
            coords, forces, frame_idx, cb, sel, cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec,
            n_chunks, t_pad, solver_delta, solver_iters, use_pallas,
            t_block,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        # CHECK_VMA_REGISTRY (2/2 — see ARCHITECTURE.md "check_vma=False
        # registry"): pallas_call outputs do not carry varying-mesh-axis
        # metadata yet (same situation as _pallas_mesh_fit_parts); there is
        # no psum to miss here — the shards are fully independent — and
        # tests/test_featlinear.py pins mesh-vs-single parity
        check_vma=False,
    )(cmap_blocks, site_sels)


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_chunks", "t_pad", "solver_iters", "use_pallas", "t_block"
    ),
)
def _fit_coefs_batch_e2e(
    coords: jax.Array,  # (T, N, 3) — unpadded
    forces: jax.Array,
    frame_idx_batch: jax.Array,  # (B, F) constraint-frame indices per fit
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    t_pad: int,
    solver_delta: jax.Array,
    solver_iters: int,
    use_pallas: bool,
    t_block: int = 256,
):
    """B fits over the SAME trajectory with different constraint samples,
    in ONE program that computes the Gram once.

    The Gram — the trajectory-sized, MXU-bound stage — does not depend on
    which frames anchor the orthogonality constraints, so a batch of
    bootstrap fits shares it exactly: B fits cost one Gram pass plus B
    vmapped constraint assemblies and solves, in one dispatch and one
    fetch. Measured at CLN scale the marginal fit is solver-bound
    (~1.7 ms/problem x S sites in the batched direct solve — the Gram and
    all per-fit transport amortize away); dispatching B independent fits
    instead pays B gram passes and B dispatch round-trips.
    """
    t = coords.shape[0]
    dtype = jnp.float32
    pad_spec = ((0, t_pad - t), (0, 0), (0, 0))
    coords_p = jnp.pad(coords.astype(dtype), pad_spec)
    forces_p = jnp.pad(forces.astype(dtype), pad_spec)
    mask = (jnp.arange(t_pad) < t).astype(dtype)
    # Gram once; the single-frame constraint system computed alongside is
    # discarded (negligible — one frame's rows)
    parts = (
        _pallas_fit_parts(
            coords_p, forces_p, mask, coords_p[:1], cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec,
            t_block=t_block,
        )
        if use_pallas
        else _fused_fit_parts(
            coords_p, forces_p, mask, coords_p[:1], cmap_mat, group_mean,
            onehot, counts, centers, kbt, l2_regularization, spec, n_chunks,
        )
    )
    gram = parts[0]

    def per_fit_rows(frame_idx):
        constr_coords = coords_p[frame_idx]
        return _assemble_constraint_system(
            constr_coords, cmap_mat, group_mean, onehot, counts, centers,
            spec, dtype,
        )

    rows_b, b_b = jax.vmap(per_fit_rows)(frame_idx_batch)  # (B, S, m, K), (B, S, m)
    # every fit shares the SAME per-site Grams (the trajectory is fixed;
    # only the sampled orthogonality frames differ), so the batched solve
    # factorizes each site's augmented operator ONCE for the whole window
    # instead of once per (fit, site) problem
    coefs_b, resid_fs = batched_eqp_solve_shared(
        gram, rows_b, b_b[..., None], delta=solver_delta,
        iters=solver_iters, return_resid=True,
    )
    return _batch_fit_outputs(coefs_b[..., 0], resid_fs, gram)


def _batch_fit_outputs(coefs_b, resid_fs, gram):
    """Shape the batch programs' outputs for transport-free packaging.

    Returns (per-fit coefficient slices, per-fit max residual, per-fit
    finiteness flag, gram) — all still on device. Three choices matter on
    remote-attached devices:

      * the escalation predicate's finiteness check runs ON DEVICE, so the
        host sync fetches two (B,)-vectors (~0.5 KB) instead of the whole
        (B, S, K_exp) coefficient stack (~2 MB per 64-fit window);
      * the (B, S, m, K_exp) constraint systems are NOT outputs — at
        window scale they pinned ~hundreds of MB of HBM per in-flight
        window; escalating fits (rare) recompute theirs via
        :func:`_constraint_system_e2e`;
      * coefficients come out pre-split per fit (the split used to be its
        own dispatch RPC per window).
    """
    finite_b = jnp.isfinite(coefs_b).all(axis=(1, 2))
    coefs_rows = tuple(coefs_b[i] for i in range(coefs_b.shape[0]))
    return coefs_rows, jnp.max(resid_fs, axis=1), finite_b, gram


@partial(jax.jit, static_argnames=("spec",))
def _constraint_system_e2e(
    coords: jax.Array,  # (T, N, 3) — unpadded device trajectory
    frame_idx: jax.Array,  # (F,) one fit's constraint-frame indices
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
):
    """One fit's constraint system (gather + assembly) as one program.

    The batch programs no longer output their (B, S, m, K_exp) constraint
    systems (see :func:`_batch_fit_outputs`); the float64 escalation of a
    failed fit recomputes exactly the system its solve used — the same
    f32 assembly arithmetic on the same sampled frames.
    """
    constr_coords = coords[frame_idx].astype(jnp.float32)
    return _assemble_constraint_system(
        constr_coords, cmap_mat, group_mean, onehot, counts, centers, spec,
        jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_chunks", "solver_iters", "use_pallas", "mesh", "t_block"
    ),
)
def _fit_coefs_batch_mesh(
    coords_p: jax.Array,  # (T_pad, N, 3) frame-sharded over the mesh
    forces_p: jax.Array,
    mask: jax.Array,
    constr_coords_b: jax.Array,  # (B, F, N, 3) replicated
    cmap_mat: jax.Array,
    group_mean: jax.Array,
    onehot: jax.Array,
    counts: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    solver_delta: jax.Array,
    solver_iters: int,
    use_pallas: bool,
    mesh,
    t_block: int = 256,
):
    """Mesh twin of :func:`_fit_coefs_batch_e2e`: ONE frame-sharded Gram
    pass (psum over ICI) shared by B fits, then the SHARDED shared-factor
    solve — the per-site factorization+inverse splits over sites and the
    per-fit Schur stage splits over fits, both on the same mesh axis
    (``ops.eqp.batched_eqp_solve_shared_mesh``), so the window's dominant
    device stage scales with chips instead of replicating. Constraint
    frames arrive as gathered coordinates (replicated operand) rather
    than indices, so no cross-shard gather is needed inside the
    program."""
    dtype = coords_p.dtype
    if use_pallas:
        gram, _, _ = _pallas_mesh_fit_parts(
            coords_p, forces_p, mask, constr_coords_b[0, :1], cmap_mat,
            group_mean, onehot, counts, centers, kbt, l2_regularization,
            spec, mesh=mesh, t_block=t_block,
        )
    else:
        gram, _, _ = _fused_fit_parts(
            coords_p, forces_p, mask, constr_coords_b[0, :1], cmap_mat,
            group_mean, onehot, counts, centers, kbt, l2_regularization,
            spec, n_chunks, mesh=mesh,
        )

    def per_fit_rows(constr_coords):
        return _assemble_constraint_system(
            constr_coords, cmap_mat, group_mean, onehot, counts, centers,
            spec, dtype,
        )

    rows_b, b_b = jax.vmap(per_fit_rows)(constr_coords_b)
    from ..ops.eqp import batched_eqp_solve_shared_mesh

    coefs_b, resid_fs = batched_eqp_solve_shared_mesh(
        gram, rows_b, b_b[..., None], mesh=mesh, delta=solver_delta,
        iters=solver_iters, return_resid=True,
    )
    return _batch_fit_outputs(coefs_b[..., 0], resid_fs, gram)


def group_factorization(
    coord_map: LinearMap, spec: GBFeatSpec, constraints: Constraints
) -> dict:
    """Group-factorized featurization geometry (trajectory-independent).

    The canonical id+gb featurization lives on constraint GROUPS, not
    atoms; this returns the {onehot, group_mean, counts, centers} arrays
    that define it — a pure function of the topology (coordinate map +
    constraint sets) and the basis spec. CV and streaming fits call this
    directly; :func:`_prepare_fused_setup` adds the per-trajectory padding
    plan on top.
    """
    ids = id_feat(None, coord_map, constraints, return_ids=True)
    n_channels = int(ids.max()) + 1
    onehot = np.zeros((coord_map.n_fg_sites, n_channels), dtype=np.float32)
    onehot[np.arange(coord_map.n_fg_sites), ids] = 1.0
    counts = onehot.sum(axis=0)
    group_mean = (onehot / np.maximum(counts, 1.0)).T.astype(np.float32)
    centers = _basis_centers(spec).astype(np.float32)
    return {
        "onehot": onehot,
        "group_mean": group_mean,
        "counts": counts,
        "centers": centers,
    }


def _prepare_fused_setup(
    traj: Trajectory,
    coord_map: LinearMap,
    spec: GBFeatSpec,
    constraints: Constraints,
    chunk_size: int,
    mesh,
    use_pallas: Union[bool, str],
) -> dict:
    """Shared fit setup: group factorization, padding plan, pallas policy."""
    geom = group_factorization(coord_map, spec, constraints)
    onehot, group_mean = geom["onehot"], geom["group_mean"]
    counts, centers = geom["counts"], geom["centers"]

    t = len(traj)
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    n_chunks = n_dev * max(1, -(-t // (n_dev * chunk_size)))
    chunk = -(-t // n_chunks)
    t_pad = chunk * n_chunks

    if use_pallas == "auto":
        # measured on v5e: ~10x over the jitted XLA scan for the Gram stage
        # at t_block=1024 with a ~2 s one-time compile; AGGFORCE_PALLAS=0
        # opts out
        import os

        use_pallas = (
            os.environ.get("AGGFORCE_PALLAS", "1") == "1"
            and jax.devices()[0].platform == "tpu"
        )
    # deep frame blocks keep the MXU pipeline fed (measured ~10 TF/s at 256
    # vs ~95 TF/s at 1024 on v5e); small trajectories keep shallow blocks so
    # padding (and interpret-mode test time) stays bounded
    t_blk = 1024 if t >= 4096 else 256
    return {
        "onehot": onehot,
        "group_mean": group_mean,
        "counts": counts,
        "centers": centers,
        "t": t,
        "n_chunks": n_chunks,
        "t_pad": t_pad,
        "pad": t_pad - t,
        "use_pallas": use_pallas,
        "t_blk": t_blk,
    }


def _fit_device_operands(cmap_np, group_mean, onehot, counts, centers):
    """Device-resident copies of the per-system fit constants, memoized by
    content. Repeated fits over one system (steady-state loops, CV grids,
    bootstrap batches) otherwise re-upload ~5 small host arrays per call,
    and on remote-attached devices each device_put is its own ~1-2 ms RPC
    — more transport than the solve itself. Returns
    (cmap, group_mean, onehot, counts, centers) as f32 device arrays.

    Thin wrapper over :func:`aggforce_tpu.utils.devcache.device_const` —
    ONE content-keyed cache implementation for the whole package (each
    array is memoized individually under the shared LRU).
    """
    from ..utils.devcache import device_const

    return (
        device_const(cmap_np, dtype=np.float32),
        device_const(group_mean, dtype=np.float32),
        device_const(onehot, dtype=np.float32),
        device_const(counts, dtype=np.float32),
        device_const(centers, dtype=np.float32),
    )


def _device_scalar(x) -> jax.Array:
    """Memoized f32 device scalar (kbt / l2 / delta re-upload per fit)."""
    from ..utils.devcache import device_scalar

    return device_scalar(x, dtype=jnp.float32)


class _LazyCoefTags(dict):
    """Tags dict whose ``coef_list`` materializes from the still-on-device
    coefficients on first read access.

    The batched fit's remaining per-window host transfer would be the
    (B, S, K_exp) coefficient fetch (~2 MB per 64-fit window, plus a sync
    RPC, through remote-attach tunnels); most consumers — bootstrap
    pipelines that re-apply maps on device — never read ``coef_list``, so
    the fetch is deferred until something actually asks for the host
    arrays. Python-level read accessors (getitem/get/contains,
    iteration/len, keys/items/values, ==, copy, pop/setdefault)
    materialize first; after that this behaves as a plain dict holding
    numpy rows, matching the reference's eager ``coef_list`` tag
    (reference qp/featlinearmap.py:391).

    Because ``keys``/``items``/``__iter__``/``__len__`` are all overridden,
    CPython's C-level copy paths also materialize: ``dict(tags)``,
    ``{**tags}``, and ``json.dumps(tags)`` route through the overridden
    iteration accessors on dict subclasses (verified on CPython 3.11/3.12),
    so none of them can observe a missing ``coef_list``.
    """

    def __init__(self, coefs_dev, base: dict) -> None:
        super().__init__(base)
        self._coefs_dev = coefs_dev

    def _materialize(self) -> None:
        dev = self.__dict__.get("_coefs_dev")
        if dev is not None:
            self._coefs_dev = None
            super().__setitem__("coef_list", list(np.asarray(dev)))

    def __getitem__(self, key):
        if key == "coef_list":
            self._materialize()
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key == "coef_list":
            self._materialize()
        return super().get(key, default)

    def __contains__(self, key) -> bool:
        if key == "coef_list":
            self._materialize()
        return super().__contains__(key)

    def __setitem__(self, key, value) -> None:
        if key == "coef_list":
            # a user-assigned value must win: cancel the pending fetch so
            # a later read does not clobber it with the device copy
            self._coefs_dev = None
        super().__setitem__(key, value)

    def pop(self, key, *default):
        if key == "coef_list":
            self._materialize()
        return super().pop(key, *default)

    def popitem(self):
        self._materialize()
        return super().popitem()

    def setdefault(self, key, default=None):
        if key == "coef_list":
            self._materialize()
        return super().setdefault(key, default)

    def __iter__(self):
        self._materialize()
        return super().__iter__()

    def __len__(self) -> int:
        self._materialize()
        return super().__len__()

    def keys(self):
        self._materialize()
        return super().keys()

    def items(self):
        self._materialize()
        return super().items()

    def values(self):
        self._materialize()
        return super().values()

    def copy(self):
        self._materialize()
        return dict(super().items())

    def __repr__(self) -> str:
        self._materialize()
        return super().__repr__()

    def __eq__(self, other) -> bool:
        self._materialize()
        return super().__eq__(other)

    def __ne__(self, other):
        # explicit because dict's C-level richcompare would otherwise
        # handle != on the raw storage, bypassing the subclass __eq__
        result = self.__eq__(other)
        if result is NotImplemented:
            return result
        return not result

    __hash__ = None  # mutable mapping, same as dict


def fused_gb_linear_map_batch(
    traj: Trajectory,
    coord_map: LinearMap,
    kbt: float,
    spec: GBFeatSpec,
    seeds,
    constraints: Optional[Constraints] = None,
    n_constraint_frames: int = 20,
    l2_regularization: float = 1e1,
    chunk_size: int = 2048,
    solver_delta: float = 1e-6,
    solver_iters: int = 40,
    resid_tol: float = 1e-4,
    use_pallas: Union[bool, str] = "auto",
    flush_every: int = 16,
    mesh=None,
):
    """Fit one map per constraint-sample seed, sharing ONE Gram pass.

    Every fit in the batch runs over the same trajectory — the Gram (the
    trajectory-sized, MXU-bound stage) is identical across seeds, so each
    window of ``flush_every`` seeds dispatches ONE program that computes
    the Gram once and vmaps only the per-seed constraint assemblies and
    solves (:func:`_fit_coefs_batch_e2e`), then syncs on ~0.5 KB of
    per-fit residuals + device-computed finiteness flags — coefficients
    stay on device inside the packaged maps (fetched lazily on first
    ``coef_list`` access). The marginal fit therefore costs a tiny batched
    solve instead of a full Gram pass plus a dispatch round-trip.
    ``flush_every`` bounds the solve's working set (the per-window
    (B, S, m, K) constraint systems live only inside the program; they are
    not outputs). Use cases: bootstrap uncertainty
    over the sampled orthogonality frames, or simply fitting many maps
    fast. Returns a list of CLAFTMaps (one per seed), each
    convergence-checked exactly like :func:`fused_gb_linear_map`.

    With ``mesh`` (1-D, axis "frames") each window's single Gram pass is
    frame-sharded across the devices (psum over ICI) while the per-seed
    constraint assemblies and the shared-factor solve run replicated —
    the batch and mesh compositions stack.
    """
    if constraints is None:
        constraints = set()
    seeds = list(seeds)
    setup = _prepare_fused_setup(
        traj, coord_map, spec, constraints, chunk_size, mesh, use_pallas
    )
    t = setup["t"]
    t_pad, t_blk = setup["t_pad"], setup["t_blk"]
    if setup["use_pallas"]:
        t_pad = -(-t_pad // t_blk) * t_blk
    dtype = jnp.float32
    n_cf = min(n_constraint_frames, t)
    coords_dev = jnp.asarray(traj.coords)
    forces_dev = jnp.asarray(traj.forces)
    if mesh is not None:
        # stage the padded, frame-sharded trajectory ONCE for every window
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.devices.size)
        if setup["use_pallas"]:
            t_pad = -(-t_pad // (n_dev * t_blk)) * (n_dev * t_blk)
        else:
            t_pad = -(-t_pad // n_dev) * n_dev
        pad3 = ((0, t_pad - t), (0, 0), (0, 0))
        sharding = NamedSharding(mesh, P("frames"))
        coords_sh = jax.device_put(
            jnp.pad(coords_dev.astype(dtype), pad3), sharding
        )
        forces_sh = jax.device_put(
            jnp.pad(forces_dev.astype(dtype), pad3), sharding
        )
        mask_sh = jax.device_put(
            jnp.asarray(
                np.concatenate([np.ones(t), np.zeros(t_pad - t)]), dtype
            ),
            sharding,
        )
    cmap_dev, gmean_dev, onehot_dev, counts_dev, centers_dev = (
        _fit_device_operands(
            coord_map.standard_matrix, setup["group_mean"],
            setup["onehot"], setup["counts"], setup["centers"],
        )
    )
    common = (
        cmap_dev,
        gmean_dev,
        onehot_dev,
        counts_dev,
        centers_dev,
        _device_scalar(kbt),
        _device_scalar(l2_regularization),
    )
    maps = []
    window = max(1, int(flush_every))
    # one set of map-construction device constants and ONE JLinearMap
    # conversion shared by every packaged map: per-map device_puts are
    # small RPCs whose latency dominated batched per-fit cost (~7-13
    # ms/fit measured through the remote-attach tunnel)
    from ..map import JLinearMap

    # packaging constants = the same memoized device operands (FusedGBMap
    # unpacks (cmap, onehot, counts, group_mean, centers)); one shared
    # device kbt — FusedGBMap.__init__'s jnp.asarray(kbt) is then a no-op
    # where a host float would cost a device_put RPC per packaged map
    device_consts = (cmap_dev, onehot_dev, counts_dev, gmean_dev, centers_dev)
    kbt_dev = _device_scalar(kbt)
    package_coord_map = (
        JLinearMap.from_linearmap(coord_map)
        if isinstance(coord_map, LinearMap)
        and not isinstance(coord_map, JLinearMap)
        else coord_map
    )
    cmap_np = np.asarray(coord_map.standard_matrix, dtype=np.float32)

    def _dispatch_window(lo):
        """Dispatch one window's fit program (async) and return its handles."""
        chunk_seeds = seeds[lo : lo + window]
        idx = np.stack(
            [
                np.random.default_rng(seed).choice(t, size=n_cf, replace=False)
                for seed in chunk_seeds
            ]
        )
        n_valid = len(chunk_seeds)
        if n_valid < window and lo > 0:
            # pad the tail window so it reuses the full-window executable
            # (padded fits are discarded): the wasted batched solves cost
            # milliseconds each while compiling a second, smaller-batch
            # program costs seconds through the remote compile service. A
            # sole small batch (lo == 0) compiles its own program instead.
            if window - n_valid > n_valid:
                import warnings

                warnings.warn(
                    f"fused_gb_linear_map_batch: tail of {n_valid} seeds "
                    f"padded to the {window}-fit window "
                    f"({window - n_valid} discarded solves; align "
                    f"len(seeds) to flush_every to avoid)",
                    stacklevel=3,
                )
            idx = np.concatenate(
                [idx, np.repeat(idx[-1:], window - n_valid, axis=0)]
            )
        if mesh is not None:
            # constraint frames gathered from the unsharded original
            # (small: B x F frames) and passed as a replicated operand
            constr_b = coords_dev[jnp.asarray(idx)].astype(dtype)
            coefs_rows, resid_b, finite_b, gram = _fit_coefs_batch_mesh(
                coords_sh,
                forces_sh,
                mask_sh,
                constr_b,
                *common,
                spec,
                setup["n_chunks"],
                _device_scalar(solver_delta),
                solver_iters,
                setup["use_pallas"],
                mesh,
                t_block=t_blk,
            )
        else:
            coefs_rows, resid_b, finite_b, gram = _fit_coefs_batch_e2e(
                coords_dev,
                forces_dev,
                jnp.asarray(idx),
                *common,
                spec,
                setup["n_chunks"],
                t_pad,
                _device_scalar(solver_delta),
                solver_iters,
                setup["use_pallas"],
                t_block=t_blk,
            )
        return n_valid, idx, coefs_rows, resid_b, finite_b, gram

    def _package_window(pending):
        """Sync one dispatched window and package its maps (in seed order).

        The sync fetches ONLY the per-fit residuals and device-computed
        finiteness flags (~0.5 KB); coefficients stay on device inside each
        packaged map (``_LazyCoefTags`` defers the host copy until someone
        reads ``coef_list``). Escalating fits (rare) recompute their
        constraint system (:func:`_constraint_system_e2e`) and fetch the
        window Gram once.
        """
        n_valid, idx, coefs_rows, resid_b, finite_b, gram = pending
        fetched_finite, fetched_resid = jax.device_get((finite_b, resid_b))
        gram_h = None  # window Gram, fetched once if any fit escalates
        for i in range(n_valid):
            resid_i = float(fetched_resid[i])
            converged = bool(fetched_finite[i]) and (
                resid_i <= resid_tol
            )  # NaN-aware: non-finite resid fails the <= comparison
            if converged:
                force_map = FusedGBMap(
                    coefs=coefs_rows[i],
                    cmap_mat=cmap_np,
                    onehot=setup["onehot"],
                    centers=setup["centers"],
                    kbt=kbt_dev,
                    spec=spec,
                    tags=_LazyCoefTags(
                        coefs_rows[i], {"solver_resid": resid_i}
                    ),
                    device_consts=device_consts,
                )
                maps.append(
                    CLAFTMap(
                        coord_map=package_coord_map, force_map=force_map
                    )
                )
                continue
            # escalation: recompute this fit's constraint system (the batch
            # program no longer outputs the (B, S, m, K) stacks) and hand
            # the pieces to the shared float64 packaging path
            rows_dev, b_dev = _constraint_system_e2e(
                coords_dev, jnp.asarray(idx[i]), cmap_dev, gmean_dev,
                onehot_dev, counts_dev, centers_dev, spec,
            )
            if gram_h is None:
                gram_h = np.asarray(gram)
            maps.append(
                _package_fused_map(
                    coefs_rows[i], resid_i, gram_h,
                    np.asarray(rows_dev), np.asarray(b_dev),
                    package_coord_map, setup["onehot"],
                    setup["centers"], kbt_dev, spec, resid_tol,
                    device_consts=device_consts,
                )
            )
        # drop the window's device buffers — each packaged map keeps only
        # its own (S, K) coefficient slice (~25 KB)
        del coefs_rows, resid_b, finite_b, gram

    # software pipeline over flush windows: up to ``depth`` windows are
    # dispatched ahead of the one being fetched/packaged, so the (tiny)
    # sync payload and host packaging of window w overlap the device
    # compute of windows w+1..w+depth, and the dispatch RPCs themselves
    # (device_put of the frame indices + the execute call — each a
    # latency-floored round trip on remote-attached devices) hide behind
    # device compute instead of serializing with it. Each in-flight window
    # holds its Gram + B coefficient slices (tens of MB at peptide scale;
    # the (B, S, m, K) constraint systems are no longer outputs).
    from collections import deque

    depth = 2
    pending: deque = deque()
    for lo in range(0, len(seeds), window):
        pending.append(_dispatch_window(lo))
        if len(pending) > depth:
            _package_window(pending.popleft())
    while pending:
        _package_window(pending.popleft())
    return maps


def fused_gb_linear_map(
    traj: Trajectory,
    coord_map: LinearMap,
    kbt: float,
    spec: GBFeatSpec,
    constraints: Optional[Constraints] = None,
    n_constraint_frames: int = 20,
    l2_regularization: float = 1e1,
    chunk_size: int = 2048,
    constraint_rng: Optional[np.random.Generator] = None,
    solver_delta: float = 1e-6,
    solver_iters: int = 40,
    resid_tol: float = 1e-4,
    mesh=None,
    use_pallas: Union[bool, str] = "auto",
) -> CLAFTMap:
    """Device-resident featurized fit for the canonical id+gb featurization.

    Produces the same optimization as ``qp_feat_linear_map`` with
    ``Multifeaturize([id_feat, gb_feat(**spec)])`` but never materializes the
    expanded feature tensors — the hot path is one scanned fused kernel plus
    a batched KKT solve, all on device. Passing a 1-D ``mesh`` (axis
    "frames") shards the frame axis across devices with a psum'd Gram.

    ``use_pallas`` selects the hand-written Pallas Gram kernel
    (:mod:`aggforce_tpu.ops.pallas_gram` — distances, basis, divergences and
    the MXU Gram fused in VMEM) instead of the XLA scan; "auto" enables it
    on single-device TPU runs.

    Convergence is checked, not assumed: the device solver returns the max
    equilibrated constraint violation ``max|Ax-b|`` with the coefficients
    (one extra scalar in the same fetch), and any finite-but-unconverged
    solve above ``resid_tol`` escalates to the float64 LAPACK oracle — the
    analogue of the reference's OSQP eps_abs=1e-7 + polish guarantee. The
    achieved residual is recorded in the returned map's tags
    (``tags["solver_resid"]``).
    """
    if constraints is None:
        constraints = set()
    setup = _prepare_fused_setup(
        traj, coord_map, spec, constraints, chunk_size, mesh, use_pallas
    )
    onehot, group_mean, counts, centers = (
        setup["onehot"], setup["group_mean"], setup["counts"],
        setup["centers"],
    )
    t, n_chunks, t_pad, pad = (
        setup["t"], setup["n_chunks"], setup["t_pad"], setup["pad"]
    )
    use_pallas, t_blk = setup["use_pallas"], setup["t_blk"]

    rng = constraint_rng if constraint_rng is not None else np.random.default_rng()
    # short trajectories: cannot sample more distinct constraint frames than
    # exist, so clamp (every frame then anchors the orthogonality rows)
    n_constraint_frames = min(n_constraint_frames, t)
    frame_idx = rng.choice(t, size=n_constraint_frames, replace=False)

    dtype = jnp.float32

    # per-system constants as memoized device operands: fits over one
    # system re-upload nothing but the sampled constraint frames
    cmap_dev, gmean_dev, onehot_dev, counts_dev, centers_dev = (
        _fit_device_operands(
            coord_map.standard_matrix, group_mean, onehot, counts, centers
        )
    )
    device_consts = (cmap_dev, onehot_dev, counts_dev, gmean_dev, centers_dev)
    kbt_dev = _device_scalar(kbt)
    if mesh is None:
        # single-device: the whole fit (pad, mask, constraint-frame gather,
        # Gram, batched solve) is ONE program and one dispatch
        if use_pallas:
            t_pad = -(-t_pad // t_blk) * t_blk
        coefs, solver_resid, gram, a_rows, b = _fit_coefs_e2e(
            jnp.asarray(traj.coords),
            jnp.asarray(traj.forces),
            jnp.asarray(frame_idx),
            cmap_dev,
            gmean_dev,
            onehot_dev,
            counts_dev,
            centers_dev,
            kbt_dev,
            _device_scalar(l2_regularization),
            spec,
            n_chunks,
            t_pad,
            _device_scalar(solver_delta),
            solver_iters,
            use_pallas,
            t_block=t_blk,
        )
        return _package_fused_map(
            coefs, solver_resid, gram, a_rows, b, coord_map, onehot,
            centers, kbt_dev, spec, resid_tol,
            device_consts=device_consts,
        )

    # --- mesh (multi-device) staging: shard the padded frame axis ---
    pad_spec = ((0, pad), (0, 0), (0, 0))
    coords_dev = jnp.pad(jnp.asarray(traj.coords, dtype=dtype), pad_spec)
    forces_dev = jnp.pad(jnp.asarray(traj.forces, dtype=dtype), pad_spec)
    constr_coords = jnp.asarray(traj.coords, dtype=dtype)[
        jnp.asarray(frame_idx)
    ]
    mask_dev = jnp.asarray(
        np.concatenate([np.ones(t), np.zeros(pad)]), dtype=dtype
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("frames"))
    coords_dev = jax.device_put(coords_dev, sharding)
    forces_dev = jax.device_put(forces_dev, sharding)
    mask_dev = jax.device_put(mask_dev, sharding)
    if use_pallas and mesh is not None:
        # mesh variant needs per-shard frame counts divisible by t_block
        n_dev = int(mesh.devices.size)
        t_now = coords_dev.shape[0]
        extra = (-t_now) % (n_dev * t_blk)
        if extra:
            pad3 = ((0, extra), (0, 0), (0, 0))
            coords_dev = jnp.pad(coords_dev, pad3)
            forces_dev = jnp.pad(forces_dev, pad3)
            mask_dev = jnp.pad(mask_dev, (0, extra))
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P("frames"))
            coords_dev = jax.device_put(coords_dev, sharding)
            forces_dev = jax.device_put(forces_dev, sharding)
            mask_dev = jax.device_put(mask_dev, sharding)
        fit_mesh, fit_pallas = mesh, True
    elif use_pallas:
        fit_mesh, fit_pallas = None, True
    else:
        fit_mesh, fit_pallas = mesh, False
    coefs, solver_resid, gram, a_rows, b = _fit_coefs(
        coords_dev,
        forces_dev,
        mask_dev,
        constr_coords,
        cmap_dev,
        gmean_dev,
        onehot_dev,
        counts_dev,
        centers_dev,
        kbt_dev,
        _device_scalar(l2_regularization),
        spec,
        n_chunks,
        _device_scalar(solver_delta),
        solver_iters,
        fit_pallas,
        mesh=fit_mesh,
        t_block=t_blk,
    )
    return _package_fused_map(
        coefs, solver_resid, gram, a_rows, b, coord_map, onehot, centers,
        kbt_dev, spec, resid_tol,
        device_consts=device_consts,
    )


def fused_gb_linear_map_blocked(
    traj: Trajectory,
    coord_map: LinearMap,
    kbt: float,
    spec: GBFeatSpec,
    constraints: Optional[Constraints] = None,
    n_constraint_frames: int = 20,
    l2_regularization: float = 1e1,
    chunk_size: int = 2048,
    constraint_rng: Optional[np.random.Generator] = None,
    solver_delta: float = 1e-6,
    solver_iters: int = 40,
    resid_tol: float = 1e-4,
    site_block: int = 2,
    use_pallas: Union[bool, str] = "auto",
    mesh=None,
) -> CLAFTMap:
    """Site-blocked featurized fit for solvated-system (sweep) scale.

    The fused one-program fit materializes the full (S, K_exp, K_exp) Gram
    stack; with K_exp = G*(1+n_basis) this is ~S*K_exp^2*4 bytes plus the
    solver's factor and explicit inverse — at the BASELINE sweep geometry
    (~3k atoms, G~2.2k groups, K_exp~18k) that is tens of GB and cannot
    exist on one chip. Because the per-site QPs are independent, fitting
    ``site_block`` sites per program bounds peak HBM at
    ~3*site_block*K_exp^2 floats with NO approximation: each block's Gram,
    constraint system, and solve are bit-identical to the slices the
    unblocked program would produce (the solver's per-problem arithmetic
    is batch-composition invariant). One executable is traced and reused
    by every block (the last block is padded by repeating its final site
    and the padding dropped).

    Cost model (why blocking, not sharding, is the scale lever here): the
    per-site Gram costs K_exp^2 * 3T MACs, so sweep-scale featurized fits
    are FLOP-dominated; blocks stream through the chip back to back and
    MXU utilization is identical to the unblocked program's.

    ``use_pallas`` ("auto": on for TPU) routes the Gram through the
    Gram-tiled Pallas kernel (:func:`..ops.pallas_gram.pallas_site_grams_tiled`)
    — the flagship kernel's VMEM accumulator cannot hold K_pad ~ 9k, so
    the tile variant computes one (G_pad, G_pad) upper-triangle
    basis-block pair at a time, mirroring the symmetric tiles in XLA.

    Passing a 1-D ``mesh`` shards the SITE-BLOCK axis: each device runs
    one ``site_block``-site block program (Gram + assembly + solve) on a
    replicated trajectory, with no collectives — the per-site QPs are
    independent, so a super-block of ``n_dev * site_block`` sites fits
    per dispatch and the device floor divides by the mesh size. Per-site
    float64 escalation is unchanged (the sharded QP pieces are fetched
    only for failing sites).

    Escalation granularity differs from the unblocked program, by design:
    :func:`_package_fused_map` escalates EVERY site to the float64 oracle
    when the map's max residual misses ``resid_tol``, while this path
    escalates only the sites whose own solves missed — converged f32 sites
    keep their (batch-composition-invariant) device results, and at sweep
    scale re-solving all S K_exp-sized systems on the host for one bad
    site would dominate the fit.
    """
    if constraints is None:
        constraints = set()
    setup = _prepare_fused_setup(
        traj, coord_map, spec, constraints, chunk_size, None, use_pallas
    )
    onehot, group_mean, counts, centers = (
        setup["onehot"], setup["group_mean"], setup["counts"],
        setup["centers"],
    )
    t, n_chunks, t_pad = setup["t"], setup["n_chunks"], setup["t_pad"]
    use_pallas = setup["use_pallas"]
    # the Gram-tiled kernel's VMEM live set is O(t_block * G_pad) input
    # windows plus a (G_pad, G_pad) tile accumulator; deep frame blocks
    # feed the MXU but at solvated G_pad the 512-deep windows overflow the
    # ~100 MB VMEM grant, so the depth backs off with group width
    g_pad_est = max(16, -(-onehot.shape[1] // 16) * 16)
    t_blk = 512 if (t >= 4096 and g_pad_est <= 1536) else 256
    # AGGFORCE_SWEEP_TBLOCK overrides the tile depth (deeper frame blocks
    # raise the Gram kernel's MXU utilization until the two (t_blk, G_pad)
    # input windows + intermediates overflow the ~100 MB VMEM grant)
    t_blk = int(os.environ.get("AGGFORCE_SWEEP_TBLOCK", t_blk))
    if use_pallas:
        t_pad = -(-t_pad // t_blk) * t_blk

    rng = constraint_rng if constraint_rng is not None else np.random.default_rng()
    n_constraint_frames = min(n_constraint_frames, t)
    frame_idx = rng.choice(t, size=n_constraint_frames, replace=False)

    dtype = jnp.float32
    cmap_np = np.asarray(coord_map.standard_matrix, dtype=np.float32)
    s_all = cmap_np.shape[0]
    sb = max(1, min(site_block, s_all))
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    step_sites = sb * n_dev  # sites per dispatch (one block per device)
    coords_dev = jnp.asarray(traj.coords)
    forces_dev = jnp.asarray(traj.forces)
    frame_idx_dev = jnp.asarray(frame_idx)
    # per-system constants through the memoized device caches (repeat sweep
    # fits re-paid one device_put RPC per constant per call otherwise)
    common = (
        *_fit_device_operands(cmap_np, group_mean, onehot, counts, centers),
        _device_scalar(kbt),
        _device_scalar(l2_regularization),
    )
    solver_delta_dev = _device_scalar(solver_delta)
    # AGGFORCE_PROF_BLOCKS=1: per-block wall clocks to stderr (dispatch ->
    # drain; under the pipeline a drain overlaps the NEXT block's device
    # execution, so steady-state walls track the device program, not the
    # host tail)
    prof_blocks = os.environ.get("AGGFORCE_PROF_BLOCKS", "0") == "1"
    # Depth-1 software pipeline: dispatch block k+1 (async XLA dispatch)
    # BEFORE fetching block k's results, so the per-block host tail — the
    # coefficient-fetch RPC, the numpy escalation check, and the next
    # block's selector upload — overlaps device compute instead of idling
    # the chip between programs. The TPU still runs one program at a time;
    # the overlap window just keeps block k's output buffers (~Sb*K^2
    # floats, the Gram kept for possible f64 escalation) alive while block
    # k+1 executes, ~+40% peak HBM at the sweep geometry. Sb is chosen
    # with that headroom (site_block=8 already OOMs unpipelined);
    # AGGFORCE_SWEEP_PIPELINE=0 restores the strictly-serial loop.
    pipelined = os.environ.get("AGGFORCE_SWEEP_PIPELINE", "1") == "1"
    coefs_blocks = []
    resid_max = 0.0

    def _drain(entry) -> None:
        nonlocal resid_max
        idx, coefs_b, resid_b, gram_b, rows_b, b_b, t_block0, blk = entry
        coefs_np, resid_np = jax.device_get((coefs_b, resid_b))
        coefs_np = np.array(coefs_np)[: len(idx)]
        resid_np = np.array(resid_np)[: len(idx)]
        bad = ~np.isfinite(coefs_np).all(axis=1) | ~(resid_np <= resid_tol)
        if bad.any():  # NaN-aware
            from ..ops.eqp import eqp_solve_host

            gram_h, rows_h, b_h = jax.device_get((gram_b, rows_b, b_b))
            for s_loc in np.nonzero(bad)[0]:
                coefs_np[s_loc] = eqp_solve_host(
                    np.asarray(gram_h[s_loc], dtype=np.float64),
                    np.asarray(rows_h[s_loc], dtype=np.float64),
                    np.asarray(b_h[s_loc], dtype=np.float64)[:, None],
                )[:, 0].astype(np.float32)
                rn = (
                    np.linalg.norm(rows_h[s_loc], axis=1, keepdims=True)
                    + 1e-300
                )
                resid_np[s_loc] = np.max(
                    np.abs(
                        b_h[s_loc] / rn[:, 0]
                        - (rows_h[s_loc] / rn) @ coefs_np[s_loc]
                    )
                )
        coefs_blocks.append(coefs_np)
        resid_max = max(resid_max, float(resid_np.max()))
        if prof_blocks:
            print(
                f"[siteblock {blk}] "
                f"{time.perf_counter() - t_block0:.3f}s "
                f"(sites {idx[0]}-{idx[-1]}, resid {float(resid_np.max()):.2e})",
                file=sys.stderr,
            )

    pending = None
    for s0 in range(0, s_all, step_sites):
        t_block0 = time.perf_counter() if prof_blocks else 0.0
        idx = np.arange(s0, min(s0 + step_sites, s_all))
        # pad the final block by repeating its last site; dropped on exit
        pad_idx = np.concatenate(
            [idx, np.repeat(idx[-1:], step_sites - len(idx))]
        )
        sel = np.zeros((step_sites, s_all), dtype=np.float32)
        sel[np.arange(step_sites), pad_idx] = 1.0
        fit_kwargs = dict(
            spec=spec, n_chunks=n_chunks, t_pad=t_pad,
            solver_delta=solver_delta_dev,
            solver_iters=solver_iters,
            use_pallas=use_pallas, t_block=t_blk,
        )
        fit_args = (
            coords_dev, forces_dev, frame_idx_dev,
            jnp.asarray(cmap_np[pad_idx], dtype=dtype),
            jnp.asarray(sel),
            *common,
        )
        if mesh is None:
            coefs_b, resid_b, gram_b, rows_b, b_b = _fit_coefs_siteblock_e2e(
                *fit_args, **fit_kwargs
            )
        else:
            coefs_b, resid_b, gram_b, rows_b, b_b = _fit_coefs_siteblock_mesh(
                *fit_args, **fit_kwargs, mesh=mesh
            )
        entry = (
            idx, coefs_b, resid_b, gram_b, rows_b, b_b,
            t_block0, s0 // step_sites,
        )
        if pending is not None:
            _drain(pending)
            pending = None
        if pipelined:
            pending = entry
        else:
            _drain(entry)
    if pending is not None:
        _drain(pending)
    coefs_all = np.concatenate(coefs_blocks, axis=0)
    if not np.all(np.isfinite(coefs_all)):
        raise ValueError("Map optimization failed.")
    force_map = FusedGBMap(
        coefs=coefs_all,
        cmap_mat=cmap_np,
        onehot=onehot,
        centers=centers,
        kbt=kbt,
        spec=spec,
        tags={"coef_list": list(coefs_all), "solver_resid": resid_max},
    )
    from ..map import JLinearMap

    if isinstance(coord_map, LinearMap) and not isinstance(
        coord_map, JLinearMap
    ):
        coord_map = JLinearMap.from_linearmap(coord_map)
    return CLAFTMap(coord_map=coord_map, force_map=force_map)


def _package_fused_map(
    coefs, solver_resid, gram, a_rows, b, coord_map, onehot, centers, kbt,
    spec, resid_tol,
    device_consts=None,
    coefs_dev=None,
) -> CLAFTMap:
    """Fetch coefficients + residual (the fit's single host sync), escalate
    unconverged solves to float64, and wrap the result as a CLAFTMap.

    ``a_rows``/``b`` may be zero-argument callables producing the arrays —
    or None when the caller has already applied the same escalation
    predicate and established this fit will not escalate (the batch path
    does this to avoid pinning per-fit device constraint systems in HBM).

    ``device_consts`` (see :meth:`FusedGBMap.make_device_consts`) and
    ``coefs_dev`` (the fit's coefficients still on device) let batch
    callers skip the per-map host->device re-uploads of construction
    constants — the packaging RPCs otherwise dominate batched per-fit
    cost on remote-attached devices. ``coord_map`` may already be a
    JLinearMap (batch callers convert once and share it).
    """
    coefs_np, resid_val = jax.device_get((coefs, solver_resid))
    coefs_np = np.asarray(coefs_np)
    resid_val = float(resid_val)
    escalated = False
    if not np.all(np.isfinite(coefs_np)) or not resid_val <= resid_tol:  # NaN-aware
        escalated = True
        # f32 solves on ill-conditioned feature Grams can fail outright
        # (non-finite) or converge past tolerance while staying finite —
        # OSQP's eps_abs=1e-7 + polish would catch both (reference
        # qp/qplinear.py:21-27). Either way, escalate every site's solve to
        # the float64 LAPACK oracle.
        from ..ops.eqp import eqp_solve_host

        if a_rows is None or b is None:
            raise RuntimeError(
                "escalation requested but the constraint system was "
                "dropped — caller's escalation predicate disagrees with "
                "_package_fused_map's"
            )
        gram_h = np.asarray(gram, dtype=np.float64)
        rows_h = np.asarray(a_rows() if callable(a_rows) else a_rows, dtype=np.float64)
        b_h = np.asarray(b() if callable(b) else b, dtype=np.float64)
        coefs_np = np.stack(
            [
                eqp_solve_host(gram_h[s], rows_h[s], b_h[s][:, None])[:, 0]
                for s in range(gram_h.shape[0])
            ]
        ).astype(np.float32)
        row_norm = np.linalg.norm(rows_h, axis=2, keepdims=True) + 1e-300
        resid_val = float(
            np.max(
                np.abs(
                    b_h / row_norm[..., 0]
                    - np.einsum("smn,sn->sm", rows_h / row_norm, coefs_np)
                )
            )
        )
    if not np.all(np.isfinite(coefs_np)):
        raise ValueError("Map optimization failed.")
    force_map = FusedGBMap(
        # device-resident coefficients when the f32 solve stood (asarray is
        # then a no-op); escalated fits upload their f64-refined values
        coefs=coefs_np if (coefs_dev is None or escalated) else coefs_dev,
        cmap_mat=np.asarray(coord_map.standard_matrix, dtype=np.float32),
        onehot=onehot,
        centers=centers,
        kbt=kbt,
        spec=spec,
        tags={"coef_list": list(coefs_np), "solver_resid": resid_val},
        device_consts=device_consts,
    )
    from ..map import JLinearMap

    # device-native coordinate map so device-resident trajectories apply
    # without a host round-trip (numpy in -> numpy out is preserved);
    # plain LinearMap coordinate maps would pull device coords to host
    if isinstance(coord_map, LinearMap) and not isinstance(
        coord_map, JLinearMap
    ):
        coord_map = JLinearMap.from_linearmap(coord_map)
    return CLAFTMap(coord_map=coord_map, force_map=force_map)
