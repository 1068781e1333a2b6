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

Map application is fused the same way (per-frame scale weights
``w[t,c,j] = sum_feat feat[t,j,f] coef[c,f]`` computed on the fly), so the
returned CLAFTMap maps forces with two einsums per chunk.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints, reduce_constraint_sets
from ..map import CLAFTMap, CLAMap, LinearMap
from ..map.tools import smear_map
from ..ops.eqp import batched_eqp_solve
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
def _site_feature_blocks(
    coords: jax.Array,  # (t, N, 3) chunk
    cg_points: jax.Array,  # (t, S, 3)
    smear: jax.Array,  # (N, N)
    onehot: jax.Array,  # (N, G)
    centers: jax.Array,  # (K,)
    spec: GBFeatSpec,
) -> Tuple[jax.Array, jax.Array]:
    """Per-chunk Gaussian basis values and closed-form divergence factors.

    Returns (gauss, div) with gauss (t, S, N, K) and div (t, S, G*K, 3)
    where S indexes cg sites and G channel groups.
    """
    s = jnp.einsum("ij,tjd->tid", smear, coords, precision="highest")
    disp = s[:, None, :, :] - cg_points[:, :, None, :]  # (t, S, N, 3)
    d = jnp.sqrt(jnp.sum(disp * disp, axis=-1))  # (t, S, N)
    offset = (d[..., None] - centers) / spec.width  # (t, S, N, K)
    raw = jnp.exp(-(offset**2))
    gauss = jnp.maximum(raw, spec.clip) - spec.clip
    # closed-form divergence: dphi * unit-vector, channel-aggregated via
    # SC[j, g] = sum_{m in channel g} smear[j, m]
    u = disp / jnp.maximum(d, 1e-30)[..., None]
    dphi = jnp.where(raw > spec.clip, raw * (-2.0 * offset / spec.width), 0.0)
    sc = jnp.matmul(smear, onehot, precision="highest")  # (N, G)
    div = jnp.einsum("tsjk,tsja,jg->tsgka", dphi, u, sc, precision="highest")
    t, s_dim = div.shape[0], div.shape[1]
    div = div.reshape(t, s_dim, -1, 3)  # (t, S, G*K, 3)
    return gauss, div


@partial(jax.jit, static_argnames=("spec",))
def _chunk_gram(
    coords: jax.Array,  # (t, N, 3)
    forces: jax.Array,  # (t, N, 3)
    mask: jax.Array,  # (t,) 1.0 for valid frames
    cg_points: jax.Array,  # (t, S, 3)
    smear: jax.Array,
    onehot: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Per-site Gram contribution of one frame chunk: (S, K_exp, K_exp)."""
    gauss, div = _site_feature_blocks(
        coords, cg_points, smear, onehot, centers, spec
    )
    # gb force contraction: g_gb[t,s,a,(g,k)] = sum_j F[t,j,a] oh[j,g] gz[t,s,j,k]
    g_gb = jnp.einsum(
        "tja,jg,tsjk->tsagk", forces, onehot, gauss, precision="highest"
    )
    t, s_dim = g_gb.shape[0], g_gb.shape[1]
    g_gb = g_gb.reshape(t, s_dim, 3, -1)
    g_gb = g_gb + kbt * jnp.swapaxes(div, 2, 3)
    if spec.include_id:
        g_id = jnp.einsum("tja,jg->tag", forces, onehot, precision="highest")
        g_id = jnp.broadcast_to(
            g_id[:, None, :, :], (t, s_dim) + g_id.shape[1:]
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
    smear: jax.Array,
    onehot: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Sampled orthogonality rows per site: (S, tc*S, K_exp)."""
    gauss, _ = _site_feature_blocks(
        coords, cg_points, smear, onehot, centers, spec
    )
    # rows_gb[t,s,c,(g,k)] = sum_j M[c,j] oh[j,g] gauss[t,s,j,k]
    rows_gb = jnp.einsum(
        "cj,jg,tsjk->tscgk", cmap_mat, onehot, gauss, precision="highest"
    )
    tc, s_dim, c_dim = rows_gb.shape[0], rows_gb.shape[1], rows_gb.shape[2]
    rows_gb = rows_gb.reshape(tc, s_dim, c_dim, -1)
    if spec.include_id:
        rows_id = jnp.matmul(cmap_mat, onehot, precision="highest")  # (c, G)
        rows_id = jnp.broadcast_to(
            rows_id[None, None, :, :], (tc, s_dim) + rows_id.shape
        )
        rows = jnp.concatenate([rows_id, rows_gb], axis=-1)
    else:
        rows = rows_gb
    # flatten (frame, cg-row) into the constraint-row axis, per site
    rows = jnp.swapaxes(rows, 0, 1)  # (S, tc, c, K_exp)
    return rows.reshape(s_dim, tc * c_dim, -1)


@partial(
    jax.jit,
    static_argnames=("spec", "n_chunks", "refine_iters"),
)
def _fused_fit(
    coords: jax.Array,  # (T_pad, N, 3)
    forces: jax.Array,  # (T_pad, N, 3)
    mask: jax.Array,  # (T_pad,)
    constr_coords: jax.Array,  # (tc, N, 3)
    cmap_mat: jax.Array,  # (S, N)
    smear: jax.Array,
    onehot: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    l2_regularization: jax.Array,
    spec: GBFeatSpec,
    n_chunks: int,
    delta: float = 1e-6,
    refine_iters: int = 8,
) -> jax.Array:
    """End-to-end fused fit: scan Gram accumulation + batched KKT solve.

    Returns per-site coefficients (S, K_exp).
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
            cc, fc, mc, cg, smear, onehot, centers, kbt, spec
        )
        return gram, None

    gram0 = jnp.zeros((s_dim, k_exp, k_exp), dtype=coords.dtype)
    gram, _ = jax.lax.scan(body, gram0, (coords_c, forces_c, mask_c))
    gram = gram + l2_regularization * jnp.eye(k_exp, dtype=coords.dtype)

    cg_constr = jnp.einsum(
        "sj,tjd->tsd", cmap_mat, constr_coords, precision="highest"
    )
    a_rows = _constraint_rows(
        constr_coords, cg_constr, cmap_mat, smear, onehot, centers, spec
    )  # (S, tc*S, K_exp)
    tc = constr_coords.shape[0]
    # b[s, (t, c)] = 1 when c == s
    b = jnp.eye(s_dim, dtype=coords.dtype)[:, None, :]  # (S, 1, S)
    b = jnp.broadcast_to(b, (s_dim, tc, s_dim)).reshape(s_dim, tc * s_dim)
    coefs = batched_eqp_solve(
        gram, a_rows, b[..., None], delta=delta, refine_iters=refine_iters
    )
    return coefs[..., 0]  # (S, K_exp)


@partial(jax.jit, static_argnames=("spec",))
def _fused_scale(
    copoints: jax.Array,  # (t, N, 3)
    coefs: jax.Array,  # (S, K_exp)
    cmap_mat: jax.Array,
    smear: jax.Array,
    onehot: jax.Array,
    centers: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Per-frame scale weights w[t, s, j] = sum_f feat[t,j,f] coef[s,f]."""
    cg = jnp.einsum("sj,tjd->tsd", cmap_mat, copoints, precision="highest")
    gauss, _ = _site_feature_blocks(copoints, cg, smear, onehot, centers, spec)
    g = onehot.shape[1]
    if spec.include_id:
        coef_id, coef_gb = coefs[:, :g], coefs[:, g:]
    else:
        coef_id, coef_gb = None, coefs
    coef_gb = coef_gb.reshape(coefs.shape[0], g, spec.n_basis)
    w = jnp.einsum(
        "tsjk,jg,sgk->tsj", gauss, onehot, coef_gb, precision="highest"
    )
    if coef_id is not None:
        w = w + jnp.einsum("jg,sg->sj", onehot, coef_id, precision="highest")[
            None
        ]
    return w


@partial(jax.jit, static_argnames=("spec",))
def _fused_trans(
    copoints: jax.Array,
    coefs: jax.Array,
    cmap_mat: jax.Array,
    smear: jax.Array,
    onehot: jax.Array,
    centers: jax.Array,
    kbt: jax.Array,
    spec: GBFeatSpec,
) -> jax.Array:
    """Divergence translation term: (t, S, 3)."""
    cg = jnp.einsum("sj,tjd->tsd", cmap_mat, copoints, precision="highest")
    _, div = _site_feature_blocks(copoints, cg, smear, onehot, centers, spec)
    g = onehot.shape[1]
    coef_gb = coefs[:, g:] if spec.include_id else coefs
    return kbt * jnp.einsum(
        "tsfa,sf->tsa", div, coef_gb, precision="highest"
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
        smear: np.ndarray,
        onehot: np.ndarray,
        centers: np.ndarray,
        kbt: float,
        spec: GBFeatSpec,
        tags=None,
    ) -> None:
        """Store fit artifacts; shapes are validated by a zero-probe."""
        self._coefs = jnp.asarray(coefs)
        self._cmap_mat = jnp.asarray(cmap_mat)
        self._smear = jnp.asarray(smear)
        self._onehot = jnp.asarray(onehot)
        self._centers = jnp.asarray(centers)
        self._kbt = jnp.asarray(kbt, dtype=self._coefs.dtype)
        self._spec = spec

        def scale(copoints: np.ndarray) -> np.ndarray:
            return np.asarray(
                _fused_scale(
                    jnp.asarray(copoints, dtype=self._coefs.dtype),
                    self._coefs,
                    self._cmap_mat,
                    self._smear,
                    self._onehot,
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
                    self._smear,
                    self._onehot,
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
    delta: float = 1e-6,
    refine_iters: int = 8,
) -> CLAFTMap:
    """Device-resident featurized fit for the canonical id+gb featurization.

    Produces the same optimization as ``qp_feat_linear_map`` with
    ``Multifeaturize([id_feat, gb_feat(**spec)])`` but never materializes the
    expanded feature tensors — the hot path is one scanned fused kernel plus
    a batched KKT solve, all on device.
    """
    if constraints is None:
        constraints = set()
    ids = id_feat(traj.coords, coord_map, constraints, return_ids=True)
    n_channels = int(ids.max()) + 1
    onehot = np.zeros((coord_map.n_fg_sites, n_channels), dtype=np.float32)
    onehot[np.arange(coord_map.n_fg_sites), ids] = 1.0
    smear = np.asarray(
        smear_map(
            site_groups=reduce_constraint_sets(constraints),
            n_sites=coord_map.n_fg_sites,
            return_mapping_matrix=True,
        ),
        dtype=np.float32,
    )
    centers = _basis_centers(spec).astype(np.float32)

    t = len(traj)
    n_chunks = max(1, -(-t // chunk_size))
    t_pad = n_chunks * ((t + n_chunks - 1) // n_chunks)
    chunk = t_pad // n_chunks
    t_pad = chunk * n_chunks
    pad = t_pad - t

    coords = np.concatenate(
        [traj.coords, np.zeros((pad,) + traj.coords.shape[1:], traj.coords.dtype)]
    )
    forces = np.concatenate(
        [traj.forces, np.zeros((pad,) + traj.forces.shape[1:], traj.forces.dtype)]
    )
    mask = np.concatenate([np.ones(t), np.zeros(pad)]).astype(np.float32)

    rng = constraint_rng if constraint_rng is not None else np.random.default_rng()
    frame_idx = rng.choice(t, size=n_constraint_frames, replace=False)
    constr_coords = traj.coords[frame_idx]

    dtype = jnp.float32
    coefs = _fused_fit(
        jnp.asarray(coords, dtype=dtype),
        jnp.asarray(forces, dtype=dtype),
        jnp.asarray(mask, dtype=dtype),
        jnp.asarray(constr_coords, dtype=dtype),
        jnp.asarray(coord_map.standard_matrix, dtype=dtype),
        jnp.asarray(smear, dtype=dtype),
        jnp.asarray(onehot, dtype=dtype),
        jnp.asarray(centers, dtype=dtype),
        jnp.asarray(kbt, dtype=dtype),
        jnp.asarray(l2_regularization, dtype=dtype),
        spec,
        n_chunks,
        delta=delta,
        refine_iters=refine_iters,
    )
    coefs_np = np.asarray(coefs)
    if not np.all(np.isfinite(coefs_np)):
        raise ValueError("Map optimization failed.")
    force_map = FusedGBMap(
        coefs=coefs_np,
        cmap_mat=np.asarray(coord_map.standard_matrix, dtype=np.float32),
        smear=smear,
        onehot=onehot,
        centers=centers,
        kbt=kbt,
        spec=spec,
        tags={"coef_list": list(coefs_np)},
    )
    return CLAFTMap(coord_map=coord_map, force_map=force_map)
