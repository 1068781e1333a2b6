r"""Featurized (configuration-dependent) force-map optimization.

Behavior parity targets: reference qp/featlinearmap.py:249-394
(``qp_feat_linear_map``), :397-459 (sampled orthogonality constraints),
:462-530 (CLAMap packaging), :553-627 (``id_feat``), :73-246 (``FeatZipper``),
:630-745 (``multifeaturize`` / ``Multifeaturize``).

The optimization: per cg site i, find coefficients c_i minimizing

    sum_{t,a} ( sum_j F[t,j,a] feat_i[t,j,k] c_k  +  kbt * div_i[t,k,a] c_k )^2
        + l2 * |c_i|^2
    s.t.  (M feat_i[t'] c_i) = e_i   for sampled frames t'

TPU-first redesign: the per-site Gram matrices are accumulated on device in
frame chunks (one fused einsum kernel per chunk — the (T, N, K) feature
tensor is streamed, never duplicated), and each site's equality-constrained
QP is solved by the shared KKT solver instead of OSQP. The featurizer
*protocol* (lists/generators of per-site arrays) is preserved so external
featurizers keep working.
"""

from typing import (
    Any,
    Callable,
    ClassVar,
    Dict,
    Final,
    Generator,
    Iterable,
    List,
    Optional,
    Tuple,
    TypedDict,
    Union,
)

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import Constraints, reduce_constraint_sets
from ..map import CLAFTMap, CLAMap, LinearMap
from ..ops.eqp import eqp_solve_auglag, eqp_solve_host
from ..trajectory import Trajectory
from .qplinear import DEVICE_REFINE_ITERS, SolverOptions, _solver_opts

KNAME_FEATS: Final = "feats"
KNAME_DIVS: Final = "divs"
KNAME_NAMES: Final = "names"


class Features(TypedDict):
    """Featurizer output: per-cg-site feature and divergence arrays."""

    feats: Iterable[np.ndarray]
    divs: Iterable[np.ndarray]
    names: Union[Iterable[str], None]


Featurizer = Callable[[np.ndarray, LinearMap, Constraints], Features]
GeneralizedFeatures = Union[Features, "FeatZipper"]
GeneralizedFeaturizer = Union[
    Callable[[np.ndarray, LinearMap, Constraints], Union[Features, "FeatZipper"]],
    Featurizer,
]


class FeatZipper:
    """Lazily concatenates the output of multiple featurizers.

    Indexing with "feats"/"divs" yields generators whose items concatenate the
    corresponding per-site arrays from every content dict along the feature
    axis; laziness means at most one cg site's combined tensor is live at a
    time. Sources are consumed as iteration proceeds (one-shot semantics,
    like the reference).
    """

    generator_keys: ClassVar[frozenset] = frozenset([KNAME_FEATS, KNAME_DIVS])
    name_key: ClassVar[str] = KNAME_NAMES

    joiners: ClassVar[Dict[str, Callable]] = {
        KNAME_FEATS: lambda args: np.concatenate(args, axis=2),
        KNAME_DIVS: lambda args: np.concatenate(args, axis=1),
    }

    def __init__(self, content: List[GeneralizedFeatures]) -> None:
        """Store featurizer outputs to aggregate."""
        self.reset(content)
        self.names = None

    def keys(self) -> frozenset:
        """All valid indexing keys."""
        return self.generator_keys.union(frozenset([KNAME_NAMES]))

    def reset(self, content: Iterable[GeneralizedFeatures]) -> None:
        """(Re)bind the zipped per-key source iterators."""
        self.source = {
            key: zip(*[c[key] for c in content]) for key in self.generator_keys
        }

    def _makegenerator(self, key: str) -> Generator[np.ndarray, None, None]:
        joiner = self.joiners[key]
        for items in self.source[key]:
            yield joiner(items)

    def __getitem__(self, key: str):
        """Return the aggregating generator for a key ("names" returns None)."""
        if key in self.generator_keys:
            return self._makegenerator(key)
        if key == KNAME_NAMES:
            return self.names
        raise KeyError(f"Invalid key; valid keys are {self.keys()}")


# chunk of frames processed per device call when accumulating Gram matrices
_GRAM_CHUNK: Final = 2048


@jax.jit
def _site_gram_chunk(
    forces: jax.Array, feat: jax.Array, div: jax.Array, kbt: jax.Array
) -> jax.Array:
    """Partial Gram for one frame chunk of one cg site.

    forces: (t, N, 3); feat: (t, N, K); div: (t, K, 3). Returns (K, K).
    The force/feature contraction and the Gram product are two MXU GEMMs.
    """
    g = jnp.einsum("tja,tjk->tak", forces, feat, precision="highest")
    ms = g + kbt * jnp.swapaxes(div, 1, 2)
    flat = ms.reshape(-1, ms.shape[-1])
    return jnp.matmul(flat.T, flat, precision="highest")


@jax.jit
def _constr_chunk(cmap_mat: jax.Array, feat_sub: jax.Array) -> jax.Array:
    """Constraint rows for sampled frames: (t', N, K) -> (t'*n_cg, K)."""
    rows = jnp.einsum("cj,tjk->tck", cmap_mat, feat_sub, precision="highest")
    return rows.reshape(-1, rows.shape[-1])


def _accumulate_site(
    forces: np.ndarray,
    feat: np.ndarray,
    div: np.ndarray,
    kbt: float,
) -> np.ndarray:
    """Stream frame chunks through the device and accumulate the site Gram."""
    n_frames = forces.shape[0]
    n_chunks = max(1, -(-n_frames // _GRAM_CHUNK))
    bounds = np.linspace(0, n_frames, n_chunks + 1, dtype=int)
    gram: Optional[jax.Array] = None
    kbt_arr = jnp.asarray(kbt, dtype=jnp.asarray(feat[:1]).dtype)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        part = _site_gram_chunk(
            jnp.asarray(forces[lo:hi]),
            jnp.asarray(feat[lo:hi]),
            jnp.asarray(div[lo:hi]),
            kbt_arr,
        )
        gram = part if gram is None else gram + part
    return np.asarray(gram, dtype=np.float64)


def _constr_arrays(
    features: np.ndarray,
    cg_ind: int,
    coord_map: LinearMap,
    n_frames: int,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sampled orthogonality-constraint system (A, b) for one cg site.

    Random frames are drawn; each contributes n_cg rows demanding the
    feature-weighted map reproduce the coordinate-map row pattern e_i.
    """
    if rng is None:
        rng = np.random.default_rng()
    frame_indices = rng.choice(len(features), size=n_frames, replace=False)
    sub = features[frame_indices]
    mult = np.asarray(
        _constr_chunk(
            jnp.asarray(coord_map.standard_matrix, dtype=jnp.asarray(sub[:1]).dtype),
            jnp.asarray(sub),
        )
    )
    target = np.zeros((n_frames, coord_map.n_cg_sites))
    target[:, cg_ind] = 1.0
    return mult, target.reshape(-1)


def qp_feat_linear_map(
    traj: Trajectory,
    coord_map: LinearMap,
    featurizer: GeneralizedFeaturizer,
    kbt: float,
    n_constraint_frames: int = 20,
    constraints: Optional[Constraints] = None,
    sparse: bool = True,  # noqa: ARG001 - accepted for reference compatibility
    solver_args: Optional[Union[SolverOptions, dict]] = None,
    l2_regularization: float = 1e1,
    constraint_rng: Optional[np.random.Generator] = None,
    allow_fused: bool = True,
    mesh=None,
) -> CLAFTMap:
    """Optimize a force map linear in user-provided configuration features.

    Signature mirrors the reference (qp/featlinearmap.py:249); ``sparse`` is
    accepted but ignored (the KKT solver needs no sparsification), and
    ``constraint_rng`` additionally allows deterministic constraint-frame
    sampling.

    When the featurizer is recognized as the canonical id+gb combination and
    no explicit solver backend is requested, the fit is dispatched to the
    fully fused device path (same optimization, no feature materialization);
    pass ``allow_fused=False`` to force the generic protocol path. ``mesh``
    (a 1-D jax Mesh over axis "frames") shards the fused fit's frame axis
    across devices; the generic protocol path is single-device and ignores
    it.
    """
    if constraints is None:
        constraints = set()
    opts = _solver_opts(dict(solver_args) if solver_args else None)

    if allow_fused and opts.get("backend", "auto") == "auto":
        from .fusedfeat import fused_gb_linear_map, recognize_canonical_featurizer

        spec = recognize_canonical_featurizer(featurizer)
        if spec is not None:
            return fused_gb_linear_map(
                traj,
                coord_map,
                kbt=kbt,
                spec=spec,
                constraints=constraints,
                n_constraint_frames=n_constraint_frames,
                l2_regularization=l2_regularization,
                constraint_rng=constraint_rng,
                mesh=mesh,
            )

    feat_results = featurizer(traj.coords, coord_map, constraints)
    feats = feat_results[KNAME_FEATS]
    divs = feat_results[KNAME_DIVS]
    names = feat_results[KNAME_NAMES]

    backend = opts.get("backend", "auto")
    if backend == "auto":
        backend = "device"

    per_site_coef: List[np.ndarray] = []
    for ind, (feat, div) in enumerate(zip(feats, divs)):
        constr_mult, constr_target = _constr_arrays(
            features=feat,
            cg_ind=ind,
            coord_map=coord_map,
            n_frames=n_constraint_frames,
            rng=constraint_rng,
        )
        gram = _accumulate_site(traj.forces, feat, div, kbt)
        if l2_regularization > 0:
            gram = gram + l2_regularization * np.eye(gram.shape[0])
        if backend == "host":
            params = eqp_solve_host(
                gram,
                constr_mult,
                constr_target[:, None],
                delta=opts.get("delta", 1e-12),
                refine_iters=opts.get("refine_iters", 4),
            )[:, 0]
        else:
            params_dev, resid = eqp_solve_auglag(
                jnp.asarray(gram, dtype=jnp.float32),
                jnp.asarray(constr_mult, dtype=jnp.float32),
                jnp.asarray(constr_target[:, None], dtype=jnp.float32),
                delta=opts.get("delta", 1e-6),
                iters=opts.get("refine_iters", DEVICE_REFINE_ITERS),
                return_resid=True,
            )
            # one host round-trip for solution + diagnostic (separate
            # fetches each pay the 10-45 ms tunnel latency per site)
            params, resid_v = jax.device_get((params_dev, resid))
            params = np.asarray(params)[:, 0]
            if not np.all(np.isfinite(params)) or not float(resid_v) <= opts.get(
                "resid_tol", 1e-4
            ):  # NaN-aware
                # f32 conditioning failure (non-finite, or finite but
                # unconverged past tolerance): retry with the f64 oracle
                params = eqp_solve_host(
                    gram, constr_mult, constr_target[:, None]
                )[:, 0]
        if not np.all(np.isfinite(params)):
            raise ValueError("Map optimization failed.")
        per_site_coef.append(params)

    force_map = _feat_linear_mapping(
        featurizer=featurizer,
        coefs=per_site_coef,
        mapping=coord_map,
        constraints=constraints,
        kbt=kbt,
        tags={"feat_names": names, "coef_list": per_site_coef},
    )
    return CLAFTMap(coord_map=coord_map, force_map=force_map)


def _feat_linear_mapping(
    featurizer: GeneralizedFeaturizer,
    coefs: List[np.ndarray],
    mapping: LinearMap,
    constraints: Constraints,
    kbt: float = 1.0,
    **kwargs,
) -> CLAMap:
    """Package per-site feature coefficients as a CLAMap.

    The returned map re-runs the featurizer on new coordinates at apply time:
    scale weights are feature/coefficient contractions, translations come
    from the kbt-scaled divergence term.

    Note: the optimization objective contains the divergence as ``kbt * div``
    (reference qp/featlinearmap.py:361-368), so the applied map must carry
    the same scaling; the reference's apply path drops the kbt factor
    (reference qp/featlinearmap.py:492-495), which is inconsistent with its
    own fit objective — fixed here.
    """

    def scale_f(copoints: np.ndarray) -> np.ndarray:
        feats = featurizer(copoints, mapping, constraints)[KNAME_FEATS]
        weights = [np.einsum("...jk,k->...j", f, c) for f, c in zip(feats, coefs)]
        return np.stack(weights, axis=1)

    def trans_f(copoints: np.ndarray) -> np.ndarray:
        divs = featurizer(copoints, mapping, constraints)[KNAME_DIVS]
        weights = [
            kbt * np.einsum("tka,k->ta", d, c) for d, c in zip(divs, coefs)
        ]
        return np.stack(weights, axis=1)

    return CLAMap(
        scale=scale_f,
        trans=trans_f,
        n_fg_sites=mapping.n_fg_sites,
        zeroes_check=True,
        **kwargs,
    )


def id_feat(
    points: np.ndarray,
    cmap: LinearMap,
    constraints: Constraints,
    return_ids: bool = False,
) -> Union[np.ndarray, Features]:
    """One-hot per-site label features (labels shared within constraint groups).

    With ``return_ids=True`` returns the (n_fg_sites,) int32 label array
    instead (used by other featurizers to allocate channels respecting
    constraints). Features are frame-independent, so divergences are zero and
    every cg site shares views of the same arrays.
    """
    groups = set(constraints) | {frozenset([x]) for x in range(cmap.n_fg_sites)}
    reduced = sorted(reduce_constraint_sets(groups), key=min)

    if return_ids:
        ids = np.zeros(cmap.n_fg_sites, dtype=np.int32)
        for label, members in enumerate(reduced):
            ids[sorted(members)] = label
        return ids

    n_frames = points.shape[0]
    n_types = len(reduced)
    feats = np.zeros((n_frames, cmap.n_fg_sites, n_types), dtype=np.float32)
    for label, members in enumerate(reduced):
        feats[:, sorted(members), label] = 1.0
    divs = np.zeros((n_frames, n_types, cmap.n_dim), dtype=np.float32)
    return {
        KNAME_FEATS: [feats] * cmap.n_cg_sites,
        KNAME_DIVS: [divs] * cmap.n_cg_sites,
        KNAME_NAMES: None,
    }


def multifeaturize(featurizers: List[GeneralizedFeaturizer]) -> GeneralizedFeaturizer:
    """Functional combinator: run all featurizers, zip their outputs lazily."""

    def composite(
        copoints: np.ndarray, coord_map: LinearMap, constraints: Constraints
    ) -> GeneralizedFeatures:
        return FeatZipper([f(copoints, coord_map, constraints) for f in featurizers])

    return composite


class Multifeaturize:
    """Self-describing object form of :func:`multifeaturize`."""

    def __init__(self, featurizers: Iterable[GeneralizedFeaturizer]) -> None:
        """Store the featurizers to combine."""
        self.featurizers = featurizers

    def __call__(self, *args: Any, **kwargs: Any) -> GeneralizedFeatures:
        """Evaluate every featurizer and wrap the outputs in a FeatZipper."""
        return FeatZipper([f(*args, **kwargs) for f in self.featurizers])

    def __repr__(self) -> str:
        inner = " ".join(
            f"C{i}: {f!r}" for i, f in enumerate(self.featurizers)
        )
        return f"{self.__class__.__name__}(): {inner}"

    def __str__(self) -> str:
        lines = [f"{self.__class__.__name__} instance:"]
        for i, f in enumerate(self.featurizers):
            lines.append(f"  Callable {i}:")
            lines.extend("    " + ln for ln in str(f).split("\n"))
        return "\n".join(lines)
