"""Gaussian conditional-noise augmenters (numpy and JAX).

Behavior parity targets: reference trajectory/simplegausstraj.py:13-137
(SimpleCondNormal: isotropic noise with closed-form log-gradients) and
trajectory/jaxgausstraj.py:99-402 (JCondNormal: g(y|x) = N(y; premap(x), E)
with optional source_postmap, jax sampling, astype/downcast helpers).

TPU-first deviations from the reference implementation (same math, different
path): the reference autodiffs the dense multivariate-normal logpdf per frame
(vmap of grad of logpdf, including a useless logdet term) and samples via
``jax.random.multivariate_normal`` with an (D, D) covariance — O(D^3)/O(D^2)
work for what is almost always a *diagonal* covariance. Here:

  * scalar covariance uses the closed form  grad_y log g = -(y - Ax)/var  and
    samples y = Ax + sqrt(var) * eps with eps ~ N(0, I) — O(D) per frame, no
    covariance matrix ever materialized on the hot path;
  * grad_x log g = A^T (y - Ax)/var is computed with one VJP through the
    premap callable (exact for the linear premaps used everywhere), instead of
    differentiating the full logpdf;
  * full-matrix covariance keeps a Cholesky-based path for parity.

PRNG is explicit jax key-threading; the host-visible attribute ``_rkey``
advances per sample call, mirroring the reference's stateful behavior.
"""

from functools import partial
from typing import Callable, Final, Optional, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp
import jax.random as jrandom
import numpy as np
from numpy.typing import DTypeLike

from ..ops.jaxcore import trjdot as jtrjdot_g
from .augment import Augmenter

_UNSET: Final = object()

A = TypeVar("A")


def _ident(x: A, /) -> A:
    """Identity map."""
    return x


def _is_close_to_ident(c: Callable) -> bool:
    """Best-effort check that a callable is the identity."""
    from ..map import LinearMap  # local import avoids a circular dependency

    if isinstance(c, LinearMap):
        return c.close_to_identity()
    return c is _ident


def _linear_flatcall_matrix(
    premap: Callable,
) -> Optional[Tuple[jax.Array, bool]]:
    """(site matrix, NaN-fill flag) of a bound ``LinearMap.flat_call``.

    Noised-map builders pass ``JLinearMap(...).flat_call`` as the premap
    (e.g. :func:`aggforce_tpu.qp.jgauss.joptgauss_map`). As a *callable* that
    premap would have to be a static jit argument — and every fit constructs
    a fresh bound method, so each fit would retrace and re-lower the
    augmentation program (through the remote compile service that is
    hundreds of ms per call even on a cache hit). Detecting the underlying
    matrix lets the kernels take it as a traced operand instead: one
    compiled program serves every linear premap of matching shape.

    The fill flag carries the map's ``handle_nans`` semantics into the
    kernels: a NaN-handling map applies to NaN->0-filled input (with
    ``bypass_nan_check`` merely skipping the raise), so the matrix path
    must fill identically or NaN coords would propagate where the callable
    path produced finite output. Returns None when the map would RAISE on
    NaNs (checking without bypass) — that verdict is a host-side bool the
    kernels cannot emulate, so the legacy path keeps raising.
    """
    from ..map import LinearMap  # local import avoids a circular dependency

    owner = getattr(premap, "__self__", None)
    if owner is None or not isinstance(owner, LinearMap):
        return None
    if getattr(premap, "__func__", None) is not LinearMap.flat_call:
        return None
    if owner.handle_nans and not getattr(owner, "bypass_nan_check", False):
        return None
    dev = getattr(owner, "_jax_standard_matrix", None)  # JLinearMap: reuse
    if dev is None:
        from ..utils.devcache import device_const

        host = np.asarray(owner.standard_matrix)
        dev = device_const(host, dtype=host.dtype)
    return dev, bool(owner.handle_nans)


def _linear_map_matrix(postmap: Callable) -> Optional[Tuple[jax.Array, bool]]:
    """(site matrix, NaN-fill flag) of a LinearMap source_postmap."""
    from ..map import LinearMap

    if not isinstance(postmap, LinearMap):
        return None
    if postmap.handle_nans and not getattr(postmap, "bypass_nan_check", False):
        return None
    dev = getattr(postmap, "_jax_standard_matrix", None)  # JLinearMap: reuse
    mat = dev if dev is not None else jnp.asarray(postmap.standard_matrix)
    return mat, bool(postmap.handle_nans)


class SimpleCondNormal(Augmenter):
    """Isotropic Gaussian noiser with closed-form log-gradients (numpy)."""

    def __init__(
        self,
        var: float,
        seed: Optional[int] = None,
        dtype: Union[DTypeLike, object] = _UNSET,
    ) -> None:
        """Initialize with noise variance ``var`` and an optional RNG seed."""
        self.var = var
        self._rng = np.random.default_rng(seed)
        if dtype is _UNSET:
            self.dtype: np.dtype = np.dtype(np.float32)
        else:
            self.dtype = np.dtype(dtype)  # type: ignore[arg-type]

    def sample(self, source: np.ndarray) -> np.ndarray:
        """Return source + sqrt(var) * standard normal noise."""
        noise = np.sqrt(self.var) * self._rng.standard_normal(
            source.shape, dtype=self.dtype
        )
        return (source + noise).astype(self.dtype, copy=False)

    def log_gradient(
        self, source: np.ndarray, generated: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Closed-form gradients: (+(y-x)/var, -(y-x)/var)."""
        d_gen = (-(generated - source) / self.var).astype(self.dtype, copy=False)
        return -d_gen, d_gen

    def astype(self, dtype: DTypeLike, *args, **kwargs) -> "SimpleCondNormal":  # noqa: ARG002
        """Return an instance emitting the requested dtype."""
        return self.__class__(var=self.var, dtype=dtype)


@partial(jax.jit, static_argnames=("premap",))
def _scalar_lgrads(
    flat_source: jax.Array,
    flat_generated: jax.Array,
    var: jax.Array,
    premap: Callable[[jax.Array], jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form log-gradients for diagonal covariance via one VJP."""
    means, vjp = jax.vjp(premap, flat_source)
    resid = (flat_generated - means) / var
    (source_grad,) = vjp(resid)
    return source_grad, -resid


@partial(jax.jit, static_argnames=("premap",))
def _matrix_lgrads(
    flat_source: jax.Array,
    flat_generated: jax.Array,
    chol: jax.Array,
    premap: Callable[[jax.Array], jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Log-gradients for full covariance: solve E w = (y - Ax) via Cholesky."""
    means, vjp = jax.vjp(premap, flat_source)
    resid = flat_generated - means
    w = jax.scipy.linalg.cho_solve((chol, True), resid.T).T
    (source_grad,) = vjp(w)
    return source_grad, -w


@partial(jax.jit, static_argnames=("premap",))
def _scalar_sample(
    key: jax.Array,
    flat_source: jax.Array,
    var: jax.Array,
    premap: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """Sample y = premap(x) + sqrt(var) eps in one fused kernel."""
    means = premap(flat_source)
    eps = jrandom.normal(key, means.shape, dtype=means.dtype)
    return means + jnp.sqrt(var) * eps


def _apply_pmat(coords: jax.Array, pmat: Optional[jax.Array], pfill: bool):
    """Premap application matching LinearMap NaN-fill semantics.

    A handle_nans map acts on NaN->0-filled input (the fill happens even
    under bypass_nan_check — bypass only skips the raise); its VJP is
    therefore zero at NaN input positions. Returns (means, vjp_mask) where
    vjp_mask is None when no masking is needed.
    """
    if pmat is None:
        return coords, None
    if pfill:
        # fill ONLY NaN (nan_to_num would squash inf to finite)
        filled = jnp.where(jnp.isnan(coords), 0.0, coords)
        return jtrjdot_g(filled, pmat), jnp.isnan(coords)
    return jtrjdot_g(coords, pmat), None


@partial(jax.jit, static_argnames=("pfill",))
def _mat_sample(
    key: jax.Array,
    coords: jax.Array,  # (T, N, 3)
    var: jax.Array,
    pmat: Optional[jax.Array],  # (C, N) site matrix, or None = identity
    pfill: bool = False,
) -> jax.Array:
    """Scalar-cov sampling with the (linear) premap as a traced operand.

    ``pmat=None`` (an empty pytree leaf, part of the jit cache key's
    structure) is the identity premap. Noise is drawn in the flattened
    layout so draws are bit-identical to the legacy flat kernels.
    """
    means, _ = _apply_pmat(coords, pmat, pfill)
    t, c, d = means.shape
    eps = jrandom.normal(key, (t, c * d), dtype=means.dtype).reshape(t, c, d)
    return means + jnp.sqrt(var) * eps


@partial(jax.jit, static_argnames=("pfill",))
def _mat_lgrads(
    coords: jax.Array,
    generated: jax.Array,
    var: jax.Array,
    pmat: Optional[jax.Array],
    pfill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form scalar-cov log-gradients, linear premap as operand.

    grad_y log g = -(y - Mx)/var; grad_x log g = M^T (y - Mx)/var (the VJP
    of a linear premap is its transpose, zeroed at filled NaN inputs).
    """
    means, mask = _apply_pmat(coords, pmat, pfill)
    resid = (generated - means) / var
    src = resid if pmat is None else jtrjdot_g(resid, pmat.T)
    if mask is not None:
        src = jnp.where(mask, 0.0, src)
    return src, -resid


@partial(jax.jit, static_argnames=("pfill",))
def _mat_matrix_lgrads(
    coords: jax.Array,
    generated: jax.Array,
    chol: jax.Array,
    pmat: Optional[jax.Array],
    pfill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full-covariance log-gradients, linear premap as operand."""
    means, mask = _apply_pmat(coords, pmat, pfill)
    t, c, d = means.shape
    resid = (generated - means).reshape(t, c * d)
    w = jax.scipy.linalg.cho_solve((chol, True), resid.T).T
    w3 = w.reshape(t, c, d)
    src = w3 if pmat is None else jtrjdot_g(w3, pmat.T)
    if mask is not None:
        src = jnp.where(mask, 0.0, src)
    return src, -w3


def _fused_augment_math(
    key: jax.Array,
    coords: jax.Array,  # (T, N, 3)
    forces: jax.Array,  # (T, N, 3)
    var: jax.Array,
    kbt: jax.Array,
    pmat: Optional[jax.Array],
    postmat: Optional[jax.Array],
    pfill: bool = False,
    postfill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Traceable augmentation math shared by the fused kernels."""
    means, mask = _apply_pmat(coords, pmat, pfill)
    t, c, d = means.shape
    eps = jrandom.normal(key, (t, c * d), dtype=means.dtype).reshape(t, c, d)
    sd = jnp.sqrt(var)
    aug_coords = means + sd * eps
    resid = (sd / var) * eps  # (y - mean)/var
    src = resid if pmat is None else jtrjdot_g(resid, pmat.T)
    if mask is not None:
        src = jnp.where(mask, 0.0, src)
    if postmat is not None:
        if postfill:
            src = jnp.where(jnp.isnan(src), 0.0, src)
        src = jtrjdot_g(src, postmat)
    full_coords = jnp.concatenate([coords, aug_coords], axis=1)
    full_forces = jnp.concatenate([forces + kbt * src, -kbt * resid], axis=1)
    return full_coords, full_forces


@partial(jax.jit, static_argnames=("pfill", "postfill"))
def _mat_fused_augment(
    key: jax.Array,
    coords: jax.Array,  # (T, N, 3)
    forces: jax.Array,  # (T, N, 3)
    var: jax.Array,
    kbt: jax.Array,
    pmat: Optional[jax.Array],  # (C, N) or None = identity premap
    postmat: Optional[jax.Array],  # (N', N) or None = identity postmap
    pfill: bool = False,
    postfill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-dispatch augmentation with linear pre/post maps as operands.

    The piecewise path (sample, log_gradient, two concatenations, the
    thermal force arithmetic) dispatches ~6 device programs per
    augmentation; on remote-attached devices each dispatch carries
    transport latency, so noised-map fits pay several round-trips before
    the QP even starts. This kernel emits the full AugmentedTrajectory
    arrays ([x | y], [f + kbt*grad_x log g | kbt*grad_y log g]) in one
    program. The premap enters as a traced matrix, so fresh map objects
    reuse ONE compiled executable (a bound-method premap would be a new
    static key every fit — each ``joptgauss_map`` call then re-traces and
    re-lowers this program through the remote compile service). Covers the
    staged post-augmenters too via ``postmat``.
    """
    return _fused_augment_math(
        key, coords, forces, var, kbt, pmat, postmat, pfill, postfill
    )


@partial(jax.jit, static_argnames=("fill_c", "fill_f", "pfill", "postfill"))
def _mat_fused_apply(
    key: jax.Array,
    coords: jax.Array,  # (T, N, 3)
    forces: jax.Array,  # (T, N, 3)
    var: jax.Array,
    kbt: jax.Array,
    pmat: Optional[jax.Array],
    postmat: Optional[jax.Array],
    cmat: jax.Array,  # (C_out, N_aug) coordinate map over the extended system
    fmat: jax.Array,  # (C_out, N_aug) force map over the extended system
    fill_c: bool,
    fill_f: bool,
    pfill: bool = False,
    postfill: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Whole noised-map application in ONE program, one host sync.

    The legacy apply path (AugmentedTMap: fused augmentation, then a
    SeperableTMap applying coordinate and force maps) dispatches three
    programs AND synchronizes the host per NaN verdict — two blocking
    round-trips per application on remote-attached devices. This kernel
    augments, maps, and computes both participation-masked NaN verdicts
    (the semantics of map/jaxlinear._checked_trjdot) in one executable;
    the caller fetches (mapped_coords, mapped_forces, bad_c, bad_f)
    together. ``fill_c``/``fill_f`` mirror each map's ``handle_nans``:
    when False, NaNs propagate into the mapped output exactly like the
    unchecked legacy path.
    """
    full_c, full_f = _fused_augment_math(
        key, coords, forces, var, kbt, pmat, postmat, pfill, postfill
    )
    if fill_c:
        part = jnp.any(cmat != 0.0, axis=0)
        bad_c = jnp.any(jnp.isnan(full_c) & part[None, :, None])
        mc = jtrjdot_g(jnp.where(jnp.isnan(full_c), 0.0, full_c), cmat)
    else:
        bad_c = jnp.asarray(False)
        mc = jtrjdot_g(full_c, cmat)
    if fill_f:
        part = jnp.any(fmat != 0.0, axis=0)
        bad_f = jnp.any(jnp.isnan(full_f) & part[None, :, None])
        mf = jtrjdot_g(jnp.where(jnp.isnan(full_f), 0.0, full_f), fmat)
    else:
        bad_f = jnp.asarray(False)
        mf = jtrjdot_g(full_f, fmat)
    return mc, mf, bad_c, bad_f


class JCondNormal(Augmenter):
    r"""Gaussian augmenter g(y|x) = N(y; premap(x), E) on JAX arrays.

    ``premap`` consumes/produces *flattened* (n_frames, n_sites*n_dim) arrays
    (typically a JLinearMap.flat_call); its output dimension fixes the number
    of virtual particles. ``source_postmap`` is applied to the unflattened
    source log-gradient — used by staged maps to express already-coarse-grained
    force corrections.

    Public methods are type-preserving: numpy in → numpy out (reference
    behavior), jax in → jax out. The latter keeps whole noised-map pipelines
    device-resident — trajectory-sized arrays never cross the host boundary
    between sampling, log-gradient evaluation, and the downstream fit.
    """

    n_dim: Final = 3

    def __init__(
        self,
        cov: Union[float, np.ndarray],
        premap: Optional[Callable[[jax.Array], jax.Array]] = None,
        source_postmap: Optional[Callable[[jax.Array], jax.Array]] = None,
        seed: Optional[int] = None,
        dtype: Union[DTypeLike, object] = _UNSET,
    ) -> None:
        """Initialize.

        ``cov`` may be a positive scalar (isotropic diagonal covariance; fast
        closed-form path) or a full (D, D) matrix. With a scalar, the ``cov``
        attribute stays None until the first ``sample`` call reveals D,
        mirroring the reference's deferred construction.
        """
        self.premap = _ident if premap is None else premap
        self.source_postmap = _ident if source_postmap is None else source_postmap
        # linear pre/post maps become traced operands of shared compiled
        # programs (fresh bound-method callables would be fresh static jit
        # keys — one retrace + remote lower per constructed map object);
        # the fill flags carry each map's handle_nans semantics
        pm = _linear_flatcall_matrix(self.premap)
        self._premap_mat, self._premap_fill = pm if pm else (None, False)
        qm = _linear_map_matrix(self.source_postmap)
        self._postmap_mat, self._postmap_fill = qm if qm else (None, False)
        if seed is None:
            seed = int(np.random.default_rng().integers(0, int(1e6)))
        self._rkey, _ = jrandom.split(jrandom.PRNGKey(seed))
        self._cov = cov
        self._chol: Optional[jax.Array] = None
        if isinstance(cov, (np.ndarray, jax.Array)) and np.ndim(cov) == 2:
            self.cov: Optional[jax.Array] = jnp.asarray(cov)
        else:
            self.cov = None
        if dtype is _UNSET:
            if isinstance(cov, np.ndarray):
                self.dtype = cov.dtype
            else:
                self.dtype = np.dtype(np.float32)
        else:
            self.dtype = np.dtype(dtype)  # type: ignore[arg-type]

    @property
    def _scalar_cov(self) -> bool:
        return not (isinstance(self._cov, (np.ndarray, jax.Array)) and np.ndim(self._cov) == 2)

    @property
    def _jdtype(self) -> np.dtype:
        """Device compute dtype: honors float64 ONLY when x64 is enabled.

        Without ``jax_enable_x64`` a float64 request cannot be honored on
        device; rather than silently tracing every op through jax's
        truncation warning, all device arithmetic runs in float32 and
        host-returned arrays are cast to the requested dtype. Deviation
        from the reference (numpy, true float64) documented in PARITY.md;
        enable x64 for end-to-end float64.
        """
        if np.dtype(self.dtype) == np.float64 and not jax.config.jax_enable_x64:
            return np.dtype(np.float32)
        return np.dtype(self.dtype)

    def sample(self, source: np.ndarray) -> np.ndarray:
        """Draw one set of virtual coordinates conditioned on ``source``.

        Type-preserving: jax input stays on device; numpy input returns numpy
        (reference trajectory/jaxgausstraj.py:286-329 always returned host
        arrays — a per-call trajectory-sized transfer this path avoids).
        """
        device_in = isinstance(source, jax.Array)
        src = jnp.asarray(source, dtype=self._jdtype)
        use_mat = self.premap is _ident or self._premap_mat is not None
        self._rkey, subkey = jrandom.split(self._rkey)
        if self._scalar_cov:
            from ..utils.devcache import device_scalar

            var = device_scalar(self._cov, dtype=self._jdtype)
            if use_mat:
                if src.ndim != 3 or src.shape[-1] != self.n_dim:
                    raise ValueError(
                        f"Expected (*, *, {self.n_dim}) array; got {src.shape}."
                    )
                unflat = _mat_sample(
                    subkey, src, var, self._premap_mat,
                    pfill=self._premap_fill,
                )
            else:
                out = _scalar_sample(subkey, self._flatten(src), var, self.premap)
                unflat = self._unflatten(out)
            if self.cov is None:
                # materialize the diagonal covariance attribute lazily for
                # API parity; the hot path never uses it.
                d = unflat.shape[1] * unflat.shape[2]
                self.cov = jnp.diag(jnp.full((d,), self._cov, dtype=self._jdtype))
        else:
            flat = self._flatten(src)
            means = self.premap(flat)
            chol = self._cholesky()
            eps = jrandom.normal(subkey, means.shape, dtype=means.dtype)
            out = means + eps @ chol.T
            unflat = self._unflatten(out)
        if device_in:
            return unflat.astype(self._jdtype)
        return np.asarray(unflat, dtype=self.dtype)

    def log_gradient(
        self, source: np.ndarray, generated: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (grad_x log g, grad_y log g); type-preserving like sample."""
        device_in = isinstance(source, jax.Array) or isinstance(
            generated, jax.Array
        )
        src3 = jnp.asarray(source, dtype=self._jdtype)
        gen3 = jnp.asarray(generated, dtype=self._jdtype)
        if self.cov is None and self._scalar_cov:
            raise ValueError(
                "Cannot generate log gradients without cov. Either specify "
                "cov at init, or call sample prior to log_gradient."
            )
        use_mat = self.premap is _ident or self._premap_mat is not None
        rank3 = (
            src3.ndim == 3
            and gen3.ndim == 3
            and src3.shape[-1] == self.n_dim
            and gen3.shape[-1] == self.n_dim
        )  # anything else falls to the legacy path, which validates/raises
        if use_mat and rank3:
            if self._scalar_cov:
                from ..utils.devcache import device_scalar

                src_grad3, gen_grad3 = _mat_lgrads(
                    src3,
                    gen3,
                    device_scalar(self._cov, dtype=self._jdtype),
                    self._premap_mat,
                    pfill=self._premap_fill,
                )
            else:
                src_grad3, gen_grad3 = _mat_matrix_lgrads(
                    src3, gen3, self._cholesky(), self._premap_mat,
                    pfill=self._premap_fill,
                )
            source_lgrad, variate_lgrad = src_grad3, gen_grad3
        else:
            flat_source = self._flatten(src3)
            flat_generated = self._flatten(gen3)
            if self._scalar_cov:
                from ..utils.devcache import device_scalar

                src_grad, gen_grad = _scalar_lgrads(
                    flat_source,
                    flat_generated,
                    device_scalar(self._cov, dtype=self._jdtype),
                    self.premap,
                )
            else:
                src_grad, gen_grad = _matrix_lgrads(
                    flat_source, flat_generated, self._cholesky(), self.premap
                )
            source_lgrad = self._unflatten(src_grad)
            variate_lgrad = self._unflatten(gen_grad)
        post = self.source_postmap(source_lgrad)
        if device_in:
            return (
                jnp.asarray(post, dtype=self._jdtype),
                variate_lgrad.astype(self._jdtype),
            )
        return (
            np.asarray(post, dtype=self.dtype),
            np.asarray(variate_lgrad, dtype=self.dtype),
        )

    def fused_augment(
        self, coords, forces, kbt: float
    ) -> Optional[Tuple[jax.Array, jax.Array]]:
        """One-dispatch augmentation (sample + log-gradients + assembly).

        Returns the extended (coords, forces) pair for device (jax) inputs
        with scalar covariance and identity source_postmap — the
        ``joptgauss_map`` hot path — or None when the piecewise path must
        be used. Draw-for-draw identical to sample() + log_gradient()
        (same single PRNG split, same noise realization).
        """
        if not self._scalar_cov:
            return None
        if not isinstance(coords, jax.Array) or not isinstance(
            forces, jax.Array
        ):
            return None
        premap_ok = self.premap is _ident or self._premap_mat is not None
        postmap_ok = (
            self.source_postmap is _ident or self._postmap_mat is not None
        )
        if not premap_ok or not postmap_ok:
            # arbitrary callables stay on the piecewise path; a static-arg
            # fused variant would retrace per fresh callable (see
            # _linear_flatcall_matrix)
            return None
        self._rkey, subkey = jrandom.split(self._rkey)
        full_coords, full_forces = _mat_fused_augment(
            subkey,
            coords.astype(self._jdtype),
            forces.astype(self._jdtype),
            jnp.asarray(self._cov, dtype=self._jdtype),
            jnp.asarray(kbt, dtype=self._jdtype),
            self._premap_mat,
            self._postmap_mat,
            pfill=self._premap_fill,
            postfill=self._postmap_fill,
        )
        if self.cov is None:
            d = (full_coords.shape[1] - coords.shape[1]) * self.n_dim
            self.cov = jnp.diag(jnp.full((d,), self._cov, dtype=self._jdtype))
        return full_coords, full_forces

    def fused_map_apply(
        self, coords, forces, kbt: float, coord_map, force_map
    ) -> Optional[Tuple[jax.Array, jax.Array]]:
        """Augment-then-map (the whole AugmentedTMap application) in ONE
        program with ONE host sync.

        ``coord_map``/``force_map`` are the (Linear) maps over the extended
        [real | virtual] system. Returns (mapped_coords, mapped_forces), or
        None when some component cannot enter a fused program (host
        arrays, matrix covariance, callable pre/post maps, non-linear
        maps) — callers then use the piecewise path. NaN semantics match
        applying the maps individually: handle_nans maps fill NaN->0 and
        raise on participating NaNs (verdicts are computed in-program and
        fetched with the outputs, instead of one blocking sync per map).
        """
        from ..map import LinearMap  # local import avoids a circular dependency

        if not self._scalar_cov:
            return None
        if not isinstance(coords, jax.Array) or not isinstance(
            forces, jax.Array
        ):
            return None
        if not (self.premap is _ident or self._premap_mat is not None):
            return None
        if not (
            self.source_postmap is _ident or self._postmap_mat is not None
        ):
            return None
        if not isinstance(coord_map, LinearMap) or not isinstance(
            force_map, LinearMap
        ):
            return None

        def _mat(m):
            dev = getattr(m, "_jax_standard_matrix", None)
            return dev if dev is not None else jnp.asarray(m.standard_matrix)

        fill_c = bool(coord_map.handle_nans)
        fill_f = bool(force_map.handle_nans)
        raise_c = fill_c and not getattr(coord_map, "bypass_nan_check", False)
        raise_f = fill_f and not getattr(force_map, "bypass_nan_check", False)
        self._rkey, subkey = jrandom.split(self._rkey)
        mc, mf, bad_c, bad_f = _mat_fused_apply(
            subkey,
            coords.astype(self._jdtype),
            forces.astype(self._jdtype),
            jnp.asarray(self._cov, dtype=self._jdtype),
            jnp.asarray(kbt, dtype=self._jdtype),
            self._premap_mat,
            self._postmap_mat,
            _mat(coord_map),
            _mat(force_map),
            fill_c,
            fill_f,
            pfill=self._premap_fill,
            postfill=self._postmap_fill,
        )
        if self.cov is None:
            c = (
                self._premap_mat.shape[0]
                if self._premap_mat is not None
                else coords.shape[1]
            )
            self.cov = jnp.diag(
                jnp.full((c * self.n_dim,), self._cov, dtype=self._jdtype)
            )
        if raise_c or raise_f:
            # both verdicts in ONE host round-trip (each bool() would block
            # on its own transfer — 10-45 ms apiece through a remote tunnel)
            bad_c_v, bad_f_v = jax.device_get((bad_c, bad_f))
            if (raise_c and bool(bad_c_v)) or (raise_f and bool(bad_f_v)):
                raise ValueError(
                    "NaN handling is on and multiplication tried to use a "
                    "NaN value. Check the input array and standard_matrix."
                )
        return mc, mf

    def _cholesky(self) -> jax.Array:
        if self._chol is None:
            self._chol = jnp.linalg.cholesky(
                jnp.asarray(self._cov, dtype=self._jdtype)
            )
        return self._chol

    def _flatten(self, array: jax.Array) -> jax.Array:
        """(n_frames, n_sites, n_dim) -> (n_frames, n_sites*n_dim)."""
        if array.ndim != 3 or array.shape[-1] != self.n_dim:
            raise ValueError(f"Expected (*, *, {self.n_dim}) array; got {array.shape}.")
        return array.reshape(array.shape[0], array.shape[1] * array.shape[2])

    def _unflatten(self, array: jax.Array) -> jax.Array:
        """Inverse of :meth:`_flatten`."""
        if array.ndim != 2:
            raise ValueError(f"Expected rank-2 array; got {array.shape}.")
        return array.reshape(array.shape[0], array.shape[1] // self.n_dim, self.n_dim)

    def astype(self, dtype: DTypeLike, *args, **kwargs) -> "JCondNormal":  # noqa: ARG002
        """Return an instance emitting the requested dtype (same RNG state)."""
        new = self.__class__(
            cov=self._cov,
            premap=None if self.premap is _ident else self.premap,
            source_postmap=(
                None if self.source_postmap is _ident else self.source_postmap
            ),
            seed=None,
            dtype=dtype,
        )
        new._rkey = self._rkey
        return new

    def to_SimpleCondNormal(self) -> SimpleCondNormal:
        """Downcast to the numpy augmenter (identity maps, scalar cov only)."""
        if not isinstance(self._cov, float):
            raise ValueError(
                "Only can convert to SimpleCondNormal for scalar-specified "
                "covariance."
            )
        if not _is_close_to_ident(self.premap):
            raise ValueError("Only can convert to SimpleCondNormal for identity premap.")
        if not _is_close_to_ident(self.source_postmap):
            raise ValueError(
                "Only can convert to SimpleCondNormal for identity source_postmap."
            )
        return SimpleCondNormal(var=self._cov, dtype=self._jdtype)
