"""JAX-backed linear maps (type-preserving, jit-compatible).

Behavior parity targets: reference map/jaxlinearmap.py:14-208 (JLinearMap:
dual-fill jitted NaN evaluation, numpy-in/numpy-out and jax-in/jax-out type
preservation, bypass_nan_check escape hatch for use under jit) and
map/jaxtools.py:9-66 (jaxify_linearmap closure with flattened/perframe modes).
"""

from functools import partial
from typing import Callable, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from ..ops.jaxcore import trjdot as jtrjdot
from .core import LinearMap

ArrT = TypeVar("ArrT", NDArray, jax.Array)


@partial(jax.jit, static_argnames="nan_handling")
def _checked_trjdot(
    factor: jax.Array, points: jax.Array, nan_handling: bool
) -> Tuple[jax.Array, jax.Array]:
    """Map with NaN->0 fill plus an exact participation-masked NaN verdict.

    Semantics match the reference's dual-fill protocol (a NaN is an error
    iff it touches a nonzero map weight; map/jaxlinearmap.py:14-39) but the
    verdict is computed directly — ``any(isnan(points) & participating)`` —
    instead of comparing two differently-filled matmuls. The comparison
    form is unsound on TPU: XLA may schedule the two matmuls with
    different reduction orders, and at thousands-of-atoms contraction
    sizes the f32 order noise exceeds any fixed atol, flagging phantom
    NaNs on perfectly finite data (observed at N=3000).
    """
    if nan_handling:
        # NOT nan_to_num: that would also squash +/-inf to +/-3.4e38,
        # silently converting infinite inputs into large finite garbage
        # (the numpy LinearMap path propagates inf; only NaN is filled)
        result = jtrjdot(jnp.where(jnp.isnan(points), 0.0, points), factor)
        participating = jnp.any(factor != 0.0, axis=0)  # (n_fg,)
        bad = jnp.any(jnp.isnan(points) & participating[None, :, None])
        return result, bad
    result = jtrjdot(points, factor)
    return result, jnp.asarray(False)


@partial(jax.jit, static_argnames=("nh_c", "nh_f"))
def _dual_checked_trjdot(
    cmat: jax.Array,
    fmat: jax.Array,
    coords: jax.Array,
    forces: jax.Array,
    nh_c: bool,
    nh_f: bool,
):
    """Both maps of a SeperableTMap in ONE program with both NaN verdicts.

    Applying the coordinate and force maps separately costs one blocking
    host sync PER MAP for the NaN verdict (each ``bool(bad)`` is a D2H
    round-trip — 10-45 ms apiece on remote-attached devices). This kernel
    emits (mapped_coords, mapped_forces, bad_c, bad_f) together so the
    caller fetches both verdicts in one transfer.
    """
    mc, bad_c = _checked_trjdot(cmat, coords, nh_c)
    mf, bad_f = _checked_trjdot(fmat, forces, nh_f)
    return mc, mf, bad_c, bad_f


def fused_separable_apply(coord_map, force_map, coords, forces):
    """One-program SeperableTMap application for two JLinearMaps.

    Returns (mapped_coords, mapped_forces) with exactly the raise/type
    semantics of applying each map individually, or None when either map
    is not a JLinearMap (callers fall back to the piecewise path).
    """
    if not isinstance(coord_map, JLinearMap) or not isinstance(
        force_map, JLinearMap
    ):
        return None
    # track numpy-ness PER ARRAY: mixed inputs (numpy coords + device
    # forces) must come back mixed, exactly as the piecewise per-map path
    # would return them — converting both from coords alone would silently
    # fetch device forces to host
    numpy_c = isinstance(coords, np.ndarray)
    numpy_f = isinstance(forces, np.ndarray)
    mc, mf, bad_c, bad_f = _dual_checked_trjdot(
        coord_map._jax_standard_matrix,
        force_map._jax_standard_matrix,
        jnp.asarray(coords) if numpy_c else coords,
        jnp.asarray(forces) if numpy_f else forces,
        bool(coord_map.handle_nans),
        bool(force_map.handle_nans),
    )
    raise_c = coord_map.handle_nans and not coord_map.bypass_nan_check
    raise_f = force_map.handle_nans and not force_map.bypass_nan_check
    if raise_c or raise_f:
        bad_c_v, bad_f_v = jax.device_get((bad_c, bad_f))  # ONE round-trip
        if (raise_c and bool(bad_c_v)) or (raise_f and bool(bad_f_v)):
            raise ValueError(
                "NaN handling is on and multiplication tried to use a NaN "
                "value. Check the input array and standard_matrix."
            )
    return (
        np.asarray(mc) if numpy_c else mc,
        np.asarray(mf) if numpy_f else mf,
    )


class JLinearMap(LinearMap):
    """LinearMap whose application runs as a jitted XLA kernel.

    Calls preserve the input array library: numpy in -> numpy out, jax in ->
    jax out. With ``bypass_nan_check=True`` the (host-synchronizing) NaN
    consistency verdict is skipped, making the map safe to trace under jit
    and to differentiate through.
    """

    def __init__(self, *args, bypass_nan_check: bool = False, **kwargs) -> None:
        """Initialize; extra args forwarded to LinearMap."""
        super().__init__(*args, **kwargs)
        self.bypass_nan_check = bypass_nan_check
        # content-memoized: noised-map builders construct a fresh JLinearMap
        # per fit, and each eager upload of the same matrix is a device_put
        # RPC on remote-attached devices (utils/devcache.py)
        from ..utils.devcache import device_const

        host_mat = np.asarray(self.standard_matrix)
        self._jax_standard_matrix = device_const(host_mat, dtype=host_mat.dtype)

    @property
    def jax_standard_matrix(self) -> jax.Array:
        """standard_matrix as a device array."""
        return self._jax_standard_matrix

    def __call__(self, points: Union[NDArray, jax.Array]) -> Union[NDArray, jax.Array]:
        """Apply the map; input library and dtype discipline preserved."""
        numpy_input = isinstance(points, np.ndarray)
        jpoints = jnp.asarray(points) if numpy_input else points
        result, bad = _checked_trjdot(
            factor=self._jax_standard_matrix,
            points=jpoints,
            nan_handling=bool(self.handle_nans),
        )
        if self.handle_nans and not self.bypass_nan_check:
            if bool(bad):
                raise ValueError(
                    "NaN handling is on and multiplication tried to use a NaN "
                    "value. Check the input array and standard_matrix."
                )
        return np.asarray(result) if numpy_input else result

    # flat_call is inherited: LinearMap.flat_call dispatches through
    # self(...), which this class overrides, so the jitted type-preserving
    # behavior carries over.

    def _like(self, matrix: np.ndarray) -> "JLinearMap":
        return JLinearMap(
            mapping=matrix,
            bypass_nan_check=self.bypass_nan_check,
            handle_nans=self.handle_nans,
            nan_check_threshold=self.nan_check_threshold,
        )

    @property
    def T(self) -> "JLinearMap":
        """Map defined by the transposed standard matrix."""
        return self._like(self.standard_matrix.T)

    def __matmul__(self, lm: LinearMap, /) -> "JLinearMap":
        """Compose standard matrices."""
        return self._like(self.standard_matrix @ lm.standard_matrix)

    def __rmul__(self, c: float, /) -> "JLinearMap":
        """Scale the standard matrix."""
        return self._like(c * self.standard_matrix)

    def __add__(self, lm: LinearMap, /) -> "JLinearMap":
        """Add standard matrices."""
        return self._like(self.standard_matrix + lm.standard_matrix)

    def astype(self, *args, **kwargs) -> "JLinearMap":
        """Return an instance whose matrix is cast via numpy astype."""
        return self.__class__(
            mapping=self.standard_matrix.astype(*args, **kwargs),
            bypass_nan_check=self.bypass_nan_check,
            handle_nans=self.handle_nans,
            nan_check_threshold=self.nan_check_threshold,
        )

    @classmethod
    def from_linearmap(
        cls, lm: LinearMap, /, bypass_nan_check: bool = False
    ) -> "JLinearMap":
        """Wrap an existing LinearMap."""
        return cls(
            mapping=lm.standard_matrix,
            bypass_nan_check=bypass_nan_check,
            handle_nans=lm.handle_nans,
        )

    def to_linearmap(self) -> LinearMap:
        """Drop back to the numpy LinearMap."""
        return LinearMap(mapping=self.standard_matrix, handle_nans=self.handle_nans)


def jaxify_linearmap(
    lm: LinearMap,
    flattened: bool = True,
    n_dim: int = 3,
) -> Callable[[jax.Array], jax.Array]:
    """Build a pure-jax closure applying ``lm``'s standard matrix.

    With ``flattened=True`` the closure maps (n_frames, n_sites*n_dim) arrays
    (reshaping internally); otherwise it maps rank-3 trajectory arrays. The
    returned callable accepts ``perframe=True`` to act on single frames
    (useful inside vmap).
    """
    matrix = jnp.asarray(lm.standard_matrix)

    def wrapped(mat: jax.Array, perframe: bool = False) -> jax.Array:
        if perframe:
            mat = mat[None, ...]
        if flattened:
            mat = mat.reshape(mat.shape[0], mat.shape[1] // n_dim, n_dim)
        result = jtrjdot(mat, matrix)
        if flattened:
            result = result.reshape(result.shape[0], result.shape[1] * result.shape[2])
        if perframe:
            result = result[0]
        return result

    return wrapped
