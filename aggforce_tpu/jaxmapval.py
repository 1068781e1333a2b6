r"""Statistical validation of force maps via random basis projections.

Behavior parity target: reference jaxmapval.py:30-401. Two correctness-
without-ground-truth checks: MSCG inner products of mapped forces against
random CG force-fields (``random_force_proj``), and force-residual shifts
relative to a flat field (``random_residual_shift``); both with random
Gaussian-of-squared-distance potentials as the basis generator
(``rsqpg_forces``).

TPU-first redesign: the reference loops n_samples (typically 1000) separate
jitted force-field evaluations; here the random offsets are drawn host-side
(preserving the generator-sequence semantics) and the force-field evaluations
are vmapped over the offset batch in one device call, with the projections
reduced on device.
"""

from typing import Callable, Iterable, List, Optional, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np
import numpy.random as r

from .agg import force_smoothness
from .ops.jaxcore import distances
from .qp.jaxfeat import clipped_gauss

ArrayT = TypeVar("ArrayT", bound=Union[jax.Array, np.ndarray])


def random_uniform_forces(
    positions: np.ndarray,
    scale: float = 1.0,
    randg: Optional[r.Generator] = None,
) -> np.ndarray:
    """Forces of a spatially-uniform random-direction force-field."""
    if randg is None:
        randg = r.default_rng()
    direction = 2 * randg.random(size=3) - 1
    direction /= np.sqrt((direction**2).sum())
    direction *= scale
    t, n, _ = positions.shape
    return np.broadcast_to(direction[None, None, :], (t, n, 3)).copy()


@jax.jit
def sq_gaussian_energies(
    positions: jax.Array, offset: float, width: float
) -> jax.Array:
    """Per-frame energies: one Gaussian over every squared pairwise distance."""
    distance_arr = distances(positions, return_matrix=True, square=True)
    return clipped_gauss(distance_arr, center=offset, width=width, clip=None).sum(
        axis=(1, 2)
    )


sq_gaussian_forces = jax.jit(
    jax.jacrev(
        lambda positions, offset, width: -sq_gaussian_energies(
            positions=positions, offset=offset, width=width
        ).sum(),
        0,
    )
)

# batched over a vector of offsets: (n_samples,) x (T, N, 3) -> (n_samples, T, N, 3)
_sq_gaussian_forces_batch = jax.jit(
    jax.vmap(
        lambda positions, offset, width: jax.jacrev(
            lambda p: -sq_gaussian_energies(p, offset, width).sum()
        )(positions),
        in_axes=(None, 0, None),
    )
)


def rsqpg_forces(
    positions: Union[jax.Array, np.ndarray],
    inner: float,
    outer: float,
    width: float,
    randg: Optional[r.Generator] = None,
    sq_args: bool = True,
) -> jax.Array:
    """Forces of one random squared-distance Gaussian force-field.

    ``randg`` draws the Gaussian offset uniformly in [inner, outer] (all
    three scale parameters squared first when ``sq_args``).
    """
    if sq_args:
        outer, inner, width = outer**2, inner**2, width**2
    if randg is None:
        randg = r.default_rng()
    offset = randg.random() * (outer - inner) + inner
    return sq_gaussian_forces(jnp.asarray(positions), offset, width)


def _draw_offsets(
    n_samples: int,
    randg: r.Generator,
    inner: float,
    outer: float,
    sq_args: bool,
) -> np.ndarray:
    if sq_args:
        inner, outer = inner**2, outer**2
    return randg.random(n_samples) * (outer - inner) + inner


@jax.jit
def _batched_mscg_ip(forces: jax.Array, funcs: jax.Array) -> jax.Array:
    """Per-sample MSCG inner products: (s,T,N,3) funcs vs (T,N,3) forces."""
    t = forces.shape[0]
    return jnp.sum(funcs * forces[None], axis=(1, 2, 3)) / t


@jax.jit
def _batched_smoothness(diff: jax.Array) -> jax.Array:
    return jnp.mean(diff**2, axis=(1, 2, 3))


def random_force_proj(
    coords: np.ndarray,
    forces: np.ndarray,
    n_samples: int = 1000,
    randg: Optional[r.Generator] = None,
    method: Callable[..., jax.Array] = rsqpg_forces,
    average: bool = True,
    batch_size: int = 128,
    **kwargs,
) -> Union[float, Iterable[float]]:
    """Project mapped forces onto ``n_samples`` random CG force-fields.

    For the default ``method`` the evaluation is vmapped over offset batches
    on device; arbitrary methods fall back to a python loop.
    """
    if randg is None:
        randg = r.default_rng()
    vals: List[float]
    if method is rsqpg_forces:
        vals = _fast_rsqpg_stats(
            coords, forces, n_samples, randg, batch_size, mode="ip", **kwargs
        )
    else:
        # generic fallback: reduce each trial field ON DEVICE when the
        # method returns device arrays — pulling a trajectory-sized array
        # to host per sample costs ~seconds each through a remote tunnel
        jf = jnp.asarray(forces)
        t = forces.shape[0]
        vals = []
        for _ in range(n_samples):
            trial = method(coords, randg=randg, **kwargs)
            if isinstance(trial, jax.Array):
                vals.append(float(jnp.sum(trial * jf) / t))
            else:
                vals.append(mscg_ip(forces, trial))
    if average:
        return sum(vals) / n_samples
    return vals


def random_residual_shift(
    coords: np.ndarray,
    forces: np.ndarray,
    n_samples: int = 1000,
    randg: Optional[r.Generator] = None,
    method: Callable[..., jax.Array] = rsqpg_forces,
    average: bool = False,
    batch_size: int = 128,
    **kwargs,
) -> Union[float, List[float]]:
    """Residual differences between random force-fields and a flat field.

    The additive mapping-noise term of the force residual cancels in the
    difference, so two maps of the same system should agree on these shifts
    even though their raw residuals differ.
    """
    if randg is None:
        randg = r.default_rng()
    fs = force_smoothness(forces)
    if method is rsqpg_forces:
        raw = _fast_rsqpg_stats(
            coords, forces, n_samples, randg, batch_size, mode="resid", **kwargs
        )
        vals = [x - fs for x in raw]
    else:
        # device-resident difference/reduction for device-array methods
        # (see random_force_proj's fallback)
        jf = jnp.asarray(forces)
        vals = []
        for _ in range(n_samples):
            trial = method(coords, randg=randg, **kwargs)
            if isinstance(trial, jax.Array):
                vals.append(float(jnp.mean(jnp.square(jf - trial))) - fs)
            else:
                vals.append(force_smoothness(forces - np.asarray(trial)) - fs)
    if average:
        return sum(vals) / n_samples
    return vals


def _fast_rsqpg_stats(
    coords: np.ndarray,
    forces: np.ndarray,
    n_samples: int,
    randg: r.Generator,
    batch_size: int,
    mode: str,
    inner: float = 0.0,
    outer: float = 1.0,
    width: float = 1.0,
    sq_args: bool = True,
) -> List[float]:
    """Vmapped evaluation of rsqpg projections/residuals over offset batches."""
    offsets = _draw_offsets(n_samples, randg, inner, outer, sq_args)
    w = width**2 if sq_args else width
    jcoords = jnp.asarray(coords)
    jforces = jnp.asarray(forces)
    # the batched jacrev keeps a (batch, T, N, N) activation live for the
    # backward pass — cap the batch so that stays within ~2 GB of HBM
    # (the reference looped one offset at a time; a fixed 128 here OOMs at
    # ~10k frames x 50 sites on a 16 GB chip)
    t, n = coords.shape[0], coords.shape[1]
    cap = max(1, (2 << 30) // max(1, t * n * n * 4))
    eff_batch = max(1, min(batch_size, cap, n_samples))
    out: List[float] = []
    for lo in range(0, n_samples, eff_batch):
        chunk = offsets[lo : lo + eff_batch]
        n_valid = len(chunk)
        if n_valid < eff_batch:
            # pad the tail so every call reuses ONE compiled executable
            # (a new batch shape would recompile through the remote
            # compile service); padded values are discarded below
            chunk = np.concatenate(
                [chunk, np.full(eff_batch - n_valid, chunk[-1])]
            )
        batch = jnp.asarray(chunk)
        trial = _sq_gaussian_forces_batch(jcoords, batch, w)
        if mode == "ip":
            vals = _batched_mscg_ip(jforces, trial)
        else:
            vals = _batched_smoothness(trial - jforces[None])
        out.extend(float(v) for v in np.asarray(vals)[:n_valid])
    return out


def mscg_ip(forces: ArrayT, funcs: ArrayT) -> float:
    """MSCG-style inner product: sum(F . G)/n_frames."""
    n_steps = forces.shape[0]
    return float((np.asarray(funcs) * np.asarray(forces)).sum() / n_steps)
