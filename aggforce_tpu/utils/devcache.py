"""Content-keyed caches for small device-resident constants.

On remote-attached devices every ``device_put`` is its own RPC with a
~1-2 ms floor, so repeatedly fitting over one system pays more transport
re-uploading its constant matrices and scalars than it does computing.
These helpers memoize small host constants by content so repeat calls
reuse the device buffer. Keys are (shape, dtype, blake2b digest) — one
hashing pass per call, CONSTANT key memory — so sweep-scale operands
(a ~26 MB onehot at solvated geometry) cost a rehash per call but never
pin their host bytes in the cache. Never route trajectories through
here (content-hashing a trajectory per fit would dominate).

No reference counterpart: the reference's in-process CUDA devices make
uploads nanosecond-scale (reference qp/qplinear.py simply rebuilds its
operands per solve).
"""
import hashlib
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_CONST_CACHE: dict = {}  # insertion-ordered; LRU via pop+reinsert
# sized for ~5 arrays per fitted system (fusedfeat's fit operands route
# through here) x a dozen live systems. Count alone is not a safe bound:
# sweep-scale operands run tens of MB each (~26 MB onehot at solvated
# geometry), so 64 of those would pin >1.5 GB of a 16 GB chip whose
# site_block is already sized against an HBM budget — a byte cap evicts
# LRU entries first (AGGFORCE_DEVCACHE_MB overrides, default 256 MB).
_CONST_CACHE_MAX = 64
_CONST_CACHE_MAX_BYTES = (
    int(os.environ.get("AGGFORCE_DEVCACHE_MB", "256")) * 1024 * 1024
)
_SCALAR_CACHE: dict = {}
_SCALAR_CACHE_MAX = 128


def device_const(arr, dtype: Optional[np.dtype] = None) -> jax.Array:
    """Device-resident copy of a small host constant, memoized by content.

    ``dtype=None`` preserves the input array's dtype; pass a dtype only to
    request an explicit cast (callers wanting f32 say so). This keeps
    integer/bool label arrays from being silently floated.
    """
    host = np.asarray(arr) if dtype is None else np.asarray(arr, dtype=dtype)
    # digest, not raw bytes: a tobytes() key would retain a full host copy
    # of every cached constant for the cache's lifetime (tens of MB per
    # sweep-scale system) — the digest keeps content addressing at
    # constant key size
    digest = hashlib.blake2b(host.tobytes(), digest_size=16).digest()
    key = (digest, host.shape, str(host.dtype))
    hit = _CONST_CACHE.pop(key, None)
    if hit is not None:
        _CONST_CACHE[key] = hit  # reinsert = most-recently-used
        return hit
    val = jnp.asarray(host)
    _CONST_CACHE[key] = val
    while len(_CONST_CACHE) > _CONST_CACHE_MAX or (
        len(_CONST_CACHE) > 1
        and sum(v.nbytes for v in _CONST_CACHE.values())
        > _CONST_CACHE_MAX_BYTES
    ):
        del _CONST_CACHE[next(iter(_CONST_CACHE))]
    return val


def device_scalar(x, dtype=jnp.float32) -> jax.Array:
    """Memoized device scalar (fit hyperparameters re-uploaded per call)."""
    key = (float(x), np.dtype(dtype).str)
    val = _SCALAR_CACHE.get(key)
    if val is None:
        if len(_SCALAR_CACHE) >= _SCALAR_CACHE_MAX:
            _SCALAR_CACHE.clear()
        val = _SCALAR_CACHE.setdefault(key, jnp.asarray(float(x), dtype=dtype))
    return val
