"""Persistent compiled-executable cache configuration.

Original TPU-side infrastructure with no reference counterpart (the
reference runs eager numpy/OSQP on host and compiles nothing).

On remote-attached accelerators, compiling a fit program through the
remote compile service costs seconds to minutes; the persistent JAX
compilation cache turns later processes' compiles into (much cheaper)
loads. This helper applies the project's cache policy in one call:

  * cache directory resolution: explicit argument, else the
    ``AGGFORCE_COMPILE_CACHE`` environment variable, else
    ``~/.cache/aggforce_tpu/jax``;
  * zero persistence thresholds — even trivial pad/select programs cost
    ~0.4 s each through a remote compile RPC, so they are worth caching.

Call it before the first jitted computation (config changes after
compilation do not retroactively cache earlier programs)::

    from aggforce_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()          # user cache dir
    enable_compile_cache("/repo/.jax_cache")   # shared, committed cache
"""

import os
from typing import Optional

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when the runtime does not
    support the cache (the call is best-effort and never raises).
    """
    import jax

    target = (
        cache_dir
        or os.environ.get("AGGFORCE_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "aggforce_tpu", "jax"
        )
    )
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return target
