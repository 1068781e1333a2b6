"""Numerical debug mode (the framework's sanitizer story).

The reference's only runtime sanitizer is the LinearMap NaN protocol
(SURVEY.md §5); here debug mode additionally arms JAX's NaN/Inf tripwires so
any non-finite value produced *inside* a jitted kernel raises at the
offending primitive instead of surfacing later as a failed fit.

Enable per block::

    from aggforce_tpu.utils.debug import debug_mode
    with debug_mode():
        project_forces(...)

or process-wide with the environment variable ``AGGFORCE_DEBUG=1``
(checked once at import of :mod:`aggforce_tpu.utils.debug`).
"""

import contextlib
import os

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = False):
    """Context manager arming jax debug_nans/debug_infs.

    ``infs`` defaults to False because large-but-legitimate intermediate
    magnitudes (force Grams) can overflow transiently in float32 paths that
    are later rescaled.
    """
    prev_nans = jax.config.jax_debug_nans
    prev_infs = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_debug_infs", prev_infs)


if os.environ.get("AGGFORCE_DEBUG") == "1":
    jax.config.update("jax_debug_nans", True)
