"""Reference-compatible alias module (numpy utilities).

Users of the upstream package import ``aggforce.util``; this module mirrors
that surface (reference util.py) so call sites port by renaming the package
only. Canonical homes: :mod:`aggforce_tpu.ops.core` and
:mod:`aggforce_tpu.utils.funcs`.
"""
# ruff: noqa: F401
from .ops.core import distances, trjdot
from .utils.funcs import Curry, curry, flatten
