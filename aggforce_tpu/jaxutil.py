"""Reference-compatible alias module (JAX utilities).

Mirrors the upstream ``aggforce.jaxutil`` surface (reference jaxutil.py).
Canonical home: :mod:`aggforce_tpu.ops.jaxcore`.
"""
# ruff: noqa: F401
from .ops.jaxcore import abatch, distances, qp_form, trjdot
