"""Array kernels: trajectory matmuls, distances, batching, QP solves."""
# ruff: noqa: F401
from .core import trjdot, distances, qp_form, abatch
from . import jaxcore
from .eqp import (
    eqp_solve,
    eqp_solve_auglag,
    eqp_solve_host,
    batched_eqp_solve,
    batched_eqp_solve_auglag,
    batched_eqp_solve_shared,
)
