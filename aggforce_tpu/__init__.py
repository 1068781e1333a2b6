"""aggforce_tpu: TPU-native optimal force aggregation for coarse-graining.

A from-scratch JAX/XLA re-design of the capabilities of noegroup/aggforce:
given an atomistic trajectory (coordinates + forces) and a configurational
coarse-graining map, derive optimal force maps — static linear (constrained
least squares), featurized configuration-dependent, and stochastic
Gaussian-noised — such that mapped forces estimate the CG mean force.

The public API mirrors the reference package (same entry points, same
semantics); internals are TPU-first: fused jitted kernels, one batched
multi-RHS KKT solve replacing per-site serial C-solver calls, closed-form
divergences, and mesh sharding for the frame axis (see
``aggforce_tpu.parallel``).

Primary entry point: :func:`project_forces`.
"""

# ruff: noqa: F401
from .trajectory import Trajectory
from .agg import project_forces
from .constraints import guess_pairwise_constraints
from .qp import (
    qp_linear_map,
    constraint_aware_uni_map,
    joptgauss_map,
    stagedjoptgauss_map,
    stagedjslicegauss_map,
    stagedjforcegauss_map,
)
from .map import LinearMap

__version__ = "0.1.0"
