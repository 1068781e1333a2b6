"""Constraint-aware uniform force aggregation.

Behavior parity target: reference qp/basicagg.py:11-62 — each cg site
aggregates (weight 1.0) the forces of its contributing fg sites plus any fg
sites joined to them through constraint groups.
"""

from typing import Optional

import numpy as np

from ..constraints import Constraints, reduce_constraint_sets
from ..map import LinearMap, SeperableTMap
from ..trajectory import ForcesTrajectory


def constraint_aware_uni_map(
    traj: ForcesTrajectory,  # noqa: ARG001
    coord_map: LinearMap,
    constraints: Optional[Constraints] = None,
) -> SeperableTMap:
    """Uniform-weight force map compatible with molecular constraints.

    ``traj`` is unused (kept for method-signature compatibility with the
    optimizing map builders dispatched by ``project_forces``).
    """
    if constraints is None:
        constraints = set()
    cg_sets = [set(np.nonzero(row)[0].tolist()) for row in coord_map.standard_matrix]
    groups = reduce_constraint_sets(constraints)
    for members in cg_sets:
        for group in groups:
            if members & group:
                members |= group
    force_mat = np.zeros_like(coord_map.standard_matrix)
    for cg_index, members in enumerate(cg_sets):
        force_mat[cg_index, sorted(members)] = 1.0
    return SeperableTMap(coord_map=coord_map, force_map=LinearMap(force_mat))
