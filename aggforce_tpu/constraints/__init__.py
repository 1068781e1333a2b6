"""Molecular-constraint detection and algebra."""
# ruff: noqa: F401
from .hints import Constraints
from .finder import guess_pairwise_constraints
from .tools import reduce_constraint_sets, constraint_lookup_dict
