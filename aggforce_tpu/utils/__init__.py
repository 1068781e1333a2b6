"""Generic helpers: partial application, flattening, PDB parsing, synthetic data."""
# ruff: noqa: F401
from .cache import enable_compile_cache
from .funcs import curry, Curry, flatten
from .pdblite import read_pdb_atoms, ca_map_from_pdb
from .warmup import (
    WarmupHandle,
    warm_featurized_fit,
    warm_gauss_fit,
    warm_linear_fit,
)
