"""Device-mesh scaling: sharded Gram reductions and distributed fits."""
# ruff: noqa: F401
from .mesh import make_mesh, sharded_linear_fit, sharded_force_smoothness
from .distributed import (
    global_frame_mesh,
    initialize_distributed,
    process_frame_slice,
)
