"""Streaming trajectory IO: fits over datasets larger than host/device memory."""

from .stream import (
    TrajectoryStream,
    fused_gb_linear_map_streamed,
    qp_linear_map_streamed,
)

__all__ = [
    "TrajectoryStream",
    "fused_gb_linear_map_streamed",
    "qp_linear_map_streamed",
]
