"""Pallas TPU kernels for the hot ops."""

from skeleton_action_recognition_tpu.ops.pallas.radar import (
    radar_return_fused,
    radar_return_spline,
)
from skeleton_action_recognition_tpu.ops.pallas.sgcn import (
    make_fused_graph_conv,
)

__all__ = [
    "radar_return_fused",
    "radar_return_spline",
    "make_fused_graph_conv",
]
