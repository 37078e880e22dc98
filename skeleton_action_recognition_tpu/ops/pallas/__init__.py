"""Pallas TPU kernels for the hot ops."""

from skeleton_action_recognition_tpu.ops.pallas.radar import (
    radar_return_fused,
)

__all__ = ["radar_return_fused"]
