"""Functional kernel library (pure JAX ops + Pallas TPU kernels).

Layout conventions: model-internal activations are channels-last
``(N, T, V, C)`` so the channel axis rides the TPU lane dimension; the
public model/op boundaries accept the reference's ``(N, C, T, V, M)``.
"""

from skeleton_action_recognition_tpu.ops.graph import (
    gin_aggregate,
    spatial_graph_conv,
)
from skeleton_action_recognition_tpu.ops.resample import (
    cubic_interp_matrix,
    gaussian_smooth_matrix,
    pad_frames,
    pad_frames_operator,
)
from skeleton_action_recognition_tpu.ops.stft import (
    log_magnitude,
    stft_basis,
    stft_complex,
    stft_real,
)
from skeleton_action_recognition_tpu.ops.virtual_radar import (
    radar_return,
    radar_return_sharded,
    radar_return_upsampled,
    virtual_radar_spectrogram,
)

__all__ = [
    "cubic_interp_matrix",
    "gaussian_smooth_matrix",
    "gin_aggregate",
    "log_magnitude",
    "pad_frames",
    "pad_frames_operator",
    "radar_return",
    "radar_return_sharded",
    "radar_return_upsampled",
    "spatial_graph_conv",
    "stft_basis",
    "stft_complex",
    "stft_real",
    "virtual_radar_spectrogram",
]
