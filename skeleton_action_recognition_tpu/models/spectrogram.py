"""Spectrogram classifier: VirtualRadar layer + ResNet-18.

Parity with ``models/resnet.py:11-28``: skeleton joints ->
VirtualRadar(wavelength=5e-4) spectrogram -> channel dim -> nearest-
neighbor resize to ``image_size x image_size`` (torch ``F.interpolate``
default mode) -> ResNet-18.

The radar parameters are flax params named ``radar_lambda`` and
``radar_loc`` so that the trainer's staged-unfreezing masks
(``main_spectrogram.py:128-136``) can address them by name. (NB: in the
reference that staged unfreezing is a silent no-op — it matches parameter
names ``radar_lambda`` / ``radar_loc`` that never occur, the layer names
them ``wavelength`` / ``radar_location``. Here the names line up and the
schedule actually works.) The STFT bases may also be made trainable,
mirroring ``train_stft_kernel`` (``layers/virtual_radar.py:71-76``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import RADAR_EDGES
from skeleton_action_recognition_tpu.models.resnet18 import ResNet
from skeleton_action_recognition_tpu.ops import stft as stft_ops
from skeleton_action_recognition_tpu.ops.resample import (
    pad_frames_operator,
)
from skeleton_action_recognition_tpu.ops.virtual_radar import (
    radar_return,
    radar_return_upsampled,
)


def nearest_resize_torch(x, out_h: int, out_w: int):
    """Nearest-neighbor resize with torch ``F.interpolate`` index semantics:
    ``src = floor(dst * in / out)`` (not half-pixel-centered)."""
    h, w = x.shape[-2], x.shape[-1]
    rows = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    cols = np.floor(np.arange(out_w) * w / out_w).astype(np.int32)
    return x[..., rows, :][..., cols]


class VirtualRadar(nn.Module):
    """flax module wrapping the VirtualRadar op with learnable parameters.

    Equivalent of ``layers/virtual_radar.py:16-134`` with defaults from
    ``:36-45``.
    """

    edges: Tuple[Tuple[int, int], ...] = tuple(RADAR_EDGES)
    wavelength: float = 1e-3
    radar_location: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    n_fft: int = 256
    hop_length: int = 16
    train_stft_kernel: bool = False
    num_pad_frames: int = 0
    pad_sigma: float = 3.0
    use_pallas: bool = False  # fused Pallas kernel for the radar return
    # fused Pallas STFT+log-magnitude (ops/pallas/stft.py). Requires
    # frozen bases (the kernel's gradient contract); trainable-basis
    # configs fall back to the XLA path below.
    use_pallas_stft: bool = False

    @nn.compact
    def __call__(self, x):
        lam = self.param(
            "radar_lambda",
            lambda rng: jnp.asarray(self.wavelength, jnp.float32),
        )
        loc = self.param(
            "radar_loc",
            lambda rng: jnp.asarray(self.radar_location, jnp.float32),
        )
        cos_np, sin_np = stft_ops.stft_basis(self.n_fft)
        if self.train_stft_kernel:
            cos = self.param("stft_cos", lambda rng: jnp.asarray(cos_np))
            sin = self.param("stft_sin", lambda rng: jnp.asarray(sin_np))
        else:
            cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        if self.num_pad_frames > 1:
            # On-device fused upsample+radar (the reference does the 250x
            # interpolation on CPU loader workers, utils.py:134-140).
            if self.use_pallas:
                # Spline-factorized kernel: the dense (T_out, T_in)
                # operator never exists — only per-segment cubic
                # coefficients and a narrow per-tile monomial matrix.
                from skeleton_action_recognition_tpu.ops.pallas.radar import (
                    radar_return_spline,
                )

                re, im = radar_return_spline(
                    x, self.num_pad_frames, loc, lam, self.edges,
                    sigma=self.pad_sigma,
                )
            else:
                w = jnp.asarray(
                    pad_frames_operator(
                        x.shape[2], self.num_pad_frames, self.pad_sigma
                    )
                )
                re, im = radar_return_upsampled(x, w, loc, lam, self.edges)
        else:
            re, im = radar_return(x, loc, lam, self.edges)
        if self.use_pallas_stft and not self.train_stft_kernel:
            from skeleton_action_recognition_tpu.ops.pallas.stft import (
                stft_logmag,
            )

            return stft_logmag(re, im, self.hop_length, cos, sin)
        s_re, s_im = stft_ops.stft_complex(
            re, im, self.hop_length, cos, sin
        )
        return stft_ops.log_magnitude(s_re, s_im)


class Model(nn.Module):
    """VirtualRadar spectrogram -> ResNet-18 classifier
    (``models/resnet.py:11-28``)."""

    num_classes: int = 60
    num_filters: int = 64
    image_size: int = 256
    wavelength: float = 5e-4
    train_stft_kernel: bool = False
    num_pad_frames: int = 0
    use_pallas: bool = False
    use_pallas_stft: bool = False
    # compute dtype for the ResNet backbone (params stay f32). The radar
    # return + STFT stay f32 regardless: the phase term 4*pi*d/lambda is
    # ~1e4 radians at real wavelengths — bf16's ~3 decimal digits would
    # destroy the phase, and those ops are VPU/bandwidth-bound anyway.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = VirtualRadar(
            wavelength=self.wavelength,
            train_stft_kernel=self.train_stft_kernel,
            num_pad_frames=self.num_pad_frames,
            use_pallas=self.use_pallas,
            use_pallas_stft=self.use_pallas_stft,
            name="virtual_radar",
        )(x)
        spec = nearest_resize_torch(spec, self.image_size, self.image_size)
        spec = spec[..., None]  # NHWC, 1 channel
        return ResNet(
            num_classes=self.num_classes,
            num_filters=self.num_filters,
            dtype=self.dtype,
            name="base_model",
        )(spec, train)
