"""VirtualRadar: differentiable micro-Doppler spectrogram synthesis.

TPU-native re-design of the reference's centerpiece
(``layers/virtual_radar.py:79-134``). Each skeleton bone (edge) is modeled
as an ellipsoid; its radar-cross-section backscatter (Mahafza, *Radar
Systems Analysis and Design Using MATLAB*, 2000 — cited at
``layers/virtual_radar.py:22-25``) and round-trip phase are computed per
timestep, the complex returns of all edges and bodies are superimposed into
one signal, and a centered STFT produces the log-magnitude spectrogram.

Everything is expressed as elementwise VPU math over ``(N, T, E, M)``
tensors plus two MXU contractions (the optional time-upsampling operator
and the STFT bases), fully differentiable w.r.t. the joint trajectories,
the wavelength, the radar location, and the STFT bases.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import RADAR_EDGES
from skeleton_action_recognition_tpu.ops import stft as stft_ops


def radar_return(
    x,
    radar_location,
    wavelength,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
):
    """Complex radar time signal from skeleton joint trajectories.

    Mirrors ``layers/virtual_radar.py:93-123`` step for step:

    * gather per-edge source/destination joints;
    * radar→source distance and aspect angles theta (midpoint-to-radar vs
      bone direction) and phi (elevation of the radar in the source's x-y
      plane), both with the reference's ``1e-6`` denominators;
    * ellipsoid RCS with ``c = (time-mean bone length)^2``, kept in the
      reference's unreduced ``sin/cos(phi)`` form so the rounding matches;
    * complex return ``sqrt(rcs) * exp(j * 4 pi d / lambda)``;
    * superposition over edges and bodies.

    One deviation: the ``acos`` argument is clamped to ``[-1, 1]`` — the
    reference can produce NaN when the ``1e-6`` slack is not enough; the
    clamp only activates in that degenerate regime and gives zero instead of
    NaN gradients there.

    Args:
      x: ``(N, 3, T, V, M)`` joint positions (reference layout).
      radar_location: ``(3,)`` radar position.
      wavelength: scalar radar wavelength.
      edges: bone list as ``(src, dst)`` vertex pairs.

    Returns:
      ``(re, im)`` each of shape ``(N, T)``.
    """
    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])

    # (N, 3, T, E, M)
    src = x[:, :, :, src_idx]
    dst = x[:, :, :, dst_idx]
    loc = radar_location[None, :, None, None, None]

    rev = src - loc  # radar -> ellipsoid vector (sign-free uses below)
    distances = jnp.linalg.norm(rev, axis=1)  # (N, T, E, M)

    a_vec = loc - (src + dst) / 2.0
    b_vec = dst - src
    cos_theta = jnp.sum(a_vec * b_vec, axis=1) / (
        jnp.linalg.norm(a_vec, axis=1) * jnp.linalg.norm(b_vec, axis=1) + 1e-6
    )
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    sin_phi = (radar_location[1] - src[:, 1]) / (
        jnp.linalg.norm(rev[:, :2], axis=1) + 1e-6
    )
    phi = jnp.arcsin(jnp.clip(sin_phi, -1.0, 1.0))

    # c = (mean_t bone length)^2, kept per (N, 1, E, M).
    c = jnp.mean(jnp.linalg.norm(b_vec, axis=1), axis=1, keepdims=True) ** 2
    sin_t2 = jnp.sin(theta) ** 2
    cos_t2 = jnp.cos(theta) ** 2
    denom = (
        sin_t2 * jnp.cos(phi) ** 2
        + sin_t2 * jnp.sin(phi) ** 2
        + c * cos_t2
    ) ** 2
    rcs = (np.pi * c) / denom

    amp = jnp.sqrt(rcs)
    phase = 4.0 * np.pi * distances / wavelength

    re = jnp.sum(amp * jnp.cos(phase), axis=(2, 3))  # (N, T)
    im = jnp.sum(amp * jnp.sin(phase), axis=(2, 3))
    return re, im


def virtual_radar_spectrogram(
    x,
    radar_location,
    wavelength,
    cos_basis=None,
    sin_basis=None,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    n_fft: int = 256,
    hop_length: int = 16,
):
    """Full VirtualRadar forward: joints -> log-magnitude spectrogram.

    Equivalent of ``VirtualRadar.forward`` (``layers/virtual_radar.py:79-134``)
    with defaults from ``:36-45`` (``n_fft=256``, ``hop=16``). Output shape is
    ``(N, n_fft, T // hop + 1)`` with zero Doppler centered (fftshift roll).

    ``cos_basis`` / ``sin_basis`` may be passed in (e.g. as trainable
    parameters mirroring ``train_stft_kernel``); by default the Hann-windowed
    Fourier bases are used.
    """
    if cos_basis is None or sin_basis is None:
        cos_np, sin_np = stft_ops.stft_basis(n_fft)
        cos_basis = jnp.asarray(cos_np) if cos_basis is None else cos_basis
        sin_basis = jnp.asarray(sin_np) if sin_basis is None else sin_basis

    re, im = radar_return(x, radar_location, wavelength, edges)
    s_re, s_im = stft_ops.stft_complex(re, im, hop_length, cos_basis, sin_basis)
    return stft_ops.log_magnitude(s_re, s_im)
