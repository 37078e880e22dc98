"""VirtualRadar numerics: full-field oracle comparison + notebook anchors.

Two layers of validation:

1. A *full-field* comparison of the radar return and spectrogram against an
   independent float64 numpy/scipy implementation of the published equations
   (Mahafza RCS + centered Hann STFT) — the same strategy as the reference's
   own scipy cross-check (notebook cell 8, ``VirtualRadarScipy``).
2. The notebook's printed anchors (cells 2-4): exact output shapes, and
   coarse log-magnitude envelopes. NB the spectrogram *minimum* lives at
   destructive-interference nulls and moves by ~0.5 under 1e-7 input
   perturbations (f32 vs f64 resampling), so only loose bounds are
   meaningful there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu import ops
from skeleton_action_recognition_tpu.graphs import RADAR_EDGES
from skeleton_action_recognition_tpu.ops.virtual_radar import radar_return

GAIT_EDGES = [
    (0, 1), (1, 2), (1, 3), (3, 5), (5, 7), (1, 4), (4, 6), (6, 8),
    (0, 9), (9, 11), (11, 13), (13, 15), (0, 10), (10, 12), (12, 14),
    (14, 16),
]


def oracle_radar_return(x, loc, lam, edges):
    """Float64 numpy implementation of the radar equations, written
    independently of the JAX op (different vectorization/order)."""
    x = np.asarray(x, np.float64)
    loc = np.asarray(loc, np.float64)
    n, _, t, v, m = x.shape
    re = np.zeros((n, t))
    im = np.zeros((n, t))
    for s_idx, d_idx in edges:
        src = x[:, :, :, s_idx]  # (N, 3, T, M)
        dst = x[:, :, :, d_idx]
        dist = np.sqrt(((src - loc[None, :, None, None]) ** 2).sum(1))
        a = loc[None, :, None, None] - (src + dst) / 2
        b = dst - src
        na = np.sqrt((a**2).sum(1))
        nb = np.sqrt((b**2).sum(1))
        ct = (a * b).sum(1) / (na * nb + 1e-6)
        theta = np.arccos(np.clip(ct, -1, 1))
        rev = src - loc[None, :, None, None]
        sp = (loc[1] - src[:, 1]) / (
            np.sqrt((rev[:, :2] ** 2).sum(1)) + 1e-6
        )
        phi = np.arcsin(np.clip(sp, -1, 1))
        c = (nb.mean(axis=1, keepdims=True)) ** 2
        rcs = (np.pi * c) / (
            np.sin(theta) ** 2 * np.cos(phi) ** 2
            + np.sin(theta) ** 2 * np.sin(phi) ** 2
            + c * np.cos(theta) ** 2
        ) ** 2
        amp = np.sqrt(rcs)
        phase = 4 * np.pi * dist / lam
        re += (amp * np.cos(phase)).sum(-1)
        im += (amp * np.sin(phase)).sum(-1)
    return re, im


def oracle_spectrogram(re, im, n_fft=256, hop=16):
    """Centered Hann STFT via explicit framing + FFT (float64)."""
    sig = re + 1j * im
    out = []
    for row in sig:
        pad = np.pad(row, n_fft // 2, mode="reflect")
        frames = np.lib.stride_tricks.sliding_window_view(pad, n_fft)[::hop]
        win = np.hanning(n_fft + 1)[:-1]
        spec = np.fft.fft(frames * win, axis=-1).T  # (n_fft, frames)
        mag = np.log(np.abs(spec) + 1e-6)
        out.append(np.roll(mag, n_fft // 2, axis=0))
    return np.stack(out)


@pytest.fixture(scope="module")
def gait_input(simulated_gait):
    x = np.asarray(
        ops.pad_frames(
            jnp.asarray(simulated_gait, jnp.float32), num_pad_frames=2
        )
    )
    return x.transpose(2, 0, 1)[None, ..., None].astype(np.float32)


def test_radar_return_matches_oracle(gait_input):
    lam = 5e-4
    re, im = radar_return(
        jnp.asarray(gait_input), jnp.zeros(3), jnp.asarray(lam), GAIT_EDGES
    )
    re_o, im_o = oracle_radar_return(gait_input, np.zeros(3), lam, GAIT_EDGES)
    # f32 phase quantization: phase = 4*pi*d/lam ~ 25k rad, so f32
    # rounding of d injects ~0.006 rad of phase jitter per edge (the torch
    # reference has the same); tolerance reflects that, not algorithm error.
    scale = np.abs(re_o).max()
    np.testing.assert_allclose(np.asarray(re), re_o, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(im), im_o, atol=2e-3 * scale)


def test_spectrogram_matches_oracle_full_field(gait_input):
    lam = 5e-4
    spec = np.asarray(
        ops.virtual_radar_spectrogram(
            jnp.asarray(gait_input), jnp.zeros(3), jnp.asarray(lam),
            edges=GAIT_EDGES,
        )
    )[0]
    re_o, im_o = oracle_radar_return(gait_input, np.zeros(3), lam, GAIT_EDGES)
    spec_o = oracle_spectrogram(re_o, im_o)[0]
    assert spec.shape == spec_o.shape
    # Compare log-magnitudes away from interference nulls (where the log
    # amplifies float noise unboundedly).
    mask = spec_o > np.median(spec_o)
    diff = np.abs(spec - spec_o)[mask]
    assert np.quantile(diff, 0.99) < 0.1
    assert diff.mean() < 0.02


@pytest.mark.parametrize(
    "name,pad,lam,shape",
    [
        ("cmu", 20, 5e-3, (256, 3439)),
        ("gait", 10, 5e-4, (256, 5121)),
        ("ntu", 550, 9e-4, (256, 10313)),
    ],
)
def test_notebook_anchor_shapes_and_envelopes(
    name, pad, lam, shape, cmu_mocap, simulated_gait, ntu_examples
):
    """Notebook cells 2-4 anchors: exact shapes; log extremes within the
    envelope set by resampling-precision sensitivity (see module docstring).
    Anchor values (post-skimage-resize): cmu (-11.26, 7.58),
    gait (-8.68, 7.75), ntu (-13.82, 8.80)."""
    if name == "cmu":
        data, edges = cmu_mocap * 0.001, [(i, i + 1) for i in range(41)]
        lo, hi = -11.26, 7.58
    elif name == "gait":
        data, edges = simulated_gait, GAIT_EDGES
        lo, hi = -8.68, 7.75
    else:
        data = ntu_examples[0, :, :, :, 0].transpose(1, 2, 0)
        edges = RADAR_EDGES
        lo, hi = -13.82, 8.80

    padded = ops.pad_frames(
        jnp.asarray(data, jnp.float32), num_pad_frames=pad
    )
    x = jnp.transpose(padded, (2, 0, 1))[None, ..., None]
    spec = np.asarray(
        ops.virtual_radar_spectrogram(
            x, jnp.zeros(3), jnp.asarray(lam), edges=edges
        )
    )[0]
    assert spec.shape == shape
    assert abs(spec.max() - hi) < 0.5
    assert abs(spec.min() - lo) < 1.0
    assert np.isfinite(spec).all()
