"""Fused Pallas STFT+log-magnitude: parity with the XLA ops.

Runs in interpreter mode on CPU (``ops/pallas/stft.py`` flips
``interpret`` on the backend). Shapes are scaled-down radar shapes
(n_fft=256, hop=16 — the production config of
``/root/reference/layers/virtual_radar.py:71-76``) with T chosen to
exercise the frame-block padding and the backward's carry chain across
several grid steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu.ops import stft as stft_ops
from skeleton_action_recognition_tpu.ops.pallas.stft import stft_logmag

N_FFT, HOP = 256, 16


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(11)
    # T=3000: frames=188 < one 256-frame block after padding AND
    # T=9000: frames=563 -> 3 blocks; both covered via params below
    return rng


def _make(rng, n, t):
    re = jnp.asarray(rng.normal(size=(n, t)), jnp.float32)
    im = jnp.asarray(rng.normal(size=(n, t)), jnp.float32)
    return re, im


def _xla(re, im, fftshift=True, center=True):
    cos_np, sin_np = stft_ops.stft_basis(N_FFT)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    s_re, s_im = stft_ops.stft_complex(re, im, HOP, cos, sin,
                                       center=center)
    return stft_ops.log_magnitude(s_re, s_im, fftshift=fftshift)


def _pallas(re, im, fftshift=True, center=True):
    cos_np, sin_np = stft_ops.stft_basis(N_FFT)
    return stft_logmag(
        re, im, HOP, jnp.asarray(cos_np), jnp.asarray(sin_np),
        fftshift=fftshift, center=center,
    )


@pytest.mark.parametrize("t", [3000, 9000])
def test_forward_matches_xla(signal, t):
    re, im = _make(signal, 2, t)
    got = _pallas(re, im)
    want = _xla(re, im)
    assert got.shape == want.shape == (2, N_FFT, t // HOP + 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-4
    )


def test_forward_no_shift_no_center(signal):
    re, im = _make(signal, 1, 4096)
    got = _pallas(re, im, fftshift=False, center=False)
    want = _xla(re, im, fftshift=False, center=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-4
    )


def test_gradients_match_xla(signal):
    """The hand-derived backward (carry-chain overlap-add + reflect
    unpad) against XLA autodiff of the unfused chain, including a
    nontrivial upstream cotangent."""
    re, im = _make(signal, 2, 6000)
    w = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(2, N_FFT, 6000 // HOP + 1)
        ),
        jnp.float32,
    )

    def loss_p(re, im):
        return jnp.sum(_pallas(re, im) * w)

    def loss_x(re, im):
        return jnp.sum(_xla(re, im) * w)

    gp_re, gp_im = jax.grad(loss_p, argnums=(0, 1))(re, im)
    gx_re, gx_im = jax.grad(loss_x, argnums=(0, 1))(re, im)
    scale = float(jnp.abs(gx_re).max())
    np.testing.assert_allclose(
        np.asarray(gp_re), np.asarray(gx_re), atol=1e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(gp_im), np.asarray(gx_im), atol=1e-4 * scale
    )


def test_virtual_radar_module_parity(signal):
    """Model-level wiring: VirtualRadar(use_pallas_stft=True) matches
    the default XLA chain on real NTU-layout input."""
    from skeleton_action_recognition_tpu.models.spectrogram import (
        VirtualRadar,
    )

    x = jnp.asarray(
        signal.normal(size=(2, 3, 300, 25, 2)) * 0.3, jnp.float32
    )
    ref = VirtualRadar(wavelength=5e-4)
    fused = VirtualRadar(wavelength=5e-4, use_pallas_stft=True)
    key = jax.random.key(0)
    p_ref = ref.init(key, x)
    want = ref.apply(p_ref, x)
    got = fused.apply(p_ref, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-4
    )


def test_basis_cotangent_is_zero(signal):
    """The documented gradient contract: bases are constants."""
    re, im = _make(signal, 1, 3000)
    cos_np, sin_np = stft_ops.stft_basis(N_FFT)

    def loss(cos, sin):
        return jnp.sum(stft_logmag(re, im, HOP, cos, sin))

    g_cos, g_sin = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(cos_np), jnp.asarray(sin_np)
    )
    assert float(jnp.abs(g_cos).max()) == 0.0
    assert float(jnp.abs(g_sin).max()) == 0.0
