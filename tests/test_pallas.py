"""Pallas kernels (interpreter mode on CPU): parity with the XLA ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu.ops.pallas.radar import (
    radar_return_fused,
)
from skeleton_action_recognition_tpu.ops.resample import (
    pad_frames_operator,
)
from skeleton_action_recognition_tpu.ops.virtual_radar import (
    radar_return_upsampled,
)


@pytest.fixture(scope="module")
def radar_inputs(ntu_examples):
    x = jnp.asarray(ntu_examples[:2, :, :30])
    w = jnp.asarray(pad_frames_operator(30, 20))  # T_out = 600
    return x, w


def test_fused_radar_matches_xla_forward(radar_inputs):
    x, w = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)
    re_f, im_f = radar_return_fused(x, w, loc, lam, tile=128)
    re_x, im_x = radar_return_upsampled(x, w, loc, lam)
    assert re_f.shape == re_x.shape == (2, 600)
    scale = float(jnp.abs(re_x).max())
    np.testing.assert_allclose(
        np.asarray(re_f), np.asarray(re_x), atol=2e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(im_f), np.asarray(im_x), atol=2e-3 * scale
    )


def test_fused_radar_nondivisible_tile(radar_inputs):
    """T_out=600 with tile=256 -> padded grid + slice-off."""
    x, w = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)
    re_a, _ = radar_return_fused(x, w, loc, lam, tile=256)
    re_b, _ = radar_return_fused(x, w, loc, lam, tile=128)
    scale = float(jnp.abs(re_a).max())
    np.testing.assert_allclose(
        np.asarray(re_a), np.asarray(re_b), atol=2e-3 * scale
    )


def test_fused_radar_gradients_finite_and_match(radar_inputs):
    x, w = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)

    def loss_f(x):
        re, im = radar_return_fused(x, w, loc, lam, tile=128)
        return jnp.sum(re * re + im * im)

    def loss_x(x):
        re, im = radar_return_upsampled(x, w, loc, lam)
        return jnp.sum(re * re + im * im)

    g_f = jax.grad(loss_f)(x)
    g_x = jax.grad(loss_x)(x)
    assert np.isfinite(np.asarray(g_f)).all()
    assert np.isfinite(np.asarray(g_x)).all()
    # the cotangent (the forward's own output) differs between the two
    # implementations at the f32 phase-jitter level, which the 4*pi/lambda
    # factor amplifies — hence the loose tolerance
    scale = float(jnp.abs(g_x).max())
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_x), atol=1e-2 * scale
    )


def test_spline_radar_matches_xla_forward(radar_inputs):
    """Spline-factorized kernel vs the XLA oracle, under jit (the r2
    banding regression failed exactly here: jit-traced callers)."""
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_spline,
    )

    x, w = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)
    re_s, im_s = jax.jit(
        lambda x: radar_return_spline(x, 20, loc, lam, tile=128)
    )(x)
    re_x, im_x = radar_return_upsampled(x, w, loc, lam)
    assert re_s.shape == re_x.shape == (2, 600)
    scale = float(jnp.abs(re_x).max())
    np.testing.assert_allclose(
        np.asarray(re_s), np.asarray(re_x), atol=2e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(im_s), np.asarray(im_x), atol=2e-3 * scale
    )


def test_spline_radar_tile_independent(radar_inputs):
    """tile=256 (3 tiles, 168 pad rows, wider NS) == tile=128."""
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_spline,
    )

    x, _ = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)
    re_a, _ = radar_return_spline(x, 20, loc, lam, tile=256)
    re_b, _ = radar_return_spline(x, 20, loc, lam, tile=128)
    scale = float(jnp.abs(re_a).max())
    np.testing.assert_allclose(
        np.asarray(re_a), np.asarray(re_b), atol=2e-3 * scale
    )


def test_spline_radar_gradients_match_xla(radar_inputs):
    """d/dx, d/dloc, d/dlam of the spline path vs the XLA oracle."""
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_spline,
    )

    x, w = radar_inputs
    loc, lam = jnp.zeros(3), jnp.asarray(5e-4)

    def loss_s(x, loc, lam):
        re, im = radar_return_spline(x, 20, loc, lam, tile=128)
        return jnp.sum(re * re + im * im)

    def loss_x(x, loc, lam):
        re, im = radar_return_upsampled(x, w, loc, lam)
        return jnp.sum(re * re + im * im)

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(x, loc, lam)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, loc, lam)
    for g_s, g_x in zip(gs, gx):
        assert np.isfinite(np.asarray(g_s)).all()
        scale = float(np.abs(np.asarray(g_x)).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_x), atol=1e-2 * scale
        )


def test_radar_gradients_safe_with_empty_body(radar_inputs):
    """All-zero second body (routine in NTU) must not poison gradients."""
    x, w = radar_inputs
    x = x.at[:, :, :, :, 1].set(0.0)
    g = jax.grad(
        lambda x: radar_return_upsampled(
            x, w, jnp.zeros(3), jnp.asarray(5e-4)
        )[0].sum()
    )(x)
    assert np.isfinite(np.asarray(g)).all()
