"""Gaussian smoothing + cubic time-upsampling as a single linear operator.

The reference inflates every clip on CPU loader workers with
``gaussian_filter1d`` followed by scipy ``interp1d(kind='cubic')``
(``utils.py:82-89`` module-level helper, smoothing over the *joint* axis;
``utils.py:134-140`` ``Dataset.pad_frames``, smoothing over the *time*
axis) — 300 frames become 75,000 samples per item, the pipeline bottleneck
(SURVEY §3.2).

Key observation: both the Gaussian filter and cubic-spline interpolation are
*linear* in the data. The whole resampling step is therefore one constant
``(T_out, T_in)`` matrix ``W = P @ G`` applied as a single matmul — exactly
MXU-shaped, fully on-device, and numerically identical to the scipy
pipeline (the matrices are built host-side *with scipy* by pushing the
identity matrix through it, so boundary handling — reflect padding,
not-a-knot splines — matches bit-for-bit in float64 before the cast).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

# Resampling feeds radar phase computations that are sensitive to
# interpolation error; keep these matmuls in full f32 on the MXU.
_PRECISION = lax.Precision.HIGHEST


@functools.lru_cache(maxsize=32)
def gaussian_smooth_matrix(n: int, sigma: float) -> np.ndarray:
    """``(n, n)`` operator of ``scipy.ndimage.gaussian_filter1d`` (reflect)."""
    from scipy.ndimage import gaussian_filter1d

    return gaussian_filter1d(np.eye(n), sigma, axis=0)


@functools.lru_cache(maxsize=32)
def cubic_interp_matrix(t_in: int, t_out: int) -> np.ndarray:
    """``(t_out, t_in)`` operator of ``interp1d(linspace(0,1,t_in), ·,
    'cubic')`` evaluated at ``linspace(0,1,t_out)`` (not-a-knot spline)."""
    from scipy.interpolate import interp1d

    f = interp1d(
        np.linspace(0.0, 1.0, t_in), np.eye(t_in), "cubic", axis=0
    )
    return f(np.linspace(0.0, 1.0, t_out))


@functools.lru_cache(maxsize=32)
def pad_frames_operator(
    t_in: int,
    num_pad_frames: int,
    sigma: float = 3.0,
    dtype=np.float32,
) -> np.ndarray:
    """Combined smooth-then-upsample operator ``(t_in * num_pad_frames, t_in)``.

    Matches ``Dataset.pad_frames`` (``utils.py:134-140``): Gaussian smoothing
    over time, then cubic upsampling by ``num_pad_frames``x.
    """
    w = cubic_interp_matrix(t_in, num_pad_frames * t_in) @ gaussian_smooth_matrix(
        t_in, sigma
    )
    return w.astype(dtype)


def pad_frames(
    data,
    num_pad_frames: int = 1,
    sigma: float = 3.0,
    smooth_axis: str = "joints",
):
    """Smooth and cubic-upsample the time axis of ``(T, V, C)`` joint data.

    JAX equivalent of the module-level ``pad_frames`` (``utils.py:82-89``)
    used by the demo notebook. NB the reference helper smooths over the
    *joint* axis (``axis=1``) while the torch ``Dataset`` variant smooths
    over *time* — a documented inconsistency (SURVEY §2 "PyTorch dataset"
    row). ``smooth_axis`` selects which behavior to reproduce:
    ``'joints'`` (notebook anchors) or ``'time'`` (training pipeline).

    Executes as one or two matmuls; safe to call inside ``jit`` for fixed
    shapes.
    """
    if data.ndim != 3:
        raise ValueError(
            f"pad_frames expects (T, V, C) joint data, got shape "
            f"{data.shape}"
        )
    t, v, _ = data.shape
    p = jnp.asarray(
        cubic_interp_matrix(t, num_pad_frames * t).astype(np.float32)
    )
    if smooth_axis == "joints":
        g = jnp.asarray(gaussian_smooth_matrix(v, sigma).astype(np.float32))
        smoothed = jnp.einsum("vu,tuc->tvc", g, data, precision=_PRECISION)
        return jnp.einsum("ot,tvc->ovc", p, smoothed, precision=_PRECISION)
    if smooth_axis == "time":
        w = jnp.asarray(pad_frames_operator(t, num_pad_frames, sigma))
        return jnp.einsum("ot,tvc->ovc", w, data, precision=_PRECISION)
    raise ValueError(f"unknown smooth_axis: {smooth_axis!r}")
