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


@functools.lru_cache(maxsize=32)
def spline_coefficient_operator(t_in: int, sigma: float = 3.0):
    """Piecewise-cubic factorization of :func:`pad_frames_operator`.

    The dense ``(T_out, T_in)`` operator is rank-deficient structure-wise:
    every output row evaluates ONE cubic segment of the same not-a-knot
    spline. This returns the ``(nseg * 4, t_in)`` map from input samples
    to smoothed per-segment polynomial coefficients (ordered
    ``[seg, k]`` with ``f(t) = sum_k c[seg, k] * (t - x_seg)^(3-k)``),
    plus the knot vector ``xs (t_in,)`` — so resampling becomes a tiny
    coefficient gather + per-row polynomial evaluation instead of a
    ``T_in``-wide contraction. Exactness vs the dense operator is pinned
    by ``tests/test_ops.py::test_spline_factorization_matches_operator``
    (float64 reconstruction, then f32 cast).
    """
    from scipy.interpolate import CubicSpline

    xs = np.linspace(0.0, 1.0, t_in)
    g = gaussian_smooth_matrix(t_in, sigma)  # (t_in, t_in), float64
    cs = CubicSpline(xs, g, axis=0, bc_type="not-a-knot")
    # cs.c: (4, nseg, t_in) with c[0] the cubic term
    cc = np.transpose(cs.c, (1, 0, 2)).reshape(
        (t_in - 1) * 4, t_in
    )
    return cc, xs


@functools.lru_cache(maxsize=32)
def spline_tile_plan(
    t_in: int, num_pad_frames: int, tile: int, sigma: float = 3.0
):
    """Tiled evaluation plan for the spline-factorized resampler.

    For a ``tile``-row blocking of the padded time axis this precomputes
    everything the fused radar kernel needs to evaluate
    ``pad_frames_operator(t_in, num_pad_frames, sigma) @ data`` as a
    narrow per-tile contraction instead of a ``t_in``-wide one:

    * ``coeffs_op`` ``(nseg*4, t_in)`` f32 — maps input samples to
      smoothed per-segment cubic coefficients (``[seg, k]`` ordering);
    * ``tile_seg`` ``(num_tiles, ns)`` int32 — which spline segments each
      output tile touches (``ns`` = max segments under any tile, ~4 at
      the production 250x upsample with ``tile=512``);
    * ``eval_mat`` ``(num_tiles, tile, ns*4)`` f32 — per-row monomials
      ``u^(3-k)`` one-hot-placed in the ``(slot, k)`` column for the
      row's segment. Rows past ``t_in*num_pad_frames`` (grid padding)
      are all-zero, so downstream tile reductions need no mask.

    ``eval_mat[j] @ gathered_coeffs[j]`` reproduces the dense operator's
    tile exactly in float64 (pinned by
    ``tests/test_ops.py::test_spline_tile_plan_matches_operator``); both
    are served to the kernel as f32.
    """
    t_out = t_in * num_pad_frames
    num_tiles = -(-t_out // tile)
    t_pad = num_tiles * tile
    nseg = t_in - 1
    cc, xs = spline_coefficient_operator(t_in, sigma)

    t = np.linspace(0.0, 1.0, t_out)
    seg = np.minimum(np.searchsorted(xs, t, side="right") - 1, nseg - 1)
    u = t - xs[seg]
    seg = np.concatenate([seg, np.full(t_pad - t_out, seg[-1], np.int64)])
    u = np.concatenate([u, np.zeros(t_pad - t_out)])
    valid = (np.arange(t_pad) < t_out).astype(np.float64)

    seg_t = seg.reshape(num_tiles, tile)
    u_t = u.reshape(num_tiles, tile)
    valid_t = valid.reshape(num_tiles, tile)
    first = seg_t[:, 0]
    ns = int((seg_t[:, -1] - first).max()) + 1
    tile_seg = np.minimum(
        first[:, None] + np.arange(ns)[None, :], nseg - 1
    ).astype(np.int32)

    slot = seg_t - first[:, None]  # (num_tiles, tile) in [0, ns)
    eval_mat = np.zeros((num_tiles, tile, ns, 4))
    jj, rr = np.meshgrid(
        np.arange(num_tiles), np.arange(tile), indexing="ij"
    )
    for k in range(4):
        eval_mat[jj, rr, slot, k] = (u_t ** (3 - k)) * valid_t
    return (
        cc.astype(np.float32),
        tile_seg,
        eval_mat.reshape(num_tiles, tile, ns * 4).astype(np.float32),
    )
