"""Fused VirtualRadar Pallas kernel: upsample -> returns -> accumulate.

The BASELINE.json north-star fusion target: "the VirtualRadar layer's
point-scatterer return simulation ... become a single fused on-device
kernel". One grid step produces one ``(TILE,)`` stretch of the padded time
axis for one sample: the resampling operator tile is contracted against
the gathered edge endpoints on the MXU, the per-edge backscatter and
round-trip phase are evaluated on the VPU in VMEM, and only the
``(N, T_out)`` complex signal ever reaches HBM — the
``(N, 3, T_out, E, M)`` padded-joint tensors that the XLA scan version
streams through HBM never exist.

Numerics note: the reference computes ``theta = acos(...)`` and
``phi = asin(...)`` (``layers/virtual_radar.py:104-108``) and then only
ever uses ``sin^2/cos^2`` of them (``:114-116``), so the kernel
substitutes ``cos^2(theta) = ct^2``, ``sin^2(theta) = 1 - ct^2`` — the
RCS denominator collapses to ``((1 - ct^2) + c * ct^2)^2`` with no inverse
trig (the ``sin^2(phi) + cos^2(phi)`` factor is identically 1). Same
mathematics, fewer transcendentals, and no ``acos`` domain clamping
needed.

Differentiation: the kernel stage carries a ``jax.custom_vjp`` whose
backward is a second hand-derived Pallas kernel (recompute the forward
intermediates per tile, differentiate the backscatter math on the VPU,
one MXU matmul for ``dfeat``); the feature-gather and bone-statistic
stages chain through ordinary JAX autodiff. The resampling operator is a
precomputed scipy constant and receives a zero cotangent.

Gradient conditioning note (validated on hardware): at radar wavelengths
(lambda ~ 5e-4) the loss gradients w.r.t. raw positions are tiny residues
of hugely-cancelling phase terms, so any two f32 implementations diverge
at O(1) *relative* while both being 'correct' — at lambda large enough to
suppress the oscillation (e.g. 10), this kernel's hand-derived backward
matches XLA autodiff to <=1% on TPU for dx/dloc and ~1e-3 for dlam.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import RADAR_EDGES

_TILE = 512


def _scatter_fwd_core(lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c):
    """Layout-agnostic elementwise backscatter math: broadcast-compatible
    endpoint coordinates -> per-element (amp, phase). The (TILE, EM) and
    (EM, TILE) wrappers below differ only in slicing/broadcast/reduction
    axes; every FLOP lives here so the two layouts cannot drift."""
    rx, ry, rz = sx - lx, sy - ly, sz - lz
    dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)

    ax, ay, az = lx - (sx + dx) * 0.5, ly - (sy + dy) * 0.5, lz - (sz + dz) * 0.5
    bx, by, bz = dx - sx, dy - sy, dz - sz
    dot = ax * bx + ay * by + az * bz
    na = jnp.sqrt(ax * ax + ay * ay + az * az)
    nb = jnp.sqrt(bx * bx + by * by + bz * bz)
    ct = dot / (na * nb + 1e-6)

    ct2 = ct * ct
    # abs: amp = sqrt(pi*c / denom^2) = sqrt(pi*c) / |denom| (denom can go
    # epsilon-negative when |ct| creeps past 1 in f32)
    denom = jnp.abs((1.0 - ct2) + c * ct2)
    amp = jnp.sqrt(np.pi * c) / denom

    phase = (4.0 * np.pi / lam) * dist
    return amp, phase


def _fwd_math(lam, lx, ly, lz, spos, dpos, c_row, em):
    """Shared VPU backscatter math: interpolated endpoint positions ->
    per-tile (re, im) rows. (TILE, EM) layout — used by the dense kernel."""
    sx, sy, sz = spos[:, :em], spos[:, em : 2 * em], spos[:, 2 * em :]
    dx, dy, dz = dpos[:, :em], dpos[:, em : 2 * em], dpos[:, 2 * em :]
    amp, phase = _scatter_fwd_core(
        lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c_row[None, :]
    )
    re_row = jnp.sum(amp * jnp.cos(phase), axis=1)
    im_row = jnp.sum(amp * jnp.sin(phase), axis=1)
    return re_row, im_row


def _fwd_math_t(lam, lx, ly, lz, spos, dpos, c_col, em):
    """Transposed twin of :func:`_fwd_math`: operands are (3*EM, TILE)
    with the edge-mass axis on SUBLANES and time on LANES. EM=48 on the
    lane (minor) axis occupies 48 of 128 f32 lanes — 62% of every VPU op
    wasted on padding in this VPU-bound kernel; with time on lanes
    (TILE=512, a multiple of 128) the vector registers are fully dense.
    Used by the spline kernel family (the production default)."""
    sx, sy, sz = spos[:em], spos[em : 2 * em], spos[2 * em :]
    dx, dy, dz = dpos[:em], dpos[em : 2 * em], dpos[2 * em :]
    amp, phase = _scatter_fwd_core(
        lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c_col[:, None]
    )
    re_row = jnp.sum(amp * jnp.cos(phase), axis=0)
    im_row = jnp.sum(amp * jnp.sin(phase), axis=0)
    return re_row, im_row


def _radar_kernel(lam_ref, loc_ref, w_ref, src_ref, dst_ref, c_ref,
                  re_ref, im_ref):
    """One (sample, time-tile) grid step.

    Refs: ``lam_ref`` (1,1) and ``loc_ref`` (1,3) in SMEM; ``w_ref``
    (TILE, T_in); ``src_ref``/``dst_ref`` (1, T_in, 3*EM) gathered
    endpoints laid out as [x | y | z] blocks of EM columns; ``c_ref``
    (1, EM) squared mean bone lengths; outputs (1, TILE).

    Precision split: the MXU's default f32 matmul is a single bf16 pass
    (measured rel ~3e-3). Position error on the SOURCE endpoints is
    amplified by the 4*pi/lambda phase factor into fully-decorrelated
    returns at radar wavelengths, so the src contraction is pinned
    HIGHEST (f32-exact). The dst endpoints only enter the aspect-angle /
    RCS-amplitude chain, where a 0.3% error is invisible after the
    log-magnitude — they stay on the fast default path (halves the
    f32-exact matmul cost).
    """
    em = c_ref.shape[-1]
    lam = lam_ref[0, 0]
    lx, ly, lz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]

    spos = jnp.dot(
        w_ref[:], src_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE, 3*EM)
    dpos = jnp.dot(
        w_ref[:], dst_ref[0], preferred_element_type=jnp.float32,
    )
    re_row, im_row = _fwd_math(
        lam, lx, ly, lz, spos, dpos, c_ref[0, 0], em
    )
    re_ref[0, 0, 0, :] = re_row
    im_ref[0, 0, 0, :] = im_row


def _gather_features(x_raw, src_idx, dst_idx):
    """``(N, 3, T, V, M)`` -> two ``(N, T, 3*E*M)`` endpoint features
    (src and dst), each laid out as [x | y | z] blocks of E*M columns.
    Kept as separate arrays so the kernel can contract them at different
    MXU precisions without lane-offset slicing (which Mosaic on v5e
    cannot lower at non-tile-aligned offsets)."""
    n, _, t, _, m = x_raw.shape
    src = x_raw[:, :, :, src_idx]  # (N, 3, T, E, M)
    dst = x_raw[:, :, :, dst_idx]
    pack = lambda a: jnp.concatenate(
        [a[:, i].reshape(n, t, -1) for i in range(3)], axis=-1
    )
    return pack(src), pack(dst)


def _bone_length_mean_sq(x_raw, pad_operator, src_idx, dst_idx, tile):
    """``c = (mean_t ||bone||)^2`` over the padded time axis, computed with
    a tiled scan so the padded bones are never materialized."""
    from jax import lax

    bone = (
        x_raw[:, :, :, dst_idx] - x_raw[:, :, :, src_idx]
    )  # (N, 3, T_in, E, M)
    t_out = pad_operator.shape[0]
    num_tiles = -(-t_out // tile)
    pad_rows = num_tiles * tile - t_out
    w = jnp.pad(pad_operator, ((0, pad_rows), (0, 0))).reshape(
        num_tiles, tile, -1
    )
    row_valid = (
        jnp.arange(num_tiles * tile).reshape(num_tiles, tile) < t_out
    )

    def body(acc, inputs):
        w_tile, valid = inputs
        # default (bf16-pass) precision: c only scales the return
        # amplitude, so sub-0.5% error here is invisible after the log,
        # unlike the phase-critical position interpolation
        b = jnp.einsum("ot,nctem->ncoem", w_tile, bone)
        s = jnp.sum(b * b, axis=1)  # (N, tile, E, M)
        # zero-gradient-at-zero norm: all-zero padded bodies are routine
        zero = s == 0
        length = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s)))
        length = length * valid[None, :, None, None]
        return acc + jnp.sum(length, axis=1), None

    n, _, _, e, m = bone.shape
    # deliberately NO jax.checkpoint on the body: grad-of-scan does save
    # every tile's (N, tile, E, M) intermediates (~1 GB at the bench
    # shape), but on v5e the chain is compute-bound — recomputing the
    # einsum per tile measured -12% end-to-end (53.0 -> 60.1 ms/step at
    # B=16), and the extra compilation detail costs a bone-length ulp
    # that the 4*pi/lambda phase amplifies (round-3 A/B on hardware)
    total, _ = lax.scan(
        body,
        jnp.zeros((n, e, m), x_raw.dtype), (w, row_valid),
    )
    return (total / t_out) ** 2  # (N, E, M)


def _scatter_bwd_core(lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c,
                      gre, gim):
    """Layout-agnostic elementwise backward of :func:`_scatter_fwd_core`:
    recompute the forward intermediates and differentiate the
    backscatter/phase chain. Returns per-element cotangent arrays; the
    layout wrappers own the reductions and concatenation."""
    k = 4.0 * np.pi / lam
    rx, ry, rz = sx - lx, sy - ly, sz - lz
    dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    ax, ay, az = lx - (sx + dx) * 0.5, ly - (sy + dy) * 0.5, lz - (sz + dz) * 0.5
    bx, by, bz = dx - sx, dy - sy, dz - sz
    dot = ax * bx + ay * by + az * bz
    na = jnp.sqrt(ax * ax + ay * ay + az * az)
    nb = jnp.sqrt(bx * bx + by * by + bz * bz)
    den = na * nb + 1e-6
    ct = dot / den
    ct2 = ct * ct
    u = (1.0 - ct2) + c * ct2
    au = jnp.abs(u)
    amp = jnp.sqrt(np.pi * c) / au
    phase = k * dist
    cosp, sinp = jnp.cos(phase), jnp.sin(phase)

    g_amp = gre * cosp + gim * sinp
    g_phase = amp * (gim * cosp - gre * sinp)
    g_dist = g_phase * k
    g_au = -(amp / au) * g_amp
    g_u = jnp.sign(u) * g_au
    g_ct = g_u * (2.0 * ct * (c - 1.0))
    g_c = g_u * ct2 + g_amp * jnp.where(c > 0, amp / (2.0 * c), 0.0)
    g_dot = g_ct / den
    g_den = g_ct * (-ct / den)
    inv_na = jnp.where(na > 0, 1.0 / jnp.where(na > 0, na, 1.0), 0.0)
    inv_nb = jnp.where(nb > 0, 1.0 / jnp.where(nb > 0, nb, 1.0), 0.0)
    inv_d = jnp.where(dist > 0, 1.0 / jnp.where(dist > 0, dist, 1.0), 0.0)
    g_ax = g_dot * bx + g_den * nb * ax * inv_na
    g_ay = g_dot * by + g_den * nb * ay * inv_na
    g_az = g_dot * bz + g_den * nb * az * inv_na
    g_bx = g_dot * ax + g_den * na * bx * inv_nb
    g_by = g_dot * ay + g_den * na * by * inv_nb
    g_bz = g_dot * az + g_den * na * bz * inv_nb
    g_rx, g_ry, g_rz = g_dist * rx * inv_d, g_dist * ry * inv_d, g_dist * rz * inv_d

    g_s = (g_rx - 0.5 * g_ax - g_bx,
           g_ry - 0.5 * g_ay - g_by,
           g_rz - 0.5 * g_az - g_bz)
    g_d = (-0.5 * g_ax + g_bx, -0.5 * g_ay + g_by, -0.5 * g_az + g_bz)
    g_l = (-g_rx + g_ax, -g_ry + g_ay, -g_rz + g_az)
    g_lam_e = (-k / lam) * (g_phase * dist)
    return g_s, g_d, g_c, g_l, g_lam_e


def _bwd_math(lam, lx, ly, lz, spos, dpos, c_row, gre, gim, em):
    """Shared hand-derived backward of :func:`_fwd_math` in the dense
    kernel's (TILE, EM) layout. Returns the endpoint-position cotangents
    ``g_src``/``g_dst`` ``(TILE, 3*EM)`` plus the reduced ``g_c``
    ``(EM,)``, ``g_loc`` scalars, and ``g_lam`` scalar for this tile."""
    sx, sy, sz = spos[:, :em], spos[:, em:2*em], spos[:, 2*em:]
    dx, dy, dz = dpos[:, :em], dpos[:, em:2*em], dpos[:, 2*em:]
    g_s, g_d, g_c, g_l, g_lam_e = _scatter_bwd_core(
        lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c_row[None, :], gre, gim
    )
    g_src = jnp.concatenate(g_s, axis=1)  # (TILE, 3*EM)
    g_dst = jnp.concatenate(g_d, axis=1)
    g_loc = (jnp.sum(g_l[0]), jnp.sum(g_l[1]), jnp.sum(g_l[2]))
    g_lam = jnp.sum(g_lam_e)
    return g_src, g_dst, jnp.sum(g_c, axis=0), g_loc, g_lam


def _bwd_math_t(lam, lx, ly, lz, spos, dpos, c_col, gre, gim, em):
    """Transposed twin of :func:`_bwd_math` (see :func:`_fwd_math_t`):
    operands are (3*EM, TILE); ``gre``/``gim`` broadcast as (1, TILE).
    Returns ``g_src``/``g_dst`` ``(3*EM, TILE)`` and ``g_c`` ``(EM,)``."""
    sx, sy, sz = spos[:em], spos[em:2*em], spos[2*em:]
    dx, dy, dz = dpos[:em], dpos[em:2*em], dpos[2*em:]
    g_s, g_d, g_c, g_l, g_lam_e = _scatter_bwd_core(
        lam, lx, ly, lz, sx, sy, sz, dx, dy, dz, c_col[:, None], gre, gim
    )
    g_src = jnp.concatenate(g_s, axis=0)  # (3*EM, TILE)
    g_dst = jnp.concatenate(g_d, axis=0)
    g_loc = (jnp.sum(g_l[0]), jnp.sum(g_l[1]), jnp.sum(g_l[2]))
    g_lam = jnp.sum(g_lam_e)
    return g_src, g_dst, jnp.sum(g_c, axis=1), g_loc, g_lam


def _radar_bwd_kernel(lam_ref, loc_ref, w_ref, src_ref, dst_ref, c_ref,
                      gre_ref, gim_ref,
                      dsrc_ref, ddst_ref, dc_ref, dloc_ref, dlam_ref):
    """Hand-derived backward of :func:`_radar_kernel`.

    Recomputes the forward intermediates for one (sample, time-tile) grid
    step, differentiates the backscatter/phase math on the VPU, and emits
    two MXU matmuls (``dsrc += W_tile^T @ g_src`` at HIGHEST — the phase
    cotangent chain needs f32-exact positions — and the amplitude-only
    ``ddst`` at the fast default). Scalar/row accumulators (``dc``,
    ``dloc``, ``dlam``) rely on the TPU grid executing sequentially; the
    resampling operator's cotangent is zero by contract.
    """
    i, j = pl.program_id(0), pl.program_id(1)
    em = c_ref.shape[-1]
    lam = lam_ref[0, 0]
    lx, ly, lz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]

    # ---- recompute forward intermediates (same precision split as fwd) ----
    spos = jnp.dot(
        w_ref[:], src_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dpos = jnp.dot(
        w_ref[:], dst_ref[0], preferred_element_type=jnp.float32,
    )
    gre = gre_ref[0, 0, 0, :][:, None]  # (TILE, 1)
    gim = gim_ref[0, 0, 0, :][:, None]
    g_src, g_dst, g_c_row, g_loc, g_lam = _bwd_math(
        lam, lx, ly, lz, spos, dpos, c_ref[0, 0], gre, gim, em
    )

    dsrc_tile = jnp.dot(
        w_ref[:].T, g_src, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (T_in, 3*EM)
    ddst_tile = jnp.dot(
        w_ref[:].T, g_dst, preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dsrc_ref[0] = jnp.zeros_like(dsrc_ref[0])
        ddst_ref[0] = jnp.zeros_like(ddst_ref[0])
        dc_ref[0, 0] = jnp.zeros_like(dc_ref[0, 0])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dloc_ref[0, 0] = 0.0
        dloc_ref[0, 1] = 0.0
        dloc_ref[0, 2] = 0.0
        dlam_ref[0, 0] = 0.0

    dsrc_ref[0] += dsrc_tile
    ddst_ref[0] += ddst_tile
    dc_ref[0, 0] += g_c_row
    dloc_ref[0, 0] += g_loc[0]
    dloc_ref[0, 1] += g_loc[1]
    dloc_ref[0, 2] += g_loc[2]
    dlam_ref[0, 0] += g_lam


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _kernel_op(w, src, dst, c, loc, lam, tile):
    """The pallas-kernel boundary: padded operator + gathered endpoint
    features + bone stats -> padded complex signal. ``custom_vjp`` with a
    hand-derived Pallas backward.

    Gradient contract: ``w`` (the resampling operator, a precomputed scipy
    constant) gets a ZERO cotangent — callers wrap it in
    ``lax.stop_gradient``; all trainable quantities flow through ``src``,
    ``dst``, ``c``, ``loc``, ``lam``.
    """
    return _kernel_fwd_impl(w, src, dst, c, loc, lam, tile)


def _kernel_fwd_impl(w, src, dst, c, loc, lam, tile):
    n, t_in, f = src.shape
    em = f // 3
    t_pad = w.shape[0]
    num_tiles = t_pad // tile
    lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    loc2 = jnp.asarray(loc, jnp.float32).reshape(1, 3)
    interpret = jax.default_backend() == "cpu"
    re, im = pl.pallas_call(
        _radar_kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, t_in), lambda i, j: (j, 0)),
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, num_tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((n, num_tiles, 1, tile), jnp.float32),
        ],
        interpret=interpret,
    )(lam2, loc2, w, src, dst, c.reshape(n, 1, em))
    return re.reshape(n, t_pad), im.reshape(n, t_pad)


def _kernel_vjp_fwd(w, src, dst, c, loc, lam, tile):
    out = _kernel_fwd_impl(w, src, dst, c, loc, lam, tile)
    return out, (w, src, dst, c, loc, lam)


def _kernel_vjp_bwd(tile, residuals, g):
    w, src, dst, c, loc, lam = residuals
    gre, gim = g
    n, t_in, f = src.shape
    em = f // 3
    t_pad = w.shape[0]
    num_tiles = t_pad // tile
    lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    loc2 = jnp.asarray(loc, jnp.float32).reshape(1, 3)
    interpret = jax.default_backend() == "cpu"
    dsrc, ddst, dc, dloc, dlam = pl.pallas_call(
        _radar_bwd_kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, t_in), lambda i, j: (j, 0)),
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_in, 3 * em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
            # scalar accumulators live in SMEM (Mosaic rejects scalar
            # stores to VMEM)
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t_in, 3 * em), jnp.float32),
            jax.ShapeDtypeStruct((n, t_in, 3 * em), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, em), jnp.float32),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        lam2, loc2, w, src, dst, c.reshape(n, 1, em),
        gre.reshape(n, num_tiles, 1, tile),
        gim.reshape(n, num_tiles, 1, tile),
    )
    return (
        jnp.zeros_like(w),  # resampling operator: constant by contract
        dsrc,
        ddst,
        dc.reshape(c.shape),
        dloc.reshape(np.shape(loc)),
        dlam.reshape(np.shape(lam)),
    )


_kernel_op.defvjp(_kernel_vjp_fwd, _kernel_vjp_bwd)


def _radar_fused_impl(x_raw, pad_operator, radar_location, wavelength,
                      src_idx, dst_idx, tile):
    from jax import lax

    t_out = pad_operator.shape[0]
    num_tiles = -(-t_out // tile)
    t_pad = num_tiles * tile

    src, dst = _gather_features(x_raw, src_idx, dst_idx)
    c = _bone_length_mean_sq(x_raw, pad_operator, src_idx, dst_idx, tile)

    w = lax.stop_gradient(
        jnp.pad(pad_operator, ((0, t_pad - t_out), (0, 0)))
    )
    re, im = _kernel_op(
        w, src, dst, c, jnp.asarray(radar_location, jnp.float32),
        jnp.asarray(wavelength, jnp.float32), tile,
    )
    return re[:, :t_out], im[:, :t_out]


def radar_return_fused(
    x_raw,
    pad_operator,
    radar_location,
    wavelength,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    tile: int = _TILE,
):
    """Fused-Pallas equivalent of
    :func:`..virtual_radar.radar_return_upsampled` (same signature and
    results up to f32 rounding).

    Fully differentiable w.r.t. the joints, radar location, and
    wavelength: the forward AND backward of the kernel stage are Pallas
    (the backward re-derives the backscatter math by hand and emits one
    MXU matmul per tile); the gather and bone-statistic stages chain via
    ordinary JAX autodiff. The resampling operator is treated as a
    constant (zero cotangent) — it is a precomputed scipy matrix."""
    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])
    return _radar_fused_impl(
        x_raw, pad_operator, radar_location, wavelength,
        src_idx, dst_idx, int(tile),
    )


# ---------------------------------------------------------------------------
# Spline-factorized variant: the dense (TILE, T_in) resampling contraction
# collapses to a (TILE, 4*NS) one (NS = spline segments under a tile, ~4 at
# the production 250x upsample), a ~19x matmul-FLOP cut, and the dense
# (T_out, T_in) operator (90MB at production shapes) never exists — only
# the per-tile monomial matrix (num_tiles, 4*NS, TILE — transposed so the
# kernels keep time on the 128-wide lane axis) and the gathered
# per-segment cubic coefficients do. See resample.spline_tile_plan.
# ---------------------------------------------------------------------------


def _radar_spline_kernel(lam_ref, loc_ref, e_ref, src_ref, dst_ref, c_ref,
                         re_ref, im_ref):
    """One (sample, time-tile) grid step of the spline-path forward.

    TRANSPOSED layout (see :func:`_fwd_math_t`): ``e_ref``
    (1, 4*NS, TILE) — per-row monomials with time on lanes;
    ``src_ref``/``dst_ref`` (1, 1, 3*EM, 4*NS) — this tile's gathered
    segment coefficients. The contraction emits (3*EM, TILE) directly,
    so the whole VPU chain runs with the 512-wide time axis on lanes
    (fully dense f32 registers) instead of EM=48 padded to 128. Both
    contractions are pinned HIGHEST — at width 4*NS the f32-exact passes
    cost ~nothing, and the src positions are phase-critical (see the
    dense kernel's precision note)."""
    em = c_ref.shape[-1]
    lam = lam_ref[0, 0]
    lx, ly, lz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    spos = jnp.dot(
        src_ref[0, 0], e_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3*EM, TILE)
    dpos = jnp.dot(
        dst_ref[0, 0], e_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    re_row, im_row = _fwd_math_t(
        lam, lx, ly, lz, spos, dpos, c_ref[0, 0], em
    )
    re_ref[0, 0, 0, :] = re_row
    im_ref[0, 0, 0, :] = im_row


def _radar_spline_bwd_kernel(lam_ref, loc_ref, e_ref, src_ref, dst_ref,
                             c_ref, gre_ref, gim_ref,
                             dsrc_ref, ddst_ref, dc_ref, dloc_ref,
                             dlam_ref):
    """Hand-derived backward of :func:`_radar_spline_kernel`.

    Each (i, j) grid step OWNS its (1, 1, 3*EM, 4*NS) coefficient-
    cotangent output block (unlike the dense kernel's ``+=`` into a
    shared (T_in, 3*EM) block), so the only sequential-grid accumulators
    left are the small ``dc``/``dloc``/``dlam`` reductions. Transposed
    layout throughout — see :func:`_radar_spline_kernel`."""
    i, j = pl.program_id(0), pl.program_id(1)
    em = c_ref.shape[-1]
    lam = lam_ref[0, 0]
    lx, ly, lz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    spos = jnp.dot(
        src_ref[0, 0], e_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3*EM, TILE)
    dpos = jnp.dot(
        dst_ref[0, 0], e_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gre = gre_ref[0, 0, 0, :][None, :]  # (1, TILE)
    gim = gim_ref[0, 0, 0, :][None, :]
    g_src, g_dst, g_c_row, g_loc, g_lam = _bwd_math_t(
        lam, lx, ly, lz, spos, dpos, c_ref[0, 0], gre, gim, em
    )
    # coefficient cotangents: contract the TILE (lane) axis of both
    # operands — g_src (3*EM, TILE) x e (4*NS, TILE) -> (3*EM, 4*NS)
    contract_t = (((1,), (1,)), ((), ()))
    dsrc_ref[0, 0] = jax.lax.dot_general(
        g_src, e_ref[0], contract_t,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ddst_ref[0, 0] = jax.lax.dot_general(
        g_dst, e_ref[0], contract_t,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == 0)
    def _():
        dc_ref[0, 0] = jnp.zeros_like(dc_ref[0, 0])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dloc_ref[0, 0] = 0.0
        dloc_ref[0, 1] = 0.0
        dloc_ref[0, 2] = 0.0
        dlam_ref[0, 0] = 0.0

    dc_ref[0, 0] += g_c_row
    dloc_ref[0, 0] += g_loc[0]
    dloc_ref[0, 1] += g_loc[1]
    dloc_ref[0, 2] += g_loc[2]
    dlam_ref[0, 0] += g_lam


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _spline_kernel_op(e, src, dst, c, loc, lam, tile):
    """Spline-path kernel boundary: monomial tiles + gathered coefficient
    tiles + bone stats -> padded complex signal.

    Gradient contract: ``e`` (the monomial evaluation constant,
    (num_tiles, 4*NS, TILE)) gets a ZERO cotangent; ``src``/``dst`` are
    the TILED coefficient tensors (N, num_tiles, 3*EM, 4*NS) whose
    cotangent flows back through the caller's (differentiable) gather +
    coefficient einsum."""
    return _spline_fwd_impl(e, src, dst, c, loc, lam, tile)


def _spline_fwd_impl(e, src, dst, c, loc, lam, tile):
    n = src.shape[0]
    num_tiles, ns4, _ = e.shape
    em = src.shape[-2] // 3
    lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    loc2 = jnp.asarray(loc, jnp.float32).reshape(1, 3)
    interpret = jax.default_backend() == "cpu"
    re, im = pl.pallas_call(
        _radar_spline_kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ns4, tile), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, num_tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((n, num_tiles, 1, tile), jnp.float32),
        ],
        interpret=interpret,
    )(lam2, loc2, e, src, dst, c.reshape(n, 1, em))
    return re.reshape(n, num_tiles * tile), im.reshape(n, num_tiles * tile)


def _spline_vjp_fwd(e, src, dst, c, loc, lam, tile):
    out = _spline_fwd_impl(e, src, dst, c, loc, lam, tile)
    return out, (e, src, dst, c, loc, lam)


def _spline_vjp_bwd(tile, residuals, g):
    e, src, dst, c, loc, lam = residuals
    gre, gim = g
    n = src.shape[0]
    num_tiles, ns4, _ = e.shape
    em = src.shape[-2] // 3
    lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    loc2 = jnp.asarray(loc, jnp.float32).reshape(1, 3)
    interpret = jax.default_backend() == "cpu"
    dsrc, ddst, dc, dloc, dlam = pl.pallas_call(
        _radar_spline_bwd_kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ns4, tile), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3 * em, ns4), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, em), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, num_tiles, 3 * em, ns4), jnp.float32),
            jax.ShapeDtypeStruct((n, num_tiles, 3 * em, ns4), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, em), jnp.float32),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        lam2, loc2, e, src, dst, c.reshape(n, 1, em),
        gre.reshape(n, num_tiles, 1, tile),
        gim.reshape(n, num_tiles, 1, tile),
    )
    return (
        jnp.zeros_like(e),  # monomial constant by contract
        dsrc,
        ddst,
        dc.reshape(c.shape),
        dloc.reshape(np.shape(loc)),
        dlam.reshape(np.shape(lam)),
    )


_spline_kernel_op.defvjp(_spline_vjp_fwd, _spline_vjp_bwd)


def _bone_length_mean_sq_spline(bcoef_tiled, e, t_out):
    """``c = (mean_t ||bone||)^2`` from the tiled BONE coefficients
    (= dst coefficients - src coefficients, by linearity of the
    resampler) — the padded bones are evaluated tile-by-tile in a scan
    and never materialized, and the dense operator is not needed at all.
    Pad rows of ``e`` are all-zero, so no validity mask is required.

    Transposed layout (matches the kernels): ``bcoef_tiled`` is
    (N, num_tiles, 3*EM, 4*NS) and ``e`` is (num_tiles, 4*NS, TILE), so
    the per-tile elementwise chain runs on (N, EM, TILE) arrays with the
    512-wide time axis on lanes — fully dense vector registers."""
    from jax import lax

    n, num_tiles, f, ns4 = bcoef_tiled.shape
    em = f // 3

    def body(acc, inputs):
        e_j, b_j = inputs  # (ns4, tile), (N, 3*EM, ns4)
        b = jnp.einsum(
            "nfk,kr->nfr", b_j, e_j,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(n, 3, em, -1)
        s = jnp.sum(b * b, axis=1)  # (N, EM, tile)
        # zero-gradient-at-zero norm: all-zero padded bodies are routine
        zero = s == 0
        length = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s)))
        return acc + jnp.sum(length, axis=-1), None

    # no jax.checkpoint on the body: see _bone_length_mean_sq — the
    # ~1 GB of saved scan residuals are cheaper than the recompute on
    # this compute-bound chain (measured -12%/step, round-3 A/B)
    total, _ = lax.scan(
        body,
        jnp.zeros((n, em), bcoef_tiled.dtype),
        (e, jnp.moveaxis(bcoef_tiled, 1, 0)),
    )
    return (total / t_out) ** 2  # (N, EM)


def radar_return_spline(
    x_raw,
    num_pad_frames: int,
    radar_location,
    wavelength,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    tile: int = _TILE,
    sigma: float = 3.0,
):
    """Spline-factorized fused radar return: numerically equivalent to
    :func:`radar_return_fused` with
    ``pad_operator = pad_frames_operator(T_in, num_pad_frames, sigma)``
    (same results up to f32 rounding; the factorization itself is exact
    in float64 — ``tests/test_ops.py::test_spline_tile_plan_matches_
    operator``), but the resampling contraction is ~19x narrower and the
    dense operator never exists on device.

    Fully differentiable w.r.t. the joints, radar location, and
    wavelength: the kernel stage carries a hand-derived Pallas backward
    emitting per-tile coefficient cotangents; the coefficient einsum and
    segment gather chain through ordinary JAX autodiff (the gather's
    transpose is the segment scatter-add).
    """
    from skeleton_action_recognition_tpu.ops.resample import (
        spline_tile_plan,
    )
    from jax import lax

    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])
    t_in = x_raw.shape[2]
    tile = int(tile)
    t_out = t_in * int(num_pad_frames)
    cc_np, tile_seg_np, ev_np = spline_tile_plan(
        t_in, int(num_pad_frames), tile, float(sigma)
    )
    num_tiles, _, ns4 = ev_np.shape
    nseg = t_in - 1

    src, dst = _gather_features(x_raw, src_idx, dst_idx)  # (N, T_in, 3EM)
    n, _, f = src.shape
    cc = jnp.asarray(cc_np)
    hi = jax.lax.Precision.HIGHEST
    scoef_s = jnp.einsum("qt,ntf->nqf", cc, src, precision=hi)
    scoef_d = jnp.einsum("qt,ntf->nqf", cc, dst, precision=hi)
    # transposed tiling for the kernels: (N, num_tiles, 3*EM, 4*NS),
    # so the kernel contraction emits time-on-lanes (3*EM, TILE) blocks
    # (see _fwd_math_t); the swap is one cheap XLA copy of ~50 MB and
    # its autodiff transpose chains back through the gather untouched
    gather = lambda s: (
        s.reshape(n, nseg, 4, f)[:, tile_seg_np]
        .reshape(n, num_tiles, ns4, f)
        .swapaxes(2, 3)
    )
    tiled_s, tiled_d = gather(scoef_s), gather(scoef_d)
    e = lax.stop_gradient(
        jnp.asarray(np.ascontiguousarray(ev_np.swapaxes(1, 2)))
    )

    c = _bone_length_mean_sq_spline(tiled_d - tiled_s, e, t_out)
    re, im = _spline_kernel_op(
        e, tiled_s, tiled_d, c,
        jnp.asarray(radar_location, jnp.float32),
        jnp.asarray(wavelength, jnp.float32), tile,
    )
    return re[:, :t_out], im[:, :t_out]
