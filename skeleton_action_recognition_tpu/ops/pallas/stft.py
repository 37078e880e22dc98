"""Fused Pallas STFT + complex recombination + log-magnitude.

The XLA spectrogram path (``ops/stft.py`` + ``log_magnitude``) is three
HBM-materialized stages at radar shapes (B=16, T=75k, n_fft=256, hop=16):
the polyphase framing im2col (2B, frames, n_fft) ~154 MB, the stacked
basis contraction (2B, 2F, frames) ~307 MB, and the (re, im) pair
~154 MB — all for a 9.6 MB signal and a 77 MB spectrogram. The backward
replays the same traffic in reverse (cotangent quadrant scatter +
overlap-add framing transpose). This kernel keeps the whole chain in
VMEM: each grid step builds one (TILE, n_fft) frame block from the raw
signal row via aligned polyphase reshapes (frame ``i = k*q + r`` starts
at ``n_fft*q + hop*r``, so the fixed-``r`` subset of a block is ONE
contiguous (Q, n_fft) reshape — no gather), runs ONE
``(TILE, 2*n_fft) x (2*n_fft, 2F)`` MXU contraction whose operand packs
(re, im) on the contraction axis and whose result packs (Re_out, Im_out)
on the lane axis (the complex-STFT identity of
``/root/reference/layers/virtual_radar.py:27-34`` folded into a static
block matrix), and writes only the log-magnitude block to HBM. The
fftshift roll of ``log_magnitude`` is free: it is a static row
permutation of the bases.

The backward is the same tiling run in reverse with a hand-derived VJP:
recompute the frame block and the forward contraction from the (tiny)
signal residual, form the magnitude cotangents in VMEM, apply the
transposed block-basis matmul, and overlap-add the frame cotangents back
into the signal gradient — the inter-block overlap (``n_fft - hop``
samples) rides a VMEM carry scratch across the sequential TPU grid, so
the 154 MB frame-cotangent tensor never exists.

Gradient contract: differentiable in the complex signal ``(re, im)``
only; the bases get ZERO cotangents (callers route
``train_stft_kernel=True`` configs to the XLA path).

Parity with ``stft_complex`` + ``log_magnitude`` — forward values and
``(re, im)`` gradients — is pinned in ``tests/test_pallas_stft.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


def _plan(t: int, n_fft: int, hop: int, center: bool):
    """Static tiling plan shared by forward and backward."""
    if n_fft % hop:
        raise ValueError("pallas stft requires hop | n_fft")
    if n_fft % 128 or (n_fft // hop) < 1:
        raise ValueError("pallas stft requires 128 | n_fft")
    k = n_fft // hop
    tile = k * max(1, 256 // k)  # frames per block, multiple of k
    t_pad = t + (n_fft if center else 0)
    frames = (t_pad - n_fft) // hop + 1
    n_blocks = -(-frames // tile)
    # the backward writes n_blocks*tile*hop signal columns; the final
    # (n_fft - hop)-sample spill must land inside them, not in the carry
    while n_blocks * tile * hop < t_pad:
        n_blocks += 1
    seg = tile * hop  # signal samples owned by one block
    lslice = _roundup(seg + n_fft, 128)  # per-block base slice length
    t_sig = (n_blocks - 1) * seg + lslice
    return k, tile, frames, n_blocks, seg, lslice, t_sig


def _pack_bases(cos, sin, f: int, fftshift: bool):
    """Forward/backward block-basis matrices with fftshift pre-rolled.

    ``kf = [[Ct, -St], [St, Ct]]`` of shape ``(2*n_fft, 2F)`` so that
    ``[fr_re | fr_im] @ kf = [Re_out | Im_out]`` (the reference's
    complex-STFT recombination); ``kb`` is its per-quadrant transpose
    for the frame cotangents."""
    if fftshift:
        cos = jnp.roll(cos, f // 2, axis=0)
        sin = jnp.roll(sin, f // 2, axis=0)
    ct, st = cos.T, sin.T  # (n_fft, F)
    kf = jnp.concatenate(
        [
            jnp.concatenate([ct, -st], axis=1),
            jnp.concatenate([st, ct], axis=1),
        ],
        axis=0,
    )
    kb = jnp.concatenate(
        [
            jnp.concatenate([cos, sin], axis=1),
            jnp.concatenate([-sin, cos], axis=1),
        ],
        axis=0,
    )  # (2F, 2*n_fft)
    return kf, kb


def _frame_block(sig_ref, start, k: int, tile: int, n_fft: int,
                 hop: int, lslice: int):
    """(TILE, n_fft) frame block from a (1, T_sig) signal row in VMEM.

    Frame ``i = k*q + r`` (q = i // k, r = i % k) starts at sample
    ``n_fft*q + hop*r``: for fixed ``r`` the Q frames are one contiguous
    ``(Q, n_fft)`` reshape of the base slice — each of the k parts is an
    aligned-width slice + reshape, interleaved back on the sublane axis."""
    q = tile // k
    base = sig_ref[0, :, pl.ds(start, lslice)]  # (1, lslice)
    segs = [
        base[:, hop * r : hop * r + q * n_fft].reshape(q, n_fft)
        for r in range(k)
    ]
    return jnp.stack(segs, axis=1).reshape(tile, n_fft)


def _fwd_kernel(sig_re_ref, sig_im_ref, kf_ref, out_ref, *,
                k, tile, n_fft, hop, lslice, seg, f, eps):
    blk = pl.program_id(1)
    start = pl.multiple_of(blk * seg, seg)
    fr_re = _frame_block(sig_re_ref, start, k, tile, n_fft, hop, lslice)
    fr_im = _frame_block(sig_im_ref, start, k, tile, n_fft, hop, lslice)
    x = jnp.concatenate([fr_re, fr_im], axis=1)  # (TILE, 2*n_fft)
    y = jnp.dot(x, kf_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    re_o, im_o = y[:, :f], y[:, f:]
    mag = jnp.sqrt(re_o * re_o + im_o * im_o)
    out_ref[0] = jnp.log(mag + eps)


def _overlap_add(d_fr, carry_ref, out_ref, blk, *, k, tile, n_fft,
                 hop, lslice, seg):
    """Scatter one block's frame cotangents back onto the signal axis.

    The within-block overlap-add is k static padded adds over a
    (1, lslice) accumulator; the (lslice - seg)-sample spill into the
    next block's region rides the VMEM carry across the sequential
    grid."""
    q = tile // k
    d3 = d_fr.reshape(q, k, n_fft)
    acc = jnp.zeros((1, lslice), jnp.float32)
    for r in range(k):
        part = d3[:, r, :].reshape(1, q * n_fft)
        acc = acc + jnp.pad(
            part, ((0, 0), (hop * r, lslice - hop * r - q * n_fft))
        )

    @pl.when(blk == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    spill = lslice - seg
    out_ref[0, 0] = acc[:, :seg] + jnp.pad(
        carry_ref[:], ((0, 0), (0, seg - spill))
    )
    carry_ref[:] = acc[:, seg:]


def _bwd_kernel(sig_re_ref, sig_im_ref, kf_ref, kb_ref, g_ref,
                dre_ref, dim_ref, carry_re, carry_im, *,
                k, tile, n_fft, hop, lslice, seg, f, eps):
    blk = pl.program_id(1)
    start = pl.multiple_of(blk * seg, seg)
    # recompute the forward block from the (tiny) signal residual
    fr_re = _frame_block(sig_re_ref, start, k, tile, n_fft, hop, lslice)
    fr_im = _frame_block(sig_im_ref, start, k, tile, n_fft, hop, lslice)
    x = jnp.concatenate([fr_re, fr_im], axis=1)
    y = jnp.dot(x, kf_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    re_o, im_o = y[:, :f], y[:, f:]
    mag2 = re_o * re_o + im_o * im_o
    mag = jnp.sqrt(mag2)
    # d log(mag + eps) / d re = re / (mag * (mag + eps)); zero-magnitude
    # bins (zero-padded frames) get a zero, not NaN, cotangent
    inv = jnp.where(mag2 > 0.0, 1.0 / (mag * (mag + eps) + 1e-30), 0.0)
    g = g_ref[0] * inv
    gx = jnp.concatenate([g * re_o, g * im_o], axis=1)  # (TILE, 2F)
    d = jnp.dot(gx, kb_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    _overlap_add(
        d[:, :n_fft], carry_re, dre_ref, blk,
        k=k, tile=tile, n_fft=n_fft, hop=hop, lslice=lslice, seg=seg,
    )
    _overlap_add(
        d[:, n_fft:], carry_im, dim_ref, blk,
        k=k, tile=tile, n_fft=n_fft, hop=hop, lslice=lslice, seg=seg,
    )


def _pad_signal(re, im, t_sig: int, n_fft: int, center: bool):
    if center:
        pad = n_fft // 2
        re = jnp.pad(re, ((0, 0), (pad, pad)), mode="reflect")
        im = jnp.pad(im, ((0, 0), (pad, pad)), mode="reflect")
    ztail = t_sig - re.shape[1]
    re = jnp.pad(re, ((0, 0), (0, ztail)))
    im = jnp.pad(im, ((0, 0), (0, ztail)))
    return re, im


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _stft_logmag(re, im, cos, sin, hop, eps, fftshift, center):
    return _fwd_impl(re, im, cos, sin, hop, eps, fftshift, center)


def _fwd_impl(re, im, cos, sin, hop, eps, fftshift, center):
    n, t = re.shape
    f, n_fft = cos.shape
    k, tile, frames, n_blocks, seg, lslice, t_sig = _plan(
        t, n_fft, hop, center
    )
    re_p, im_p = _pad_signal(re, im, t_sig, n_fft, center)
    kf, _ = _pack_bases(cos, sin, f, fftshift)
    interpret = jax.default_backend() == "cpu"
    # signal rows carry a singleton sublane axis so the per-row block's
    # dim -2 equals the array's (Mosaic requires block dims -2/-1 to be
    # (8, 128)-divisible or full)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, k=k, tile=tile, n_fft=n_fft, hop=hop,
            lslice=lslice, seg=seg, f=f, eps=eps,
        ),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, t_sig), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, t_sig), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((2 * n_fft, 2 * f), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, f), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_blocks * tile, f), jnp.float32
        ),
        interpret=interpret,
    )(re_p[:, None], im_p[:, None], kf)
    # (N, frames, F) -> the XLA path's (N, F, frames)
    return jnp.swapaxes(out[:, :frames, :], 1, 2)


def _vjp_fwd(re, im, cos, sin, hop, eps, fftshift, center):
    return _fwd_impl(re, im, cos, sin, hop, eps, fftshift, center), (
        re, im, cos, sin,
    )


def _vjp_bwd(hop, eps, fftshift, center, residuals, g):
    re, im, cos, sin = residuals
    n, t = re.shape
    f, n_fft = cos.shape
    k, tile, frames, n_blocks, seg, lslice, t_sig = _plan(
        t, n_fft, hop, center
    )
    re_p, im_p = _pad_signal(re, im, t_sig, n_fft, center)
    kf, kb = _pack_bases(cos, sin, f, fftshift)
    g_fr = jnp.swapaxes(g, 1, 2)  # (N, frames, F)
    g_fr = jnp.pad(
        g_fr, ((0, 0), (0, n_blocks * tile - frames), (0, 0))
    )
    interpret = jax.default_backend() == "cpu"
    spill = lslice - seg
    dre_p, dim_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, k=k, tile=tile, n_fft=n_fft, hop=hop,
            lslice=lslice, seg=seg, f=f, eps=eps,
        ),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, t_sig), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, t_sig), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((2 * n_fft, 2 * f), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * f, 2 * n_fft), lambda i, j: (0, 0)),
            pl.BlockSpec((1, tile, f), lambda i, j: (i, j, 0)),
        ],
        # per-block signal-gradient rows also ride a singleton sublane
        # axis (same Mosaic block-shape rule as the forward's inputs)
        out_specs=[
            pl.BlockSpec((1, 1, 1, seg), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, seg), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n_blocks, 1, seg), jnp.float32),
            jax.ShapeDtypeStruct((n, n_blocks, 1, seg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, spill), jnp.float32),
            pltpu.VMEM((1, spill), jnp.float32),
        ],
        interpret=interpret,
    )(re_p[:, None], im_p[:, None], kf, kb, g_fr)
    dre_p = dre_p.reshape(n, n_blocks * seg)
    dim_p = dim_p.reshape(n, n_blocks * seg)

    def unpad(dp):
        t_pad = t + (n_fft if center else 0)
        dp = dp[:, :t_pad]
        if not center:
            return dp
        p = n_fft // 2
        d = dp[:, p:-p]
        d = d.at[:, 1 : p + 1].add(jnp.flip(dp[:, :p], -1))
        d = d.at[:, t - p - 1 : t - 1].add(jnp.flip(dp[:, -p:], -1))
        return d

    return (
        unpad(dre_p),
        unpad(dim_p),
        jnp.zeros_like(cos),  # bases: constant by contract (see module
        jnp.zeros_like(sin),  # docstring) — trainable-basis configs use
    )                         # the XLA path


_stft_logmag.defvjp(_vjp_fwd, _vjp_bwd)


def stft_logmag(re, im, hop: int, cos, sin, *, eps: float = 1e-6,
                fftshift: bool = True, center: bool = True):
    """Fused ``stft_complex`` + ``log_magnitude`` (see module docstring).

    Args:
      re, im: ``(N, T)`` complex radar signal as two real channels.
      hop: frame stride; must divide ``n_fft``.
      cos, sin: ``(F, n_fft)`` windowed Fourier bases
        (:func:`..stft.stft_basis`). Treated as constants for autodiff.

    Returns:
      ``(N, F, T // hop + 1)`` log-magnitude spectrogram, numerically
      matching ``log_magnitude(*stft_complex(re, im, hop, cos, sin))``.
    """
    return _stft_logmag(
        re, im, cos, sin, hop, float(eps), bool(fftshift), bool(center)
    )
