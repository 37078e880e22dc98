"""Fused training-mode temporal-conv Pallas kernel.

The ST-GCN block's temporal chain (``BN -> ReLU -> Conv[9,1] -> BN``,
reference ``models/stgcn.py:26-38``) is HBM-bound in training: XLA
materializes the normalized activation, the ReLU output, and the conv
output as separate HBM tensors and reads the conv output twice more for
the second BatchNorm's statistics (~8 full passes). This kernel computes

    ``u = conv9x1(relu(s * scale + shift)) + bias``            (per tile)
    ``sum2, sumsq2 = per-channel running sums of u``           (fused)

in ONE pass over ``s`` — the pre-ReLU affine (the first BatchNorm's
normalize, folded by the caller into per-channel ``scale``/``shift``),
the ReLU, the 9-tap temporal conv, and the second BatchNorm's statistics
all happen in VMEM; only ``u`` returns to HBM.

Two layout tricks:

* with activations flattened to ``(NM, T*V, C)`` rows, a temporal shift
  of ``dt`` frames is a row shift of ``dt*V`` — so the 9-tap conv is ONE
  MXU matmul against the tap-concatenated weight ``W_all (C, 9*C)``
  followed by 9 statically-shifted VPU adds, instead of 9 skinny
  matmuls;
* the 4-frame halo each tile needs arrives as two extra *blocked* input
  streams of the same array (small halo-sized blocks whose index maps
  clamp at the sequence edges), so the Pallas pipeline double-buffers
  everything and no manual DMA alignment constraints apply. Clamped
  edge halos are zeroed in-kernel (SAME padding).

Backward is a second hand-derived kernel (same tiling): it recomputes
``h = relu(affine(s))`` from ``s``, folds the statistics cotangents into
``g_u_eff = g_u + g_sum2 + 2*u*g_sumsq2``, computes ``g_s`` via the
transposed-tap matmul, and accumulates ``dW/dbias/dscale/dshift`` in
f32 accumulators across the sequential TPU grid.

Used by :class:`..models.stgcn.FusedTemporalConv` (stride-1 blocks; the
two stride-2 blocks keep the stock XLA path). Parity with the unfused
flax chain — outputs AND batch statistics — is pinned in
``tests/test_pallas_tconv.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_t_tile(t: int, c: int, ks: int, v: int) -> int:
    """Largest divisor of ``t`` that has a sub-divisor >= the halo (so
    halo blocks exist) and keeps the f32 tap-product buffer
    ``(t_tile + 2*hb) * v x ks * c`` under ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024
    halo = ks // 2
    best = None
    for cand in range(1, t + 1):
        if t % cand:
            continue
        hb = _halo_block(cand, halo)
        if hb is None:
            continue
        if (cand + 2 * hb) * v * ks * c * 4 <= budget:
            best = cand
    if best is None:
        raise ValueError(f"no usable t_tile for t={t}, c={c}")
    return best


def _halo_block(t_tile: int, halo: int):
    """Smallest divisor of ``t_tile`` >= ``halo`` (halo-stream block)."""
    for hb in range(halo, t_tile + 1):
        if t_tile % hb == 0:
            return hb
    return None


def _assemble_ext(lo_ref, cur_ref, hi_ref, i, nt, *, hb, halo, v, c):
    """Concatenate [last ``halo`` frames of lo | core | first ``halo``
    frames of hi]; returns the tile and a ``(rows, 1)`` validity mask
    that is 0 on edge-clamped halo rows (the conv's SAME zero padding —
    it must be applied POST-affine, since ``relu(0*scale+shift) != 0``)."""
    x = jnp.concatenate(
        [
            lo_ref[0][(hb - halo) * v :, :],
            cur_ref[0],
            hi_ref[0][: halo * v, :],
        ],
        axis=0,
    )
    rows = x.shape[0]
    core_rows = rows - 2 * halo * v
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    invalid = ((r < halo * v) & (i == 0)) | (
        (r >= halo * v + core_rows) & (i == nt - 1)
    )
    return x, jnp.where(invalid, 0.0, 1.0).astype(jnp.float32)


def _fwd_kernel(
    s_lo, s_cur, s_hi, scale_ref, shift_ref, wall_ref, b_ref,
    u_ref, sum_ref, sumsq_ref,
    *, t_tile: int, hb: int, v: int, ks: int, out_dtype,
):
    n, i = pl.program_id(0), pl.program_id(1)
    nt = pl.num_programs(1)
    c = scale_ref.shape[-1]
    halo = ks // 2
    core_rows = t_tile * v

    x, valid = _assemble_ext(
        s_lo, s_cur, s_hi, i, nt, hb=hb, halo=halo, v=v, c=c
    )
    h = (
        jnp.maximum(
            x.astype(jnp.float32) * scale_ref[0] + shift_ref[0], 0.0
        )
        * valid
    )
    # one wide MXU matmul: p[r, dt*C+co] = h[r] @ W[dt]
    p = jnp.dot(
        h.astype(wall_ref.dtype), wall_ref[:],
        preferred_element_type=jnp.float32,
    )
    u = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (core_rows, c)
    )
    for dt in range(ks):
        u = u + p[dt * v : dt * v + core_rows, dt * c : (dt + 1) * c]
    u16 = u.astype(out_dtype)
    u_ref[0] = u16

    uf = u16.astype(jnp.float32)
    part_sum = jnp.sum(uf, axis=0, keepdims=True)
    part_sq = jnp.sum(uf * uf, axis=0, keepdims=True)

    @pl.when((n == 0) & (i == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    sum_ref[:] = sum_ref[:] + part_sum
    sumsq_ref[:] = sumsq_ref[:] + part_sq


def _bwd_kernel(
    s_lo, s_cur, s_hi, u_lo, u_cur, u_hi, gu_lo, gu_cur, gu_hi,
    scale_ref, shift_ref, wtall_ref, gsum_ref, gsumsq_ref,
    gs_ref, dwall_ref, dscale_ref, dshift_ref, dbias_ref,
    *, t_tile: int, hb: int, v: int, ks: int,
):
    n, i = pl.program_id(0), pl.program_id(1)
    nt = pl.num_programs(1)
    c = scale_ref.shape[-1]
    halo = ks // 2
    core_rows = t_tile * v
    halo_rows = halo * v

    sx, valid = _assemble_ext(
        s_lo, s_cur, s_hi, i, nt, hb=hb, halo=halo, v=v, c=c
    )
    ux, _ = _assemble_ext(
        u_lo, u_cur, u_hi, i, nt, hb=hb, halo=halo, v=v, c=c
    )
    gux, _ = _assemble_ext(
        gu_lo, gu_cur, gu_hi, i, nt, hb=hb, halo=halo, v=v, c=c
    )
    sx = sx.astype(jnp.float32)

    h = (
        jnp.maximum(sx * scale_ref[0] + shift_ref[0], 0.0) * valid
    )
    mask = (h > 0.0).astype(jnp.float32)
    # stats cotangents fold into an effective conv-output gradient;
    # edge-clamped halo rows don't exist in the sequence -> mask
    gue = (
        gux.astype(jnp.float32)
        + gsum_ref[0].astype(jnp.float32)
        + 2.0 * ux.astype(jnp.float32)
        * gsumsq_ref[0].astype(jnp.float32)
    ) * valid

    h16 = h.astype(wtall_ref.dtype)
    gue16 = gue.astype(wtall_ref.dtype)

    # g_h[r] = sum_e gue[r + (e - halo)*V] @ W[ks-1-e]^T — the forward's
    # shifted form with taps reversed and transposed
    q = jnp.dot(
        gue16, wtall_ref[:], preferred_element_type=jnp.float32
    )
    gh = jnp.zeros((core_rows, c), jnp.float32)
    for e in range(ks):
        gh = gh + q[e * v : e * v + core_rows, e * c : (e + 1) * c]

    mask_core = mask[halo_rows : halo_rows + core_rows]
    ghm = gh * mask_core
    gs = ghm * scale_ref[0].astype(jnp.float32)
    gs_ref[0] = gs.astype(gs_ref.dtype)

    # dW[dt] += h_ext[shifted]^T @ gue_core: stack the ks shifted h views
    # horizontally, contract rows in ONE (ks*C, core)x(core, C) matmul
    h_all = jnp.concatenate(
        [h16[dt * v : dt * v + core_rows, :] for dt in range(ks)],
        axis=1,
    )
    gue_core = gue16[halo_rows : halo_rows + core_rows]
    dw_part = jax.lax.dot_general(
        h_all, gue_core,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    s_core = sx[halo_rows : halo_rows + core_rows]
    dscale_part = jnp.sum(ghm * s_core, axis=0, keepdims=True)
    dshift_part = jnp.sum(ghm, axis=0, keepdims=True)
    dbias_part = jnp.sum(
        gue[halo_rows : halo_rows + core_rows], axis=0, keepdims=True
    )

    @pl.when((n == 0) & (i == 0))
    def _():
        dwall_ref[:] = jnp.zeros_like(dwall_ref)
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dshift_ref[:] = jnp.zeros_like(dshift_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dwall_ref[:] = dwall_ref[:] + dw_part
    dscale_ref[:] = dscale_ref[:] + dscale_part
    dshift_ref[:] = dshift_ref[:] + dshift_part
    dbias_ref[:] = dbias_ref[:] + dbias_part


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _halo_specs(t_tile: int, hb: int, v: int, c: int, nt: int):
    """(lo, cur, hi) BlockSpecs over a ``(NM, T*V, C)`` array: the core
    tile plus two ``hb``-frame halo streams with edge-clamped indices."""
    rb = t_tile // hb

    def lo_map(n, i):
        return (n, jnp.maximum(i * rb - 1, 0), 0)

    def hi_map(n, i):
        return (n, jnp.minimum(i * rb + rb, nt * rb - 1), 0)

    lo = pl.BlockSpec(
        (1, hb * v, c), lo_map, memory_space=pltpu.VMEM
    )
    cur = pl.BlockSpec(
        (1, t_tile * v, c), lambda n, i: (n, i, 0),
        memory_space=pltpu.VMEM,
    )
    hi = pl.BlockSpec(
        (1, hb * v, c), hi_map, memory_space=pltpu.VMEM
    )
    return lo, cur, hi


def _vec_spec(c: int, rows: int = 1):
    return pl.BlockSpec(
        (rows, c), lambda n, i: (0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def affine_relu_tconv(s, scale, shift, kernel, bias, v: int, ks: int):
    """``u = conv9x1(relu(s*scale + shift)) + bias`` with fused second-BN
    statistics, as one Pallas pass over ``s``.

    Args:
      s: ``(NM, T, V, C)`` activations (f32 or bf16; compute is f32
        affine -> bf16 matmul -> f32 accumulate).
      scale, shift: ``(C,)`` folded BatchNorm affine.
      kernel: ``(ks, 1, C, C)`` flax HWIO temporal-conv weights.
      bias: ``(C,)`` conv bias.
      v: joints per frame (static).
      ks: temporal taps (static, odd).

    Returns:
      ``(u, sum2, sumsq2)`` — ``u (NM, T, V, C)`` in ``s.dtype``, and the
      per-channel sums ``sum(u)`` / ``sum(u*u)`` over all rows (f32),
      from which the caller derives the second BatchNorm's batch
      statistics without re-reading ``u``.
    """
    return _fwd_impl(s, scale, shift, kernel, bias, v, ks)


def _fwd_impl(s, scale, shift, kernel, bias, v, ks):
    nm, t, v_, c = s.shape
    assert v_ == v and kernel.shape == (ks, 1, c, c), (
        s.shape, kernel.shape,
    )
    t_tile = _pick_t_tile(t, c, ks, v)
    hb = _halo_block(t_tile, ks // 2)
    nt = t // t_tile
    out_dtype = s.dtype

    s3 = s.reshape(nm, t * v, c)
    # matmul precision follows the activation dtype: bf16 activations ->
    # bf16 MXU operands (f32 accumulate), f32 activations -> exact f32
    mm_dtype = (
        jnp.bfloat16 if s.dtype == jnp.bfloat16 else jnp.float32
    )
    # W_all[ci, dt*C + co] = kernel[dt, 0, ci, co]
    wall = jnp.transpose(kernel[:, 0], (1, 0, 2)).reshape(
        c, ks * c
    ).astype(mm_dtype)
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    shift2 = shift.reshape(1, c).astype(jnp.float32)
    bias2 = bias.reshape(1, c).astype(jnp.float32)

    lo, cur, hi = _halo_specs(t_tile, hb, v, c, nt)
    kern = functools.partial(
        _fwd_kernel, t_tile=t_tile, hb=hb, v=v, ks=ks,
        out_dtype=out_dtype,
    )
    u, s2, ss2 = pl.pallas_call(
        kern,
        grid=(nm, nt),
        in_specs=[
            lo, cur, hi,
            _vec_spec(c), _vec_spec(c),
            pl.BlockSpec(
                (c, ks * c), lambda n, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            _vec_spec(c),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, t_tile * v, c), lambda n, i: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            _vec_spec(c),
            _vec_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nm, t * v, c), out_dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(s3, s3, s3, scale2, shift2, wall, bias2)
    return u.reshape(nm, t, v, c), s2[0], ss2[0]


def _vjp_fwd(s, scale, shift, kernel, bias, v, ks):
    out = _fwd_impl(s, scale, shift, kernel, bias, v, ks)
    return out, (s, scale, shift, kernel, bias, out[0])


def _vjp_bwd(v, ks, res, cotangents):
    s, scale, shift, kernel, bias, u = res
    g_u, g_s2, g_ss2 = cotangents
    nm, t, v_, c = s.shape
    t_tile = _pick_t_tile(t, c, ks, v)
    hb = _halo_block(t_tile, ks // 2)
    nt = t // t_tile

    mm_dtype = (
        jnp.bfloat16 if s.dtype == jnp.bfloat16 else jnp.float32
    )
    s3 = s.reshape(nm, t * v, c)
    u3 = u.reshape(nm, t * v, c)
    gu3 = g_u.reshape(nm, t * v, c).astype(u.dtype)
    # WT_all[co, e*C + ci] = kernel[ks-1-e, 0, ci, co]
    wt = jnp.transpose(kernel[::-1, 0], (2, 0, 1)).reshape(
        c, ks * c
    ).astype(mm_dtype)
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    shift2 = shift.reshape(1, c).astype(jnp.float32)
    gsum2 = g_s2.reshape(1, c).astype(jnp.float32)
    gsumsq2 = g_ss2.reshape(1, c).astype(jnp.float32)

    lo, cur, hi = _halo_specs(t_tile, hb, v, c, nt)
    kern = functools.partial(
        _bwd_kernel, t_tile=t_tile, hb=hb, v=v, ks=ks
    )
    gs, dwall, dscale, dshift, dbias = pl.pallas_call(
        kern,
        grid=(nm, nt),
        in_specs=[
            lo, cur, hi,
            lo, cur, hi,
            lo, cur, hi,
            _vec_spec(c), _vec_spec(c),
            pl.BlockSpec(
                (c, ks * c), lambda n, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            _vec_spec(c), _vec_spec(c),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, t_tile * v, c), lambda n, i: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ks * c, c), lambda n, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            _vec_spec(c), _vec_spec(c), _vec_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nm, t * v, c), s.dtype),
            jax.ShapeDtypeStruct((ks * c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(s3, s3, s3, u3, u3, u3, gu3, gu3, gu3,
      scale2, shift2, wt, gsum2, gsumsq2)

    g_s = gs.reshape(nm, t, v, c).astype(s.dtype)
    # dwall rows are dt*C+ci, cols co -> flax kernel layout (ks,1,C,C)
    g_kernel = dwall.reshape(ks, c, c)[:, None].astype(kernel.dtype)
    return (
        g_s,
        dscale[0].astype(scale.dtype),
        dshift[0].astype(shift.dtype),
        g_kernel,
        dbias[0].astype(bias.dtype),
    )


affine_relu_tconv.defvjp(_vjp_fwd, _vjp_bwd)
