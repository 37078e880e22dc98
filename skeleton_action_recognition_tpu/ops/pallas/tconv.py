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

Three layout decisions, each forced by a Mosaic constraint observed on
v5e:

* activations are flattened to ``(NM, T*VP, C)`` rows with the joint
  axis zero-padded from ``V`` to ``VP = roundup8(V)``: a temporal shift
  of ``dt`` frames is then a row shift of ``dt*VP`` — a *sublane-aligned*
  offset (dynamic/static row offsets must be provably 8-aligned) — so
  the 9-tap conv is ONE wide MXU matmul against the tap-concatenated
  weight ``W_all (C, 9*C)`` plus 9 statically-shifted VPU adds;
* each tile's 4-frame halo arrives as two extra small *blocked* input
  streams of the same array whose index maps clamp at the sequence
  edges (block second-minor dims must be 8-divisible or full-size —
  satisfied by the VP padding; edge-clamped halos are masked in-kernel
  post-affine, because ``relu(0*scale+shift) != 0``);
* tile sizes keep every in-kernel value under a few MB — the Mosaic
  stack allocator does not free values across unrolled loop iterations,
  and the v5e scoped-vmem limit is 16 MB.

Backward is a second hand-derived kernel (same tiling): the XLA caller
folds the statistics cotangents into ``g_u_eff = g_u + g_sum2 +
2*u*g_sumsq2`` (one fused elementwise pass), the kernel recomputes
``h = relu(affine(s))`` from ``s``, produces ``g_s`` via the
transposed-tap matmul, and accumulates ``dW/dbias/dscale/dshift`` in f32
across the (sequential) TPU grid.

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


def _roundup8(v: int) -> int:
    return -(-v // 8) * 8


def _halo_block(t_tile: int, halo: int):
    """Smallest divisor of ``t_tile`` >= ``halo`` (halo-stream block)."""
    for hb in range(halo, t_tile + 1):
        if t_tile % hb == 0:
            return hb
    return None


def _pick_t_tile(t: int, c: int, ks: int, vp: int) -> int:
    """Largest divisor of ``t`` with a valid halo sub-block that keeps
    the f32 tap-product value ``(t_tile + ks - 1) * vp x ks * c`` under
    ~4 MB of VMEM."""
    budget = 4 * 1024 * 1024
    best = None
    for cand in range(1, t + 1):
        if t % cand:
            continue
        if _halo_block(cand, ks // 2) is None:
            continue
        if (cand + ks - 1) * vp * ks * c * 4 <= budget:
            best = cand
    if best is None:
        raise ValueError(f"no usable t_tile for t={t}, c={c}")
    return best


def _halo_specs(t_tile: int, hb: int, vp: int, c: int, nt: int):
    """(lo, cur, hi) BlockSpecs over a ``(NM, T*VP, C)`` array: the core
    tile plus two ``hb``-frame halo streams with edge-clamped indices."""
    rb = t_tile // hb

    lo = pl.BlockSpec(
        (1, hb * vp, c),
        lambda n, i: (n, jnp.maximum(i * rb - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    cur = pl.BlockSpec(
        (1, t_tile * vp, c), lambda n, i: (n, i, 0),
        memory_space=pltpu.VMEM,
    )
    hi = pl.BlockSpec(
        (1, hb * vp, c),
        lambda n, i: (n, jnp.minimum(i * rb + rb, nt * rb - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return lo, cur, hi


def _vec_spec(c: int):
    return pl.BlockSpec(
        (1, c), lambda n, i: (0, 0), memory_space=pltpu.VMEM
    )


def _edge_valid(rows: int, halo_rows: int, core_rows: int, i, nt):
    """(rows, 1) f32 mask, 0 on the halo rows of edge-clamped tiles
    (the conv's SAME zero padding)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    invalid = ((r < halo_rows) & (i == 0)) | (
        (r >= halo_rows + core_rows) & (i == nt - 1)
    )
    return jnp.where(invalid, 0.0, 1.0).astype(jnp.float32)


def _assemble(lo_ref, cur_ref, hi_ref, hb: int, halo: int, vp: int):
    """[last ``halo`` frames of lo | core | first ``halo`` of hi]."""
    return jnp.concatenate(
        [
            lo_ref[0][(hb - halo) * vp :, :],
            cur_ref[0],
            hi_ref[0][: halo * vp, :],
        ],
        axis=0,
    )


def _fwd_kernel(
    s_lo, s_cur, s_hi, scale_ref, shift_ref, wall_ref, b_ref,
    u_ref, sum_ref, sumsq_ref,
    *, t_tile: int, hb: int, v: int, vp: int, ks: int, out_dtype,
):
    n, i = pl.program_id(0), pl.program_id(1)
    nt = pl.num_programs(1)
    c = scale_ref.shape[-1]
    halo = ks // 2
    halo_rows = halo * vp
    core_rows = t_tile * vp

    x = _assemble(s_lo, s_cur, s_hi, hb, halo, vp).astype(jnp.float32)
    valid = _edge_valid(x.shape[0], halo_rows, core_rows, i, nt)
    h = (
        jnp.maximum(x * scale_ref[0] + shift_ref[0], 0.0) * valid
    ).astype(wall_ref.dtype)
    # one wide MXU matmul: p[r, dt*C+co] = h[r] @ W[dt]
    p = jnp.dot(h, wall_ref[:], preferred_element_type=jnp.float32)
    u = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (core_rows, c)
    )
    for dt in range(ks):
        u = u + p[dt * vp : dt * vp + core_rows,
                  dt * c : (dt + 1) * c]
    u16 = u.astype(out_dtype)
    u_ref[0] = u16

    # stats exclude the zero-padded joints (their u rows equal the conv
    # bias, not data)
    jmask = (
        jax.lax.broadcasted_iota(jnp.int32, (core_rows, 1), 0) % vp
        < v
    ).astype(jnp.float32)
    uf = u16.astype(jnp.float32) * jmask

    @pl.when((n == 0) & (i == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    sum_ref[:] = sum_ref[:] + jnp.sum(uf, axis=0, keepdims=True)
    sumsq_ref[:] = sumsq_ref[:] + jnp.sum(
        uf * uf, axis=0, keepdims=True
    )


def _bwd_kernel(
    s_lo, s_cur, s_hi, gue_lo, gue_cur, gue_hi,
    scale_ref, shift_ref, wtall_ref,
    gs_ref, dwall_ref, dscale_ref, dshift_ref, dbias_ref,
    *, t_tile: int, hb: int, v: int, vp: int, ks: int,
):
    """``gue`` is the effective conv-output gradient (stats cotangents
    folded in, joint-pad rows zeroed, by the XLA caller)."""
    n, i = pl.program_id(0), pl.program_id(1)
    nt = pl.num_programs(1)
    c = scale_ref.shape[-1]
    halo = ks // 2
    halo_rows = halo * vp
    core_rows = t_tile * vp

    sx = _assemble(s_lo, s_cur, s_hi, hb, halo, vp).astype(
        jnp.float32
    )
    valid = _edge_valid(sx.shape[0], halo_rows, core_rows, i, nt)
    h = (
        jnp.maximum(sx * scale_ref[0] + shift_ref[0], 0.0) * valid
    )
    gue = _assemble(gue_lo, gue_cur, gue_hi, hb, halo, vp)
    gue = (gue.astype(jnp.float32) * valid).astype(wtall_ref.dtype)

    # g_h[r] = sum_e gue[r + (e - halo)*VP] @ W[ks-1-e]^T — the
    # forward's shifted form with taps reversed and transposed
    q = jnp.dot(gue, wtall_ref[:], preferred_element_type=jnp.float32)
    gh = jnp.zeros((core_rows, c), jnp.float32)
    for e in range(ks):
        gh = gh + q[e * vp : e * vp + core_rows,
                    e * c : (e + 1) * c]
    mask_core = (
        h[halo_rows : halo_rows + core_rows] > 0.0
    ).astype(jnp.float32)
    ghm = gh * mask_core
    scale_f = scale_ref[0].astype(jnp.float32)
    gs_ref[0] = (ghm * scale_f).astype(gs_ref.dtype)

    h16 = h.astype(wtall_ref.dtype)
    gue_core = gue[halo_rows : halo_rows + core_rows]
    s_core = sx[halo_rows : halo_rows + core_rows]

    @pl.when((n == 0) & (i == 0))
    def _():
        dwall_ref[:] = jnp.zeros_like(dwall_ref)
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dshift_ref[:] = jnp.zeros_like(dshift_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    # dW[dt] += h[shifted]^T @ gue — one row-contracting matmul per tap
    # (a lane-dim concat of the ks shifted views would be one wider
    # matmul, but Mosaic cannot lower lane concatenation of C<128
    # pieces), accumulated straight into the output rows
    for dt in range(ks):
        part = jax.lax.dot_general(
            h16[dt * vp : dt * vp + core_rows, :], gue_core,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwall_ref[dt * c : (dt + 1) * c, :] = (
            dwall_ref[dt * c : (dt + 1) * c, :] + part
        )

    dscale_ref[:] = dscale_ref[:] + jnp.sum(
        ghm * s_core, axis=0, keepdims=True
    )
    dshift_ref[:] = dshift_ref[:] + jnp.sum(
        ghm, axis=0, keepdims=True
    )
    dbias_ref[:] = dbias_ref[:] + jnp.sum(
        gue_core.astype(jnp.float32), axis=0, keepdims=True
    )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mm_dtype(s):
    return jnp.bfloat16 if s.dtype == jnp.bfloat16 else jnp.float32


def _pad_joints(x3, v: int, vp: int):
    """(NM, T*V, C) view padded to (NM, T*VP, C) with zero joints."""
    if v == vp:
        return x3
    nm, rows, c = x3.shape
    x4 = x3.reshape(nm, rows // v, v, c)
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, vp - v), (0, 0)))
    return x4.reshape(nm, (rows // v) * vp, c)


def _unpad_joints(x3, v: int, vp: int):
    if v == vp:
        return x3
    nm, rows, c = x3.shape
    return x3.reshape(nm, rows // vp, vp, c)[:, :, :v, :].reshape(
        nm, (rows // vp) * v, c
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def affine_relu_tconv(s, scale, shift, kernel, bias, v: int, ks: int):
    """``u = conv9x1(relu(s*scale + shift)) + bias`` with fused second-BN
    statistics, as one Pallas pass over ``s``.

    Args:
      s: ``(NM, T, V, C)`` activations (f32 or bf16; compute is f32
        affine -> matmul in the activation dtype -> f32 accumulate).
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
    vp = _roundup8(v)
    t_tile = _pick_t_tile(t, c, ks, vp)
    hb = _halo_block(t_tile, ks // 2)
    nt = t // t_tile
    out_dtype = s.dtype

    s3 = _pad_joints(s.reshape(nm, t * v, c), v, vp)
    # W_all[ci, dt*C + co] = kernel[dt, 0, ci, co]
    wall = jnp.transpose(kernel[:, 0], (1, 0, 2)).reshape(
        c, ks * c
    ).astype(_mm_dtype(s))
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    shift2 = shift.reshape(1, c).astype(jnp.float32)
    bias2 = bias.reshape(1, c).astype(jnp.float32)

    lo, cur, hi = _halo_specs(t_tile, hb, vp, c, nt)
    kern = functools.partial(
        _fwd_kernel, t_tile=t_tile, hb=hb, v=v, vp=vp, ks=ks,
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
            cur,
            _vec_spec(c), _vec_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nm, t * vp, c), out_dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(s3, s3, s3, scale2, shift2, wall, bias2)
    u = _unpad_joints(u, v, vp).reshape(nm, t, v, c)
    return u, s2[0], ss2[0]


def _vjp_fwd(s, scale, shift, kernel, bias, v, ks):
    out = _fwd_impl(s, scale, shift, kernel, bias, v, ks)
    return out, (s, scale, shift, kernel, bias, out[0])


def _vjp_bwd(v, ks, res, cotangents):
    s, scale, shift, kernel, bias, u = res
    g_u, g_s2, g_ss2 = cotangents
    nm, t, v_, c = s.shape
    vp = _roundup8(v)
    t_tile = _pick_t_tile(t, c, ks, vp)
    hb = _halo_block(t_tile, ks // 2)
    nt = t // t_tile

    s3 = _pad_joints(s.reshape(nm, t * v, c), v, vp)
    # fold the stats cotangents into one effective conv-output gradient
    # (a single fused XLA elementwise pass, BEFORE joint padding so the
    # pad rows stay zero and contribute nothing to dW/dbias)
    gue = (
        g_u.reshape(nm, t * v, c).astype(jnp.float32)
        + g_s2.astype(jnp.float32)
        + 2.0
        * u.reshape(nm, t * v, c).astype(jnp.float32)
        * g_ss2.astype(jnp.float32)
    ).astype(_mm_dtype(s))
    gue3 = _pad_joints(gue, v, vp)
    # WT_all[co, e*C + ci] = kernel[ks-1-e, 0, ci, co]
    wt = jnp.transpose(kernel[::-1, 0], (2, 0, 1)).reshape(
        c, ks * c
    ).astype(_mm_dtype(s))
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    shift2 = shift.reshape(1, c).astype(jnp.float32)

    lo, cur, hi = _halo_specs(t_tile, hb, vp, c, nt)
    kern = functools.partial(
        _bwd_kernel, t_tile=t_tile, hb=hb, v=v, vp=vp, ks=ks
    )
    gs, dwall, dscale, dshift, dbias = pl.pallas_call(
        kern,
        grid=(nm, nt),
        in_specs=[
            lo, cur, hi,
            lo, cur, hi,
            _vec_spec(c), _vec_spec(c),
            pl.BlockSpec(
                (c, ks * c), lambda n, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            cur,
            pl.BlockSpec(
                (ks * c, c), lambda n, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            _vec_spec(c), _vec_spec(c), _vec_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nm, t * vp, c), s.dtype),
            jax.ShapeDtypeStruct((ks * c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(s3, s3, s3, gue3, gue3, gue3, scale2, shift2, wt)

    g_s = _unpad_joints(gs, v, vp).reshape(nm, t, v, c).astype(s.dtype)
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
