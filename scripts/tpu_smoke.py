"""Real-TPU kernel parity gate (uses the warm compile cache).

Round-over-round validation on the single tunneled chip. Interpret-mode
CPU tests structurally cannot catch Mosaic lowering failures, so this
script asserts, ON HARDWARE, numerical parity (``allclose``, not mere
finiteness) between every Pallas kernel family and its XLA reference:

* fused radar forward + hand-derived backward vs ``radar_return_upsampled``
* fused spatial graph-conv (sgcn) forward + grads vs the einsum oracle
* fused BN->ReLU->tconv kernel forward + grads vs the flax-chain oracle
* fused STFT+log-magnitude vs the XLA polyphase chain (production shape)
* plus end-to-end sanity: one ST-GCN train step and the folded predictor

Writes a machine-readable record (max abs/rel errors per stage) to the
path given by ``--json`` (default ``SMOKE.json`` at the repo root).
Run as the LAST act of every round; a nonzero exit means a kernel does
not lower or does not match on the real chip.

Tolerance notes: radar numerics at real wavelengths (lambda ~ 5e-4) are
f32-conditioning-limited — one ulp of bone-length difference between two
correct implementations is amplified by 4*pi/lambda into ~4e-3 relative
output error, and gradients there are tiny residues of hugely-cancelling
phase terms (see ``ops/pallas/radar.py`` docstring). Structural parity is
therefore gated at lambda=10 (fwd + bwd 1e-2, the bound set by the
kernel's deliberate bf16-dst amplitude precision split) where one ulp
moves the phase by only ~2e-7; at the real wavelength the forward gate is
the analytic 4-ulp chaos bound and gradients assert finiteness only.

Usage:  python scripts/tpu_smoke.py [--json SMOKE_r03.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

RESULTS = {}


def _record(stage, ok, **stats):
    RESULTS[stage] = {"ok": bool(ok), **stats}
    line = ", ".join(f"{k} {v:.3g}" for k, v in stats.items())
    print(f"{'OK' if ok else 'FAIL'} {stage}: {line}", flush=True)
    if not ok:
        raise AssertionError(f"parity stage failed: {stage}")


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    abs_err = float(np.abs(a - b).max())
    scale = float(np.abs(b).max()) or 1.0
    return abs_err, abs_err / scale


def check_train_step(d):
    from skeleton_action_recognition_tpu.models import export, stgcn
    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        make_train_step,
    )

    x = jnp.asarray(np.tile(d[:, :, :32], (2, 1, 1, 1, 1)))
    y = jax.nn.one_hot(jnp.arange(8) % 60, 60)
    model = stgcn.Model(num_classes=60)
    state = create_train_state(
        model, jax.random.key(0), x[:1],
        optax.sgd(0.01, momentum=0.9, nesterov=True),
    )
    step = jax.jit(make_train_step(8))
    state, m = step(state, x, y, False)
    loss = float(m["loss"])
    _record("train_step", np.isfinite(loss), loss=loss)

    fused = export.fused_stgcn_predictor(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    logits = np.asarray(fused(x))
    _record(
        "folded_inference",
        np.isfinite(logits).all(),
        logit_absmax=float(np.abs(logits).max()),
    )


def check_radar(d):
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_fused,
    )
    from skeleton_action_recognition_tpu.ops.resample import (
        pad_frames_operator,
    )
    from skeleton_action_recognition_tpu.ops.virtual_radar import (
        radar_return_upsampled,
    )

    x = jnp.asarray(d[:2, :, :30])
    w = jnp.asarray(pad_frames_operator(30, 20))  # T_out = 600
    loc = jnp.zeros(3)

    # structural forward parity at lambda=10: one f32 ulp of bone-length
    # difference moves the phase by only ~2e-7 rad, so this gate catches
    # real kernel regressions without phase-chaos false alarms. The
    # bound is set by the kernel's DELIBERATE precision split (the dst
    # contraction rides the bf16-pass MXU default; measured ~0.4-0.5%
    # amplitude error vs the all-f32 XLA path), not by rounding: 1e-2
    # gives 2x headroom over the split while staying 10x below any
    # structural failure.
    lam_t = jnp.asarray(10.0)
    re_ft, im_ft = jax.jit(
        lambda x: radar_return_fused(x, w, loc, lam_t, tile=128)
    )(x)
    re_xt, im_xt = jax.jit(
        lambda x: radar_return_upsampled(x, w, loc, lam_t)
    )(x)
    scale_t = float(jnp.abs(re_xt).max())
    a_re, r_re = _err(re_ft, re_xt)
    a_im, r_im = _err(im_ft, im_xt)
    _record(
        "radar_fwd@lam10",
        a_re <= 1e-2 * scale_t and a_im <= 1e-2 * scale_t,
        rel_re=r_re, rel_im=r_im,
    )

    # forward at the real wavelength (scale-relative). The bound is set
    # by f32 conditioning, not kernel quality: the two paths reduce the
    # time-mean bone length in different orders, and ONE ulp of
    # difference in d (~1.2e-7 at d~1 m) is amplified by 4*pi/lambda
    # into ~3.8e-3 relative output error at lambda=5e-4 (sin/cos of a
    # ~25000-rad phase). Gate at 4 ulps; the lambda=10 stage above owns
    # structural parity.
    lam = jnp.asarray(5e-4)
    tol_chaos = 4 * (4 * np.pi / float(lam)) * 1.2e-7
    re_f, im_f = jax.jit(
        lambda x: radar_return_fused(x, w, loc, lam, tile=128)
    )(x)
    re_x, im_x = jax.jit(
        lambda x: radar_return_upsampled(x, w, loc, lam)
    )(x)
    scale = float(jnp.abs(re_x).max())
    a_re, r_re = _err(re_f, re_x)
    a_im, r_im = _err(im_f, im_x)
    _record(
        "radar_fwd@lam5e-4",
        a_re <= tol_chaos * scale and a_im <= tol_chaos * scale,
        rel_re=r_re, rel_im=r_im,
    )

    # backward parity in the well-conditioned regime
    lam_b = jnp.asarray(10.0)

    def loss_f(x, lam_):
        re, im = radar_return_fused(x, w, loc, lam_, tile=128)
        return jnp.sum(re * re + im * im)

    def loss_x(x, lam_):
        re, im = radar_return_upsampled(x, w, loc, lam_)
        return jnp.sum(re * re + im * im)

    gx_f, gl_f = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(x, lam_b)
    gx_x, gl_x = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(x, lam_b)
    gs = float(jnp.abs(gx_x).max())
    a_gx, _ = _err(gx_f, gx_x)
    _, r_gl = _err(gl_f, gl_x)
    _record(
        "radar_bwd@lam10",
        a_gx <= 1e-2 * gs and r_gl <= 1e-2,
        rel_gx=a_gx / gs, rel_glam=r_gl,
    )

    # real-wavelength backward: finite (parity is chaotic there)
    g = jax.jit(jax.grad(loss_f))(x, lam)
    _record(
        "radar_bwd@lam5e-4_finite",
        np.isfinite(np.asarray(g)).all(),
        absmax=float(jnp.abs(g).max()),
    )

    # ---- spline-factorized kernel family (the model's use_pallas
    # default): same stages as the dense kernel ----
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_spline,
    )

    re_st, im_st = jax.jit(
        lambda x: radar_return_spline(x, 20, loc, lam_t, tile=128)
    )(x)
    a_re, r_re = _err(re_st, re_xt)
    a_im, r_im = _err(im_st, im_xt)
    _record(
        "spline_fwd@lam10",
        a_re <= 1e-2 * scale_t and a_im <= 1e-2 * scale_t,
        rel_re=r_re, rel_im=r_im,
    )

    re_s, im_s = jax.jit(
        lambda x: radar_return_spline(x, 20, loc, lam, tile=128)
    )(x)
    a_re, r_re = _err(re_s, re_x)
    a_im, r_im = _err(im_s, im_x)
    _record(
        "spline_fwd@lam5e-4",
        a_re <= tol_chaos * scale and a_im <= tol_chaos * scale,
        rel_re=r_re, rel_im=r_im,
    )

    def loss_s(x, lam_):
        re, im = radar_return_spline(x, 20, loc, lam_, tile=128)
        return jnp.sum(re * re + im * im)

    gx_s, gl_s = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(x, lam_b)
    a_gx, _ = _err(gx_s, gx_x)
    _, r_gl = _err(gl_s, gl_x)
    _record(
        "spline_bwd@lam10",
        a_gx <= 1e-2 * gs and r_gl <= 1e-2,
        rel_gx=a_gx / gs, rel_glam=r_gl,
    )

    g = jax.jit(jax.grad(loss_s))(x, lam)
    _record(
        "spline_bwd@lam5e-4_finite",
        np.isfinite(np.asarray(g)).all(),
        absmax=float(jnp.abs(g).max()),
    )


def check_sgcn():
    from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
    from skeleton_action_recognition_tpu.ops.pallas.sgcn import (
        make_fused_graph_conv,
    )

    rng = np.random.default_rng(1)
    nm, t, v, c_in, co, k = 8, 64, 25, 64, 64, 3
    a = Graph("spatial").A.astype(np.float32)
    x = jnp.asarray(rng.normal(size=(nm, t, v, c_in)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(c_in, k * co)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.normal(size=(k * co,)).astype(np.float32) * 0.1)

    @jax.default_matmul_precision("highest")
    def ref(x_, w_, b_):
        z = (x_ @ w_ + b_).reshape(x_.shape[:-1] + (k, co))
        return jnp.einsum("ntvko,kvw->ntwo", z, jnp.asarray(a))

    # Tolerance: the sgcn/tconv kernels deliberately run their f32 dots
    # at the MXU's DEFAULT precision (one bf16 pass, rel ~3e-3) — the
    # same as XLA's own f32 default on TPU, and the bench path is bf16
    # throughout anyway. Exact-f32 parity is pinned by the CPU interpret
    # tests; here the bound is the bf16-pass noise floor.
    fgc = make_fused_graph_conv(a, v)
    o_ref = jax.jit(ref)(x, w, b)
    o_ker = jax.jit(fgc)(x, w, b)
    a_f, r_f = _err(o_ker, o_ref)
    _record("sgcn_fwd", r_f <= 1e-2, rel=r_f, abs=a_f)

    g0 = jax.jit(
        jax.grad(lambda s: jnp.sum(jnp.sin(ref(*s))))
    )((x, w, b))
    g1 = jax.jit(
        jax.grad(lambda s: jnp.sum(jnp.sin(fgc(*s))))
    )((x, w, b))
    worst = 0.0
    for p0, p1 in zip(g0, g1):
        _, r = _err(p1, p0)
        worst = max(worst, r)
    _record("sgcn_bwd", worst <= 2e-2, rel_worst=worst)

    # stats-epilogue variant: out + BN batch sums, fwd and a BN-shaped
    # backward exercising all three cotangents
    fgc_s = make_fused_graph_conv(a, v, with_stats=True)
    o_s, s_s, ss_s = jax.jit(fgc_s)(x, w, b)
    _, r_o = _err(o_s, o_ref)
    _, r_s = _err(s_s, jnp.sum(o_ref, axis=(0, 1, 2)))
    _, r_ss = _err(ss_s, jnp.sum(o_ref * o_ref, axis=(0, 1, 2)))
    _record(
        "sgcn_stats_fwd",
        (r_o <= 1e-2) and (r_s <= 1e-2) and (r_ss <= 1e-2),
        rel_out=r_o, rel_s=r_s, rel_ss=r_ss,
    )

    def bn_loss_of(fn):
        def loss(args):
            res = fn(*args)
            if isinstance(res, tuple):
                o, s_, ss_ = res
            else:
                o = res
                s_ = jnp.sum(o, axis=(0, 1, 2))
                ss_ = jnp.sum(o * o, axis=(0, 1, 2))
            n = o.size // o.shape[-1]
            mu = s_ / n
            var = jnp.maximum(ss_ / n - mu * mu, 0.0)
            return jnp.sum(jnp.sin((o - mu) * jax.lax.rsqrt(var + 1e-3)))

        return loss

    gs0 = jax.jit(jax.grad(bn_loss_of(ref)))((x, w, b))
    gs1 = jax.jit(jax.grad(bn_loss_of(fgc_s)))((x, w, b))
    worst = 0.0
    for p0, p1 in zip(gs0, gs1):
        _, r = _err(p1, p0)
        worst = max(worst, r)
    _record("sgcn_stats_bwd", worst <= 2e-2, rel_worst=worst)


def check_tconv():
    from skeleton_action_recognition_tpu.ops.pallas.tconv import (
        affine_relu_tconv,
    )

    rng = np.random.default_rng(3)
    nm, t, v, c = 4, 64, 25, 64
    s = jnp.asarray(rng.normal(size=(nm, t, v, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3)
    kk = jnp.asarray(
        rng.normal(size=(9, 1, c, c)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)

    @jax.default_matmul_precision("highest")
    def oracle(s, scale, shift, k_, b_):
        h = jnp.maximum(s * scale + shift, 0.0)
        u = jax.lax.conv_general_dilated(
            h, k_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_
        return u, jnp.sum(u, axis=(0, 1, 2)), jnp.sum(u * u, axis=(0, 1, 2))

    u0, s20, ss20 = jax.jit(oracle)(s, scale, shift, kk, b)
    u1, s21, ss21 = jax.jit(
        lambda *a: affine_relu_tconv(*a, v, 9)
    )(s, scale, shift, kk, b)
    _, r_u = _err(u1, u0)
    _, r_s2 = _err(s21, s20)
    _, r_ss2 = _err(ss21, ss20)
    _record(
        "tconv_fwd",
        r_u <= 1e-2 and r_s2 <= 1e-2 and r_ss2 <= 1e-2,
        rel_u=r_u, rel_sum=r_s2, rel_sumsq=r_ss2,
    )

    def loss(fn, args):
        u, s2, ss2 = fn(*args)
        return (
            jnp.sum(jnp.sin(u)) + jnp.sum(s2 * 0.1) + jnp.sum(ss2 * 0.01)
        )

    g0 = jax.jit(
        jax.grad(lambda a: loss(oracle, a))
    )((s, scale, shift, kk, b))
    g1 = jax.jit(
        jax.grad(
            lambda a: loss(lambda *a_: affine_relu_tconv(*a_, v, 9), a)
        )
    )((s, scale, shift, kk, b))
    worst = 0.0
    for p0, p1 in zip(g0, g1):
        _, r = _err(p1, p0)
        worst = max(worst, r)
    _record("tconv_bwd", worst <= 2e-2, rel_worst=worst)


def check_stft():
    """Fused STFT+log-magnitude vs the XLA polyphase chain at the
    production radar shape (T=75000, n_fft=256, hop=16): Mosaic must
    lower the polyphase reshapes / lane-offset concats and the backward
    carry chain, and match numerically."""
    from skeleton_action_recognition_tpu.ops import stft as stft_ops
    from skeleton_action_recognition_tpu.ops.pallas.stft import (
        stft_logmag,
    )

    rng = np.random.default_rng(5)
    n, t = 2, 75000
    re = jnp.asarray(rng.normal(size=(n, t)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, t)).astype(np.float32))
    cos_np, sin_np = stft_ops.stft_basis(256)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    @jax.default_matmul_precision("highest")
    def oracle(re, im):
        s_re, s_im = stft_ops.stft_complex(re, im, 16, cos, sin)
        return stft_ops.log_magnitude(s_re, s_im)

    want = jax.jit(oracle)(re, im)
    got = jax.jit(lambda r, i: stft_logmag(r, i, 16, cos, sin))(re, im)
    _, r_fwd = _err(got, want)
    _record("stft_fwd", r_fwd <= 1e-3, rel=r_fwd)

    w = jnp.asarray(
        rng.normal(size=want.shape).astype(np.float32)
    )
    g0 = jax.jit(
        jax.grad(lambda r, i: jnp.sum(oracle(r, i) * w), argnums=(0, 1))
    )(re, im)
    g1 = jax.jit(
        jax.grad(
            lambda r, i: jnp.sum(stft_logmag(r, i, 16, cos, sin) * w),
            argnums=(0, 1),
        )
    )(re, im)
    worst = 0.0
    for p0, p1 in zip(g0, g1):
        _, r = _err(p1, p0)
        worst = max(worst, r)
    _record("stft_bwd", worst <= 1e-3, rel_worst=worst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SMOKE.json",
        ),
    )
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    d = np.load(
        "/root/reference/data/NTU_preprocessed_skeleton_examples.npy"
    ).astype(np.float32)

    t0 = time.time()
    failed = None
    for fn in (
        lambda: check_train_step(d),
        lambda: check_radar(d),
        check_sgcn,
        check_tconv,
        check_stft,
    ):
        try:
            fn()
        except Exception as e:  # record and keep going: one bad kernel
            failed = failed or str(e)
            print(f"FAIL: {e}", flush=True)

    out = {
        "ok": failed is None,
        "backend": jax.default_backend(),
        "elapsed_s": round(time.time() - t0, 1),
        "stages": RESULTS,
        "error": failed,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(
        ("TPU SMOKE PASSED" if failed is None else "TPU SMOKE FAILED")
        + f" -> {args.json}",
        flush=True,
    )
    sys.exit(0 if failed is None else 1)


if __name__ == "__main__":
    main()
