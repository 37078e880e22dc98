"""Spectrogram-stack train-step cost decomposition on one TPU chip.

Scan-delta timings (see ``bench.py`` methodology) of the pipeline
stages at the bench shape (B=16, T_in=300, pad 250x -> T_out=75000):

* ``radar_fwd``      — fused Pallas radar return, forward only
* ``radar_train``    — radar return fwd + hand-derived bwd (grad wrt x)
* ``spec_fwd``       — radar + STFT + log-mag (the full VirtualRadar op)
* ``spec_train``     — same, fwd + bwd
* ``model_train``    — the full train step (radar+STFT+resize+ResNet+Adam)

Prints one JSON line per stage. Usage:
``python scripts/bench_spec_decompose.py [stage ...]``.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BATCH = 16
T_IN = 300
PAD = 250
STEPS = 6


def timeit(name, fn, *args):
    def multi(k):
        @jax.jit
        def run(*a):
            def body(c, _):
                return c + fn(*a, c), None
            return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]
        return run

    f1, fn_ = multi(1), multi(STEPS)
    float(f1(*args)); float(fn_(*args))
    t0 = time.perf_counter(); float(f1(*args)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn_(*args)); dn = time.perf_counter() - t0
    ms = (dn - d1) / (STEPS - 1) * 1e3
    print(json.dumps({name: {"ms": round(ms, 2)}}), flush=True)
    return ms


def main():
    from skeleton_action_recognition_tpu.models import spectrogram
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_fused,
    )
    from skeleton_action_recognition_tpu.ops.resample import (
        pad_frames_operator,
    )

    want = sys.argv[1:]

    def sel(n):
        return not want or any(w in n for w in want)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 3, T_IN, 25, 2)).astype(np.float32)
    )
    w = jnp.asarray(pad_frames_operator(T_IN, PAD))
    loc = jnp.zeros(3)
    lam = jnp.asarray(5e-4)

    if sel("radar_fwd"):
        timeit(
            "radar_fwd",
            lambda x, c: sum(o.mean() for o in radar_return_fused(
                x + c * 0, w, loc, lam
            )) * 1e-9,
            x,
        )
    if sel("radar_train"):
        g = jax.grad(
            lambda x: sum(o.sum() for o in radar_return_fused(x, w, loc, lam))
        )
        timeit(
            "radar_train",
            lambda x, c: g(x + c * 0).mean() * 1e-9,
            x,
        )

    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_spline,
    )

    if sel("spline_fwd"):
        timeit(
            "spline_fwd",
            lambda x, c: sum(o.mean() for o in radar_return_spline(
                x + c * 0, PAD, loc, lam
            )) * 1e-9,
            x,
        )
    if sel("spline_train"):
        g = jax.grad(
            lambda x: sum(o.sum() for o in radar_return_spline(x, PAD, loc, lam))
        )
        timeit(
            "spline_train",
            lambda x, c: g(x + c * 0).mean() * 1e-9,
            x,
        )

    if sel("stft"):
        # STFT fwd+bwd in isolation at the radar output shape
        from skeleton_action_recognition_tpu.ops import stft as stft_ops

        cos, sin = stft_ops.stft_basis(256)
        cosj, sinj = jnp.asarray(cos), jnp.asarray(sin)
        sig_re = jnp.asarray(
            rng.normal(size=(BATCH, T_IN * PAD)).astype(np.float32)
        )
        sig_im = jnp.asarray(
            rng.normal(size=(BATCH, T_IN * PAD)).astype(np.float32)
        )

        def stft_loss(re, im):
            sr, si = stft_ops.stft_complex(re, im, 16, cosj, sinj)
            return stft_ops.log_magnitude(sr, si).sum()

        gf = jax.grad(stft_loss, argnums=(0, 1))
        timeit(
            "stft_fwd",
            lambda a, b, c: stft_loss(a + c * 0, b + c * 0).mean() * 1e-9,
            sig_re, sig_im,
        )
        timeit(
            "stft_train",
            lambda a, b, c: gf(a + c * 0, b + c * 0)[0].mean() * 1e-9,
            sig_re, sig_im,
        )

    model = spectrogram.VirtualRadar(
        num_pad_frames=PAD, use_pallas=True, wavelength=5e-4,
    )
    vs = model.init(jax.random.key(0), x[:1])

    if sel("chain_nolog"):
        # radar -> STFT, grad wrt x, WITHOUT log-magnitude: isolates the
        # log-mag fwd+bwd inside the composed chain
        from skeleton_action_recognition_tpu.ops import stft as stft_ops
        from skeleton_action_recognition_tpu.ops.pallas.radar import (
            radar_return_spline as rrs,
        )

        cos, sin = stft_ops.stft_basis(256)
        cosj, sinj = jnp.asarray(cos), jnp.asarray(sin)

        def chain_nolog(x):
            re, im = rrs(x, PAD, loc, lam)
            sr, si = stft_ops.stft_complex(re, im, 16, cosj, sinj)
            return sr.sum() + si.sum()

        g = jax.grad(chain_nolog)
        timeit(
            "chain_nolog_train",
            lambda x, c: g(x + c * 0).mean() * 1e-9,
            x,
        )

    if sel("chain_randcot"):
        # radar alone but with a DENSE random cotangent (what the STFT
        # backward hands it), vs spline_train's all-ones cotangent
        from skeleton_action_recognition_tpu.ops.pallas.radar import (
            radar_return_spline as rrs2,
        )

        cot_re = jnp.asarray(
            rng.normal(size=(BATCH, T_IN * PAD)).astype(np.float32)
        )
        cot_im = jnp.asarray(
            rng.normal(size=(BATCH, T_IN * PAD)).astype(np.float32)
        )

        def loss_rc(x):
            re, im = rrs2(x, PAD, loc, lam)
            return jnp.vdot(re, cot_re) + jnp.vdot(im, cot_im)

        g = jax.grad(loss_rc)
        timeit(
            "chain_randcot_train",
            lambda x, c: g(x + c * 0).mean() * 1e-9,
            x,
        )

    if sel("spec_fwd"):
        timeit(
            "spec_fwd",
            lambda x, c: model.apply(vs, x + c * 0).mean() * 1e-9,
            x,
        )
    if sel("spec_train"):
        g = jax.grad(lambda x: model.apply(vs, x).sum())
        timeit(
            "spec_train",
            lambda x, c: g(x + c * 0).mean() * 1e-9,
            x,
        )

    if sel("model_train"):
        import optax

        from skeleton_action_recognition_tpu.train import create_train_state
        from skeleton_action_recognition_tpu.train.steps import (
            make_radar_train_step,
        )

        full = spectrogram.Model(
            num_classes=60, num_pad_frames=PAD, use_pallas=True,
        )
        state = create_train_state(
            full, jax.random.key(0), x[:1], optax.adam(1e-3)
        )
        y = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 60, size=BATCH)), 60
        )

        def body_for(step):
            def body(x, c):
                # thread the updated state into the result so the
                # backward + optimizer update cannot be DCE'd
                s2, m = step(state, x + c * 0, y)
                leaves = jax.tree_util.tree_leaves(s2.params)
                anchor = sum(l.ravel()[0] for l in leaves)
                return (m["loss"] + anchor * 1e-12) * 1e-9

            return body

        # frozen phase (production default): the radar backward is DCE'd
        timeit("model_train", body_for(make_radar_train_step(BATCH)), x)
        # unfrozen phase: full radar backward (lambda + loc gradients)
        timeit(
            "model_train_unfrozen",
            body_for(make_radar_train_step(
                BATCH, train_lambda=True, train_loc=True
            )),
            x,
        )


if __name__ == "__main__":
    main()
