"""Spectrogram-stack training throughput on one TPU chip.

Same scan-delta methodology as the root ``bench.py`` (this image's TPU
tunnel executes lazily; see that file's docstring). Measures the full
train step of the flagship radar pipeline: on-device 250x upsample ->
fused Pallas radar return (fwd + hand-derived bwd) -> polyphase STFT ->
log-magnitude -> resize -> ResNet-18 -> Adam update.

Reference point: the reference implementation feeds this model from 10
CPU loader workers doing the 250x interpolation per sample
(``main_spectrogram.py:94-101``, ``utils.py:134-140``) — its throughput
is loader-bound at ~1 clip/s/worker.

Prints ONE JSON line. Usage: ``python scripts/bench_spectrogram.py``.
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
import optax

BATCH = int(os.environ.get("BENCH_SPEC_BATCH", "16"))
STEPS = 6


def main():
    from skeleton_action_recognition_tpu.models import spectrogram
    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        optim as optim_lib,
    )
    from skeleton_action_recognition_tpu.train.steps import (
        make_radar_train_step,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 3, 300, 25, 2)).astype(np.float32) * 0.3
    )
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 60, size=BATCH)), 60
    )

    # BENCH_SPEC_DTYPE=bfloat16 A/Bs the ResNet backbone compute dtype
    # (the radar+STFT stay f32 regardless — phase needs the mantissa)
    dt = os.environ.get("BENCH_SPEC_DTYPE", "float32")
    # BENCH_SPEC_STFT=pallas A/Bs the fused Pallas STFT+log-magnitude
    # kernel (ops/pallas/stft.py) against the XLA framing path
    stft_kind = os.environ.get("BENCH_SPEC_STFT", "xla")
    model = spectrogram.Model(
        num_classes=60, num_pad_frames=250, use_pallas=True,
        use_pallas_stft=stft_kind == "pallas",
        dtype=jnp.bfloat16 if dt == "bfloat16" else None,
    )
    # the production trainer's exact optimizer and step
    # (cli/main_spectrogram.py): Adam for the backbone, the physics
    # partition for radar_lambda/radar_loc
    state = create_train_state(
        model, jax.random.key(0), x[:1],
        optim_lib.make_radar_optimizer(optax.adam(1e-4)),
    )

    def measure(step):
        def multi(k):
            @jax.jit
            def run(s):
                def body(s, _):
                    s, m = step(s, x, y)
                    return s, m["loss"]

                return jax.lax.scan(body, s, None, length=k)[1][-1]

            return run

        f1, fn = multi(1), multi(STEPS)
        float(f1(state))
        float(fn(state))
        t0 = time.perf_counter()
        float(f1(state))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(state))
        dn = time.perf_counter() - t0
        return (dn - d1) / (STEPS - 1)

    # frozen phase (the trainer's default; radar backward is DCE'd —
    # the freeze flags are compile-time static, train/steps.py) and
    # unfrozen phase (staged-unfreeze epochs: full radar backward)
    per = measure(make_radar_train_step(BATCH))
    per_unfrozen = measure(
        make_radar_train_step(BATCH, train_lambda=True, train_loc=True)
    )

    print(json.dumps({
        "metric": "spectrogram_train_clips_per_sec_per_chip",
        "value": round(BATCH / per, 2),
        "unit": "clips/s",
        "batch": BATCH,
        "ms_per_step": round(per * 1e3, 2),
        "unfrozen_clips_per_sec": round(BATCH / per_unfrozen, 2),
        "unfrozen_ms_per_step": round(per_unfrozen * 1e3, 2),
        "stft": stft_kind,
        "dtype": dt,
    }))


if __name__ == "__main__":
    main()
