"""Benchmark harness: ST-GCN train-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the axon TPU tunnel in this image executes lazily —
``block_until_ready`` does not force execution, and every host fetch
replays the computation chain. Timings here therefore run N chained train
steps *inside one jitted ``lax.scan``* and fetch a single scalar; the
per-step time is the difference between the N-step and 1-step programs
divided by N-1, which cancels both the RPC latency and the replay of the
state initialization.

Baseline provenance: the reference implementation (TF2/Keras ST-GCN,
``/root/reference/models/stgcn.py`` with its stale ``model.gcn`` import
and TF-2.1 ``l2(l=...)`` kwarg shimmed) measured on this machine's CPU at
batch 16: 0.57 clips/s (fwd+bwd+SGD update, steady state, synchronous TF
eager/function execution). BASELINE.json sets the north star at >=10x
that per chip.
"""

import json
import os
import time

import jax

# persistent compilation cache: the remote TPU compile helper takes
# minutes per program; priming the cache makes driver re-runs fast
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

REFERENCE_CPU_CLIPS_PER_SEC = 0.57

BATCH = 128
T = 300
STEPS = 6

# bf16 matmul peak by device kind (TFLOP/s), for the MFU line
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


_FLOPS_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, {repo!r})
from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.train import (
    create_train_state, make_train_step,
)

batch, t = {batch}, {t}
x = jnp.zeros((batch, 3, t, 25, 2), jnp.float32)
y = jnp.zeros((batch, 60), jnp.float32)
model = stgcn.Model(num_classes=60, dtype=jnp.bfloat16, remat=False)
state = create_train_state(model, jax.random.key(0), x[:1], optax.sgd(0.1))
step = make_train_step(global_batch_size=batch)
cost = (
    jax.jit(step, static_argnums=(3,))
    .lower(state, x, y, False)
    .cost_analysis()
)
if isinstance(cost, (list, tuple)):
    cost = cost[0]
print("FLOPS=" + repr(float(cost.get("flops", 0.0))))
"""


def _step_flops(batch, t):
    """XLA's FLOP count for one STOCK-model train step, from the
    pre-compile client-side analysis in a CPU-pinned subprocess (the
    axon TPU backend returns None from ``lower().cost_analysis()``, and
    tracing on CPU needs no backend compile).

    The FLOPs basis is deliberately the stock model even when a fused
    Pallas config is being timed: the Pallas spatial kernel does G x the
    raw adjacency-contraction FLOPs on block-diagonal zero padding, and
    counting that as useful work would overstate MFU. Same basis ->
    comparable utilization across configs."""
    import subprocess
    import sys

    try:
        src = _FLOPS_CHILD.format(
            repo=os.path.dirname(os.path.abspath(__file__)),
            batch=batch, t=t,
        )
        out = subprocess.run(
            [sys.executable, "-c", src],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        ).stdout
        for line in out.splitlines():
            if line.startswith("FLOPS="):
                return float(line.split("=", 1)[1]) or None
    except Exception:
        pass
    return None


def main():
    from skeleton_action_recognition_tpu.models import stgcn
    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 3, T, 25, 2)).astype(np.float32)
    )
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 60, size=BATCH)), 60
    )

    # measured fastest config on v5e (remat off fits HBM at this batch
    # with the conv-first contraction): 375 clips/s vs 343 remat / 245 prior
    # fused Pallas tconv measured 275 vs 366 clips/s stock at this shape
    # (VP-padding + fine grid overhead outweigh the pass savings so far)
    # fused Pallas spatial conv measured 452 vs 382 clips/s stock
    # (z intermediate stays in VMEM) — default on; sgcn+tconv together
    # measured 293 (the tconv kernel's overheads dominate), so tconv
    # stays opt-in
    fused = os.environ.get("BENCH_FUSED_TCONV", "0") != "0"
    fused_sgcn = os.environ.get("BENCH_FUSED_SGCN", "1") != "0"
    sgcn_stats = os.environ.get("BENCH_SGCN_STATS", "0") != "0"
    # r4 A/B (scripts/bench_decompose.py): fused spatial conv only on the
    # C>=128 blocks — 466 vs 450 clips/s all-fused vs 382 stock; at C=64
    # the kernel's VP/block-diagonal padding overhead exceeds the saved
    # z round-trip (min_channels=256 drops to 421, so C=128 must fuse)
    sgcn_min = int(os.environ.get("BENCH_SGCN_MIN_CHANNELS", "128"))
    # BENCH_REMAT: "0" (default, store everything), "full", or "dots"
    # (save matmul outputs, recompute elementwise in the backward). Full
    # remat at B=256 measured 390.7 — a loss; "dots" at the HBM-bound
    # B=128 shape is the untried variant this knob exists to A/B.
    remat = os.environ.get("BENCH_REMAT", "0")
    model = stgcn.Model(
        num_classes=60, dtype=jnp.bfloat16,
        remat=remat != "0",
        remat_policy=remat if remat != "0" else "full",
        fused_tconv=fused, fused_sgcn=fused_sgcn,
        sgcn_stats=sgcn_stats and fused_sgcn,
        fused_sgcn_min_channels=sgcn_min,
    )
    tx = optax.sgd(0.1, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(0), x[:1], tx)
    step = make_train_step(global_batch_size=BATCH)

    def multi(k):
        @jax.jit
        def run(state):
            def body(s, _):
                s, m = step(s, x, y, False)
                return s, m["loss"]

            return jax.lax.scan(body, state, None, length=k)[1][-1]

        return run

    f1, fn = multi(1), multi(STEPS)
    # compile + warm
    float(f1(state))
    float(fn(state))

    t0 = time.perf_counter()
    float(f1(state))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(state))
    dn = time.perf_counter() - t0
    per_step = (dn - d1) / (STEPS - 1)

    clips_per_sec = BATCH / per_step

    # MFU: stock-model FLOPs per step / wall time / device bf16 peak
    out = {
        "metric": "stgcn_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(
            clips_per_sec / REFERENCE_CPU_CLIPS_PER_SEC, 2
        ),
    }
    flops = _step_flops(BATCH, T)
    peak = PEAK_TFLOPS.get(jax.devices()[0].device_kind)
    if flops and peak:
        achieved = flops / per_step / 1e12
        out["tflops_per_sec"] = round(achieved, 2)
        out["mfu"] = round(achieved / peak, 4)
    try:
        out.update(_spectrogram_metrics())
    except Exception as e:  # keep the headline metric alive regardless
        out["spectrogram_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


SPEC_BATCH = 16


def _spectrogram_metrics():
    """Flagship spectrogram-stack train throughput (frozen radar params
    — the trainer's default phase, radar backward DCE'd — and unfrozen,
    the staged-unfreeze phase), same scan-delta methodology. VERDICT r4
    weak-#4: these were previously only in PARITY.md prose via
    ``scripts/bench_spectrogram.py``; the driver bench now records them.
    Reference workload: ``/root/reference/main_spectrogram.py:16-31``."""
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
        rng.normal(size=(SPEC_BATCH, 3, 300, 25, 2)).astype(np.float32)
        * 0.3
    )
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 60, size=SPEC_BATCH)), 60
    )
    # BENCH_PALLAS_STFT=0: A/B the XLA polyphase path against the fused
    # Pallas STFT+log-magnitude (ops/pallas/stft.py) — the production
    # default since the r5 A/B (frozen 1116 vs 947 clips/s at B=16;
    # unfrozen a wash within run-to-run noise)
    pallas_stft = os.environ.get("BENCH_PALLAS_STFT", "1") != "0"
    model = spectrogram.Model(
        num_classes=60, num_pad_frames=250, use_pallas=True,
        use_pallas_stft=pallas_stft,
    )
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

    frozen = measure(make_radar_train_step(SPEC_BATCH))
    unfrozen = measure(
        make_radar_train_step(
            SPEC_BATCH, train_lambda=True, train_loc=True
        )
    )
    return {
        "spectrogram_train_clips_per_sec_frozen": round(
            SPEC_BATCH / frozen, 2
        ),
        "spectrogram_train_clips_per_sec_unfrozen": round(
            SPEC_BATCH / unfrozen, 2
        ),
        "spectrogram_batch": SPEC_BATCH,
    }


if __name__ == "__main__":
    main()
