"""Serving-path throughput on one TPU chip: stock vs folded vs int8.

Times ST-GCN batch inference (B=256, T=300, NTU shapes) for each
serving variant exported by ``models/export.py``:

* ``stock``  — ``model.apply`` in eval mode (what a naive user runs)
* ``fused``  — folded BN+adjacency predictor, bf16
* ``w8``     — int8 weights, bf16 activations (memory win)
* ``w8a8``   — int8 weights AND activations: the s8 x s8 -> s32 MXU
  path (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16)

Methodology matches ``bench.py``: the axon tunnel executes lazily, so
each variant runs N chained forwards inside one jitted ``lax.scan`` and
the per-call time is the (N-step - 1-step) delta. Two traps avoided:
weights are passed through the jit as ARGUMENTS (the folded pytree is
~hundreds of MB — inlined as program constants it blows the compiler),
and the scan carry feeds back into the input (``x + c * 0``) so XLA
cannot hoist the forward out of the loop as loop-invariant.

Prints one JSON dict. Usage: ``python scripts/bench_serving.py``.
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

BATCH = 256
T = 300
STEPS = 6


def scan_delta(fwd, weights, x):
    """Per-call seconds for ``fwd(weights, x)``, N-vs-1 scan delta."""

    def multi(k):
        @jax.jit
        def run(weights, x):
            def body(c, _):
                out = fwd(weights, x + c * 0)
                return jnp.float32(out.sum()) * 1e-12, None

            return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]

        return run

    f1, fn = multi(1), multi(STEPS)
    float(f1(weights, x)), float(fn(weights, x))  # compile + warm
    t0 = time.perf_counter()
    float(f1(weights, x))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(weights, x))
    dn = time.perf_counter() - t0
    return (dn - d1) / (STEPS - 1)


def main():
    from skeleton_action_recognition_tpu.models import export, stgcn
    from skeleton_action_recognition_tpu.train import create_train_state

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 3, T, 25, 2)).astype(np.float32)
    )
    model = stgcn.Model(num_classes=60, dtype=jnp.bfloat16, remat=False)
    state = create_train_state(
        model, jax.random.key(0), x[:1], optax.sgd(0.1)
    )

    variants = {
        "stock": (
            lambda v, xb: model.apply(v, xb, train=False),
            {"params": state.params, "batch_stats": state.batch_stats},
        ),
    }
    for name, cls in [
        ("fused", export.FusedSTGCNPredictor),
        ("w8", export.QuantizedSTGCNPredictor),
        ("w8a8", export.Int8STGCNPredictor),
    ]:
        pred = cls(state.params, state.batch_stats)
        variants[name] = (
            lambda w, xb, pred=pred: pred.forward(w[0], w[1], xb),
            (pred.weights, pred.head),
        )

    out = {"batch": BATCH, "t": T}
    for name, (fwd, weights) in variants.items():
        per_call = scan_delta(fwd, weights, x)
        out[name + "_clips_per_sec"] = round(BATCH / per_call, 1)
        print(f"{name}: {BATCH / per_call:.1f} clips/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
