"""Benchmark harness: ST-GCN train-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: the reference implementation (TF2/Keras ST-GCN,
``/root/reference/models/stgcn.py`` with its stale ``model.gcn`` import and
TF-2.1 ``l2(l=...)`` kwarg shimmed) measured on this machine's CPU at
batch 16: 0.57 clips/s (fwd+bwd+SGD update, steady state). BASELINE.json
sets the north star at >=10x that per chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

REFERENCE_CPU_CLIPS_PER_SEC = 0.57

BATCH = 64
T = 300
STEPS = 20


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

    model = stgcn.Model(num_classes=60)
    tx = optax.sgd(0.1, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(0), x, tx)
    step = jax.jit(make_train_step(global_batch_size=BATCH), donate_argnums=(0,))

    # warm-up / compile
    state, m = step(state, x, y, False)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, x, y, False)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    clips_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "stgcn_train_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(
                    clips_per_sec / REFERENCE_CPU_CLIPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
