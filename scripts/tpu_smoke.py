"""Quick real-TPU smoke of the hot paths (uses the warm compile cache).

For round-over-round validation on the single tunneled chip: runs the
ST-GCN train step, the fused radar forward+backward, and the folded
inference predictor, printing one OK line per stage. ~3-5 min with the
persistent compile cache primed; see bench.py for the timing caveats of
this backend.

Usage:  python scripts/tpu_smoke.py
"""

import os
import sys

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


def main():
    from skeleton_action_recognition_tpu.models import export, stgcn
    from skeleton_action_recognition_tpu.ops.pallas.radar import (
        radar_return_fused,
    )
    from skeleton_action_recognition_tpu.ops.resample import (
        pad_frames_operator,
    )
    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        make_train_step,
    )

    print("devices:", jax.devices(), flush=True)
    d = np.load(
        "/root/reference/data/NTU_preprocessed_skeleton_examples.npy"
    ).astype(np.float32)

    # 1. ST-GCN train step
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
    assert np.isfinite(loss)
    print(f"OK train step: loss {loss:.3f}", flush=True)

    # 2. fused radar fwd + bwd
    xr = jnp.asarray(d[:2, :, :30])
    w = jnp.asarray(pad_frames_operator(30, 20))
    g = jax.jit(
        jax.grad(
            lambda x: radar_return_fused(
                x, w, jnp.zeros(3), jnp.asarray(5e-4), tile=128
            )[0].sum()
        )
    )(xr)
    assert np.isfinite(np.asarray(g)).all()
    print("OK fused radar fwd+bwd: grads finite", flush=True)

    # 3. folded inference
    fused = export.fused_stgcn_predictor(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    logits = np.asarray(fused(x))
    assert np.isfinite(logits).all()
    print(f"OK folded inference: logits {logits.shape}", flush=True)
    print("TPU SMOKE PASSED", flush=True)


if __name__ == "__main__":
    main()
