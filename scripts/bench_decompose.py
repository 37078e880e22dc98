"""ST-GCN train-step time decomposition on one TPU chip.

The profiler cannot collect traces through this image's axon tunnel (the
trace hangs), so this measures the decomposition the VERDICT asks for by
scan-delta ablation (same methodology as ``bench.py``): each variant
times N chained steps inside one jitted ``lax.scan`` minus the 1-step
program, cancelling RPC latency and lazy-replay effects.

Variants isolate where the step time goes:

* ``default``           — bench config (fused sgcn, bf16, remat off)
* ``default_b256``      — batch scaling headroom
* ``fwd_only``          — forward+loss without grad/update (fwd vs bwd split)
* ``stock_sgcn``        — XLA spatial conv (the fused kernel's win)
* ``f32``               — bf16 vs f32 compute delta
* ``no_databn``/... — (optional targeted ablations, commented)

Prints one JSON dict; paste the numbers into ROADMAP when drawing
conclusions. Usage: ``python scripts/bench_decompose.py [variant ...]``
(no args = all).
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

T = 300
STEPS = 6


def time_variant(name, batch, model_kwargs, fwd_only=False):
    from skeleton_action_recognition_tpu.models import stgcn
    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(batch, 3, T, 25, 2)).astype(np.float32)
    )
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 60, size=batch)), 60
    )
    model = stgcn.Model(num_classes=60, **model_kwargs)
    tx = optax.sgd(0.1, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(0), x[:1], tx)
    step = make_train_step(global_batch_size=batch)

    if fwd_only:
        def body_of(s):
            def body(carry, _):
                logits, _ = s.apply_fn(
                    {"params": s.params, "batch_stats": s.batch_stats},
                    x + carry * 0, train=True, mutable=["batch_stats"],
                )
                # chain steps through the carry so scan cannot hoist
                return carry + logits.mean() * 1e-9, logits.mean()
            return body

        def multi(k):
            @jax.jit
            def run(state):
                return jax.lax.scan(
                    body_of(state), jnp.float32(0), None, length=k
                )[1][-1]
            return run
    else:
        def multi(k):
            @jax.jit
            def run(state):
                def body(s, _):
                    s, m = step(s, x, y, False)
                    return s, m["loss"]
                return jax.lax.scan(body, state, None, length=k)[1][-1]
            return run

    f1, fn = multi(1), multi(STEPS)
    float(f1(state)); float(fn(state))  # compile + warm
    t0 = time.perf_counter(); float(f1(state)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(state)); dn = time.perf_counter() - t0
    per_step = (dn - d1) / (STEPS - 1)
    out = {
        "batch": batch,
        "ms_per_step": round(per_step * 1e3, 2),
        "clips_per_sec": round(batch / per_step, 1),
    }
    print(json.dumps({name: out}), flush=True)
    return out


VARIANTS = {
    "default": lambda: time_variant(
        "default", 128,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True),
    ),
    "default_b256": lambda: time_variant(
        "default_b256", 256,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True),
    ),
    "default_b512": lambda: time_variant(
        "default_b512", 512,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True),
    ),
    "fwd_only": lambda: time_variant(
        "fwd_only", 128,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True),
        fwd_only=True,
    ),
    "stock_sgcn": lambda: time_variant(
        "stock_sgcn", 128,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=False),
    ),
    # fused spatial conv only where it wins (the C=64 blocks lose to
    # stock XLA per the per-shape microbench)
    "mixed_sgcn": lambda: time_variant(
        "mixed_sgcn", 128,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True,
             fused_sgcn_min_channels=128),
    ),
    "mixed_sgcn_b256": lambda: time_variant(
        "mixed_sgcn_b256", 256,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True,
             fused_sgcn_min_channels=128),
    ),
    # B=256 no-remat OOMs (23.7G > 15.8G HBM); 'dots' saves matmul/conv
    # outputs only and recomputes the elementwise chains
    "mixed_dots_b256": lambda: time_variant(
        "mixed_dots_b256", 256,
        dict(dtype=jnp.bfloat16, remat=True, remat_policy="dots",
             fused_sgcn=True, fused_sgcn_min_channels=128),
    ),
    "mixed_min256": lambda: time_variant(
        "mixed_min256", 128,
        dict(dtype=jnp.bfloat16, remat=False, fused_sgcn=True,
             fused_sgcn_min_channels=256),
    ),
    "f32": lambda: time_variant(
        "f32", 128, dict(dtype=None, remat=False, fused_sgcn=True),
    ),
    # BN1 batch stats from the spatial kernel's epilogue (no separate
    # reduce pass over the spatial activation)
    "sgcn_stats": lambda: time_variant(
        "sgcn_stats", 128,
        dict(
            dtype=jnp.bfloat16, remat=False, fused_sgcn=True,
            sgcn_stats=True,
        ),
    ),
    "sgcn_stats_b256": lambda: time_variant(
        "sgcn_stats_b256", 256,
        dict(
            dtype=jnp.bfloat16, remat=False, fused_sgcn=True,
            sgcn_stats=True,
        ),
    ),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for n in names:
        results[n] = VARIANTS[n]()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
