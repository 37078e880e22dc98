"""Jittable train/eval steps for the GNN and spectrogram stacks.

One compiled XLA program per step (vs the reference's ``@tf.function``
``train_step``/``test_step`` at ``main_gnn.py:205-239``). Data parallelism
is *not* expressed here — the caller shards the batch and replicates the
state via ``jax.sharding`` annotations; gradient all-reduce appears
automatically as XLA collectives when the step is jitted over a mesh.

The adjacency-freeze behavior of ``main_gnn.py:228-232`` (vars named
``adjacency_matrix`` excluded from updates until ``epoch >
freeze_graph_until``) is reproduced by zeroing those gradients under a
runtime ``train_adj`` flag — keeping a single compiled program for both
phases (no retrace at the unfreeze epoch, unlike TF).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skeleton_action_recognition_tpu.train.losses import total_loss


def _path_has(path, needle: str) -> bool:
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        if key is not None and needle in str(key):
            return True
    return False


def mask_gradients_by_name(grads, needle: str, enabled):
    """Zero gradients of params whose path contains ``needle`` unless
    ``enabled`` (a traced bool/0-1 scalar).

    Uses ``where``, NOT multiplication: the radar parameters' raw
    gradients overflow f32 (the ``4*pi/lambda^2`` factor is ~5e7 summed
    over millions of timestep-edge terms), and ``0 * inf = nan`` would
    poison the optimizer state of the very parameters the mask is
    supposed to freeze."""
    on = jnp.asarray(enabled, bool)

    def mask(path, g):
        if _path_has(path, needle):
            return jnp.where(on, g, jnp.zeros_like(g))
        return g

    return jax.tree_util.tree_map_with_path(mask, grads)


def freeze_params_by_name(params, needle: str):
    """``stop_gradient`` every param whose path contains ``needle``.

    Applied *inside* the loss function (at trace time, not on the grad
    tree afterwards), so XLA sees the frozen parameters as constants and
    dead-code-eliminates their entire backward chain. For the radar
    stack that chain is the transcendental-heavy phase backward — ~half
    the frozen-phase step time when it is merely masked out after the
    fact (32.4 -> 17.3 ms at B=16, scripts/bench_spec_decompose.py)."""

    def freeze(path, p):
        if _path_has(path, needle):
            return jax.lax.stop_gradient(p)
        return p

    return jax.tree_util.tree_map_with_path(freeze, params)


def make_train_step(
    global_batch_size: int,
    l2_weight: float = 0.0,
    freeze_name: str = "adjacency_matrix",
):
    """Build the jittable GNN train step.

    Returns ``step(state, batch_x, batch_y_onehot, train_adj) -> (state,
    metrics)`` where metrics carries summed statistics (loss numerator,
    correct counts) that the caller may aggregate across steps/devices.
    """

    def step(state, x, y, train_adj):
        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = total_loss(
                logits, y, params, global_batch_size, l2_weight
            )
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = mask_gradients_by_name(grads, freeze_name, train_adj)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)

        labels = jnp.argmax(y, axis=-1)
        top1 = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
        top5_preds = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
        top5 = jnp.sum(jnp.any(top5_preds == labels[:, None], axis=-1))
        metrics = {
            "loss": loss,
            "correct": top1,
            "correct_top5": top5,
            "count": jnp.asarray(x.shape[0], jnp.int32),
        }
        return state, metrics

    return step


def make_eval_step():
    """Forward-only step returning softmax probabilities
    (``main_gnn.py:205-208``)."""

    def step(state, x):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
        return jax.nn.softmax(logits, axis=-1)

    return step


def make_radar_train_step(
    global_batch_size: int,
    train_lambda: bool = False,
    train_loc: bool = False,
):
    """Train step for the spectrogram stack (``main_spectrogram.py``
    semantics): mean-reduced CE (torch ``CrossEntropyLoss``), Adam driven
    by the caller's optimizer, and *staged unfreezing* of the radar
    parameters — ``train_lambda`` / ``train_loc`` gate the
    ``radar_lambda`` / ``radar_loc`` gradients, reproducing what the
    reference's epoch-gated ``requires_grad`` toggles intended
    (``main_spectrogram.py:128-136``; a silent no-op there because the
    names never match — see :mod:`..models.spectrogram`).

    The flags are **static** (baked into the compiled program, one
    compile per phase — the trainer flips at most twice per run): a
    frozen parameter is ``stop_gradient``-ed inside the loss, so XLA
    dead-code-eliminates its backward chain entirely. The radar physics
    backward is approximately as expensive as the whole rest of the
    step — a runtime flag + post-hoc gradient mask kept that chain alive
    on every frozen step and cost ~1.9x frozen-phase throughput
    (32.4 vs 17.3 ms/step at B=16 on v5e). Frozen-leaf gradients are
    exact zeros either way, so optimizer semantics (including the
    physics partition's active-step decay counter, ``train/optim.py``)
    are unchanged.
    """

    def step(state, x, y):
        def loss_fn(params):
            p = params
            if not train_lambda:
                p = freeze_params_by_name(p, "radar_lambda")
            if not train_loc:
                p = freeze_params_by_name(p, "radar_loc")
            logits, mutated = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            ce = jnp.sum(
                -jnp.sum(jax.nn.log_softmax(logits) * y, axis=-1)
            ) / global_batch_size
            return ce, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)

        labels = jnp.argmax(y, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        # NB: no per-sample tensors (e.g. preds) in the metrics — the
        # data-parallel wrapper replicates metric outputs, which would
        # turn a per-sample entry into an all-gather every step; the
        # train phase only ever consumes the summed scalars.
        metrics = {
            "loss": loss,
            "correct": jnp.sum(preds == labels),
            "count": jnp.asarray(x.shape[0], jnp.int32),
        }
        return state, metrics

    return step


# simple default for interactive use
eval_step = make_eval_step()
