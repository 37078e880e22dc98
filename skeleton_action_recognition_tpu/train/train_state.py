"""Train state: params + batch stats + optimizer state in one pytree."""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import optax
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    """flax TrainState extended with BatchNorm running statistics."""

    batch_stats: Any = None


def create_train_state(
    model,
    rng,
    sample_input,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Initialize model variables and wrap them with an optimizer."""
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.freeze({}))
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=batch_stats,
    )


def param_labels(params, match: Callable[[str], bool], on: str, off: str):
    """Label each param leaf by whether any path segment matches ``match``.

    Used with ``optax.multi_transform`` for the adjacency-freeze
    (``main_gnn.py:228-232``) and radar-unfreeze
    (``main_spectrogram.py:128-136``) masks.
    """

    def label(path, _leaf):
        keys = [
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        ]
        return on if any(match(str(k)) for k in keys) else off

    return jax.tree_util.tree_map_with_path(label, params)
