"""Learning-rate schedules matching both reference trainers.

* GNN: piecewise-constant SGD schedule with 10x decays at iteration
  boundaries ``step_epochs * 40000 // batch_size`` (``main_gnn.py:303-314``).
* Spectrogram: torch ``CyclicLR`` triangular cycling between ``1e-4`` and
  ``base_lr`` with ``step_size_up`` epochs per half-cycle
  (``main_spectrogram.py:107-111``, stepped per *epoch* at ``:189``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def reference_gnn_boundaries(
    step_epochs: Sequence[int], batch_size: int, samples_per_epoch: int = 40000
):
    """Iteration boundaries of ``main_gnn.py:303``."""
    return [(s * samples_per_epoch) // batch_size for s in step_epochs]


def piecewise_constant(base_lr: float, boundaries: Sequence[int], decay=0.1):
    """``base_lr * decay^i`` after the i-th boundary.

    Matches TF ``PiecewiseConstantDecay`` exactly: boundaries are
    left-inclusive (``values[0]`` while ``step <= boundaries[0]``)."""
    bounds = jnp.asarray(list(boundaries))
    values = jnp.asarray(
        [base_lr * (decay**i) for i in range(len(boundaries) + 1)]
    )

    def schedule(count):
        idx = jnp.sum(count > bounds)
        return values[idx]

    return schedule


def cyclic_triangular(base_lr: float, max_lr: float, step_size_up: int):
    """torch ``CyclicLR(mode='triangular', cycle_momentum=False)``.

    ``lr(t) = base + (max - base) * max(0, 1 - |t/step - 2*cycle - 1|)``.
    """

    def schedule(count):
        cycle = jnp.floor(1.0 + count / (2.0 * step_size_up))
        x = jnp.abs(count / step_size_up - 2.0 * cycle + 1.0)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule
