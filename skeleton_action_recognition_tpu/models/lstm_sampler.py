"""LSTM temporal frame sampler.

Equivalent of ``models/lstm_sampler.py`` in the reference (dead code there —
the file has no imports and is not exported; implemented here as a working,
tested component): a stacked LSTM scores each timestep, the ``top_k``
highest-confidence frames are gathered (unsorted, as in ``tf.math.top_k``
with ``sorted=False`` semantics — order within the selection does not
matter downstream), and the selected frames are weighted by their scores.

Static ``top_k`` keeps shapes XLA-compatible (SURVEY §7 "hard parts":
dynamic-shape ops in the debug zoo).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalSampler(nn.Module):
    """Input ``(N, T, V, C)``; output ``(N, top_k, V, C)``."""

    num_hidden: Sequence[int]
    top_k: int = 200

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        h = x.reshape(n, t, v * c)
        for units in self.num_hidden:
            h = nn.RNN(nn.OptimizedLSTMCell(units))(h)
        scores = nn.RNN(nn.OptimizedLSTMCell(1))(h)[..., 0]  # (N, T)

        values, indices = jax.lax.top_k(scores, self.top_k)
        gathered = jnp.take_along_axis(
            x, indices[:, :, None, None], axis=1
        )
        return gathered * values[:, :, None, None]
