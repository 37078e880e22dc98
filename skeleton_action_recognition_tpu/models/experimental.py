"""Experimental zoo — working equivalents of ``models/stgcn_debug.py``.

The reference file is a self-described sandbox ("Some methods might not
work!!", ``stgcn_debug.py:4-7``), not exported from ``models/__init__``.
Implemented here as functioning, tested layers:

* :class:`GPool` — top-k graph pooling via a learnable projection vector,
  with the adjacency replaced by its 2nd graph power gathered at the kept
  vertices (``stgcn_debug.py:29-72``).
* :class:`SGCN` — spatial conv with *batched* (per-sample) adjacency,
  einsum ``'nkctv,nkvw->nctw'`` (``:93-115``).
* :class:`SGTACN` — spatial conv with a trainable **per-timestep**
  adjacency ``(K, T, V, V)``, einsum ``'nkctv,ktvw->nctw'`` (``:118-145``);
  the parameter is named ``adjacency_matrix`` so the freeze-graph-until
  mask applies.
* :class:`Model` — the debug ST-GCN wiring SGTACN blocks with fixed
  temporal dims 300/150/75 (``:238-293``). Note its residual quirk: with
  ``stride == 1`` the identity shortcut is used even when channel counts
  differ unless ``downsample=True`` (``:200-214``) — the block plan always
  sets ``downsample`` at channel changes, so the quirk is latent; we keep
  the same plan.

Also hosts :class:`TemporalAttention`, the sigmoid-gated frame-attention
MLP defined (but unused) at ``models/stgcn.py:67-85``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
from skeleton_action_recognition_tpu.models.layers import (
    CONV_INIT,
    batch_norm,
)
from skeleton_action_recognition_tpu.models.stgcn import (
    DataBatchNorm,
    TemporalConv,
    reshape_skeleton_input,
)


class GPool(nn.Module):
    """Top-k vertex pooling. Input ``(N, T, V, C)`` + ``(K, V, V)`` or
    ``(N, K, V, V)``; output keeps ``ceil(keeprate * V)`` vertices."""

    keeprate: float

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        n, t, v, c = x.shape
        keep = int(self.keeprate * v)
        p = self.param(
            "projection_vector",
            nn.initializers.lecun_normal(),
            (c * t, 1),
        )
        feats = jnp.transpose(x, (0, 2, 1, 3)).reshape(n, v, t * c)
        p_hat = p / jnp.maximum(jnp.linalg.norm(p), 1e-12)
        y = feats @ p_hat  # (N, V, 1)

        order = jnp.argsort(-y[..., 0], axis=-1)[:, :keep]  # (N, keep)
        y_hat = jax.nn.sigmoid(
            jnp.take_along_axis(y[..., 0], order, axis=1)
        )
        kept = jnp.take_along_axis(
            feats, order[:, :, None], axis=1
        ) * y_hat[:, :, None]

        if a.ndim == 3:
            a = jnp.broadcast_to(a[None], (n,) + a.shape)
        a2 = jnp.einsum("nkuv,nkvw->nkuw", a, a)  # 2nd graph power
        a2 = jnp.take_along_axis(
            a2, order[:, None, :, None], axis=2
        )
        a2 = jnp.take_along_axis(
            a2, order[:, None, None, :], axis=3
        )

        out = kept.reshape(n, keep, t, c).transpose(0, 2, 1, 3)
        return out, a2


class SGCN(nn.Module):
    """Spatial conv with per-sample adjacency ``(N, K, V, V)``."""

    filters: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        z = nn.Dense(
            self.filters * self.kernel_size, kernel_init=CONV_INIT
        )(x)
        z = z.reshape(z.shape[:-1] + (self.kernel_size, self.filters))
        x = jnp.einsum("ntvko,nkvw->ntwo", z, a)
        return x, a


class SGTACN(nn.Module):
    """Spatial conv with trainable per-timestep adjacency
    ``(K, T, V, V)``."""

    filters: int
    adjacency_init: np.ndarray  # (K, V, V)
    temporal_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.param(
            "adjacency_matrix",
            lambda rng: jnp.broadcast_to(
                jnp.asarray(self.adjacency_init, jnp.float32)[:, None],
                (self.kernel_size, self.temporal_dim)
                + self.adjacency_init.shape[1:],
            ).copy(),
        )
        z = nn.Dense(
            self.filters * self.kernel_size, kernel_init=CONV_INIT
        )(x)
        z = z.reshape(z.shape[:-1] + (self.kernel_size, self.filters))
        return jnp.einsum("ntvko,ktvw->ntwo", z, a)


class STGCNDebugBlock(nn.Module):
    """SGTACN + temporal conv + residual (``stgcn_debug.py:170-222``)."""

    filters: int
    adjacency_init: np.ndarray
    temporal_dim: int
    stride: int = 1
    residual: bool = True
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if not self.residual:
            res = 0.0
        elif self.stride == 1 and not self.downsample:
            res = x
        else:
            res = nn.Conv(
                self.filters,
                (1, 1),
                strides=(self.stride, 1),
                padding="SAME",
                kernel_init=CONV_INIT,
                name="residual_conv",
            )(x)
            res = batch_norm(train, name="residual_bn")(res)

        x = SGTACN(
            self.filters, self.adjacency_init, self.temporal_dim,
            name="sgcn",
        )(x, train)
        x = TemporalConv(self.filters, stride=self.stride, name="tgcn")(
            x, train
        )
        return nn.relu(x + res)


class TemporalAttention(nn.Module):
    """Sigmoid-gated per-frame attention MLP (``models/stgcn.py:67-85``,
    defined-but-unused in the reference). Input/output ``(N, T, V, C)``."""

    num_hidden: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        h = x.reshape(n, t, v * c)
        for units in self.num_hidden:
            h = nn.relu(nn.Dense(units)(h))
        gate = nn.sigmoid(nn.Dense(1)(h))  # (N, T, 1)
        return x * gate[..., None]


class Model(nn.Module):
    """Debug ST-GCN with per-timestep trainable adjacency
    (``stgcn_debug.py:238-293``). Input must have T=300."""

    num_classes: int = 60

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Graph("spatial").A.astype(np.float32)
        plan = [
            (64, 300, 1, False, False),
            (64, 300, 1, True, False),
            (64, 300, 1, True, False),
            (64, 300, 1, True, False),
            (128, 300, 2, True, True),
            (128, 150, 1, True, False),
            (128, 150, 1, True, False),
            (256, 150, 2, True, True),
            (256, 75, 1, True, False),
            (256, 75, 1, True, False),
        ]
        x, n, m = reshape_skeleton_input(x)
        x = DataBatchNorm(name="data_bn")(x, train)
        for i, (f, tdim, stride, residual, down) in enumerate(plan):
            x = STGCNDebugBlock(
                f, a, tdim, stride=stride, residual=residual,
                downsample=down, name=f"block_{i}",
            )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = x.reshape(n, m, -1).mean(axis=1)
        return nn.Dense(
            self.num_classes, kernel_init=CONV_INIT, name="logits"
        )(x)
