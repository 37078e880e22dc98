"""ST-GCN: spatio-temporal graph convolutional network.

Parity with ``models/stgcn.py`` in the reference: 10 blocks
(64 x4, 128 x3 @stride2, 256 x3 @stride2 — ``stgcn.py:114-123``), each
block = spatial partition conv + BN/ReLU + ``[9,1]`` temporal conv + BN +
residual (``stgcn.py:26-64``), a data BatchNorm over the flattened
``(V*C)`` features (``stgcn.py:142-147``), global average pooling, mean
over bodies, and a dense logits head (``stgcn.py:154-159``).

TPU-first differences: activations are channels-last ``(NM, T, V, C)``;
the spatial conv is one MXU matmul plus a tiny adjacency contraction; the
whole forward is a single XLA program (no per-layer graph retracing).

The adjacency is the NTU spatial-partition stack. It is a non-trainable
constant by default (matching ``stgcn.py:105-109`` where
``trainable=False``); with ``trainable_adjacency=True`` it becomes a
parameter named ``adjacency_matrix`` governed by the trainer's
freeze-graph-until mask.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
from skeleton_action_recognition_tpu.models.gcn import GraphConvTD
from skeleton_action_recognition_tpu.models.layers import (
    CONV_INIT,
    batch_norm,
)


class TemporalConv(nn.Module):
    """BN -> ReLU -> Conv[kt, 1] (stride t) -> BN (``stgcn.py:26-38``)."""

    filters: int
    kernel_size: int = 9
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = batch_norm(train)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.filters,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding="SAME",
            kernel_init=CONV_INIT,
            dtype=self.dtype,
        )(x)
        x = batch_norm(train)(x)
        return x


class STConvBlock(nn.Module):
    """One spatio-temporal block: spatial conv + temporal conv + residual.

    ``sgcn_factory`` builds the spatial module (``GraphConvTD`` for ST-GCN,
    ``GraphIsoConvTD`` for ST-GIN), mirroring how the two reference model
    files differ only in that one line (``stgcn.py:24`` vs ``stgin.py:24``).
    Residual selection follows ``stgcn.py:41-56``: identity when channels
    and stride match, 1x1 strided conv + BN otherwise, absent for the first
    block.
    """

    filters: int
    stride: int = 1
    residual: bool = True
    sgcn_factory: Optional[Callable[[int], nn.Module]] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, a, train: bool):
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.filters and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.filters,
                kernel_size=(1, 1),
                strides=(self.stride, 1),
                padding="SAME",
                kernel_init=CONV_INIT,
                dtype=self.dtype,
                name="residual_conv",
            )(x)
            res = batch_norm(train, name="residual_bn")(res)

        factory = self.sgcn_factory or (
            lambda f: GraphConvTD(f, dtype=self.dtype, name="sgcn")
        )
        x, a = factory(self.filters)(x, a, train)
        x = TemporalConv(
            self.filters, stride=self.stride, dtype=self.dtype,
            name="tgcn",
        )(x, train)
        x = nn.relu(x + res)
        return x, a


class DataBatchNorm(nn.Module):
    """BatchNorm over flattened ``(V * C)`` input features
    (``stgcn.py:142-147``): stats per (joint, channel) over batch x time."""

    @nn.compact
    def __call__(self, x, train: bool):
        nm, t, v, c = x.shape
        x = x.reshape(nm, t, v * c)
        x = batch_norm(train)(x)
        return x.reshape(nm, t, v, c)


def reshape_skeleton_input(x):
    """``(N, C, T, V, M)`` -> per-body channels-last ``(N*M, T, V, C)``."""
    n, c, t, v, m = x.shape
    x = jnp.transpose(x, (0, 4, 2, 3, 1))  # N, M, T, V, C
    return x.reshape(n * m, t, v, c), n, m


class STGCNBackbone(nn.Module):
    """data-BN + 10 ST blocks + pooling/logits head, shared by the ST-GCN
    family (the per-model differences are injected via ``block_plan`` /
    ``sgcn_factory``)."""

    num_classes: int = 60
    block_plan: tuple = (
        (64, 1, False),
        (64, 1, True),
        (64, 1, True),
        (64, 1, True),
        (128, 2, True),
        (128, 1, True),
        (128, 1, True),
        (256, 2, True),
        (256, 1, True),
        (256, 1, True),
    )
    sgcn_factory: Optional[Callable[[int], nn.Module]] = None
    extra_block_index: int = -1  # insert hook (used by STPGCN)
    extra_block_factory: Optional[Callable[[], nn.Module]] = None
    dtype: Optional[Any] = None
    remat: bool = True
    # 'full' recomputes whole blocks in backward; 'dots' saves matmul/conv
    # outputs and recomputes only the cheap (HBM-bound) elementwise chains
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, a, train: bool):
        x, n, m = reshape_skeleton_input(x)
        x = DataBatchNorm(name="data_bn")(x, train)

        if not self.remat:
            block_cls = STConvBlock
        elif self.remat_policy == "dots":
            import jax

            block_cls = nn.remat(
                STConvBlock,
                static_argnums=(3,),
                policy=jax.checkpoint_policies.checkpoint_dots,
            )
        else:
            block_cls = nn.remat(STConvBlock, static_argnums=(3,))
        for i, (filters, stride, residual) in enumerate(self.block_plan):
            x, a = block_cls(
                filters,
                stride=stride,
                residual=residual,
                sgcn_factory=self.sgcn_factory,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, a, train)
            if i == self.extra_block_index and self.extra_block_factory:
                x, a = self.extra_block_factory()(x, a, train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool over (T, V)
        x = x.reshape(n, m, -1).mean(axis=1)  # mean over bodies
        x = nn.Dense(
            self.num_classes, kernel_init=CONV_INIT, name="logits"
        )(x)
        return x


class Model(nn.Module):
    """ST-GCN model (``models/stgcn.py:101-160``).

    Input ``(N, 3, T, V, M)``, output ``(N, num_classes)`` logits.
    """

    num_classes: int = 60
    trainable_adjacency: bool = False
    dtype: Optional[Any] = None  # e.g. jnp.bfloat16 for MXU-rate compute
    remat: bool = True  # rematerialize blocks (trade FLOPs for HBM)
    remat_policy: str = "full"  # or 'dots' (save matmuls, redo elementwise)

    @nn.compact
    def __call__(self, x, train: bool = False):
        a_init = Graph("spatial").A.astype(np.float32)
        if self.trainable_adjacency:
            a = self.param(
                "adjacency_matrix", lambda rng: jnp.asarray(a_init)
            )
        else:
            a = jnp.asarray(a_init)
        return STGCNBackbone(
            self.num_classes,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            name="backbone",
        )(x, a, train)
