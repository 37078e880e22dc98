"""ST-PGCN-P: ST-GCN trunk ending in a projection-pooling pyramid.

Parity with ``models/stpgcnp.py:120-179``: 8 ST-GCN blocks
(64 x2, 128 @s2 x2, 256 @s2, 256, 256 @s2, 256 — ``stpgcnp.py:133-140``)
followed by ``ProjectionGraphPool(512) -> GraphConv(256) ->
ProjectionGraphPool(256) -> GraphConv(512)`` (``:141-144``), global average
pooling over the projected vertex axis, mean over bodies, dense logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
from skeleton_action_recognition_tpu.models.gcn import GraphConv
from skeleton_action_recognition_tpu.models.layers import CONV_INIT
from skeleton_action_recognition_tpu.models.projection import (
    ProjectionGraphPool,
)
from skeleton_action_recognition_tpu.models.stgcn import (
    DataBatchNorm,
    STConvBlock,
    reshape_skeleton_input,
)

_BLOCK_PLAN = (
    (64, 1, False),
    (64, 1, True),
    (128, 2, True),
    (128, 1, True),
    (256, 2, True),
    (256, 1, True),
    (256, 2, True),
    (256, 1, True),
)


class Model(nn.Module):
    """ST-PGCN-P model (``models/stpgcnp.py:120-179``)."""

    num_classes: int = 60
    trainable_adjacency: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        a_init = Graph("spatial").A.astype(np.float32)
        if self.trainable_adjacency:
            a = self.param(
                "adjacency_matrix", lambda rng: jnp.asarray(a_init)
            )
        else:
            a = jnp.asarray(a_init)

        x, n, m = reshape_skeleton_input(x)
        x = DataBatchNorm(name="data_bn")(x, train)

        for i, (filters, stride, residual) in enumerate(_BLOCK_PLAN):
            x, a = STConvBlock(
                filters, stride=stride, residual=residual, name=f"block_{i}"
            )(x, a, train)

        x, a = ProjectionGraphPool(512, name="pool_0")(x, a, train)
        x, a = GraphConv(256, name="gconv_0")(x, a, train)
        x, a = ProjectionGraphPool(256, name="pool_1")(x, a, train)
        x, a = GraphConv(512, name="gconv_1")(x, a, train)

        x = jnp.mean(x, axis=1)  # average over projected vertices
        x = x.reshape(n, m, -1).mean(axis=1)
        x = nn.Dense(
            self.num_classes, kernel_init=CONV_INIT, name="logits"
        )(x)
        return x
