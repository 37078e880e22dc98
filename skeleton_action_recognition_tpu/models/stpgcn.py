"""ST-PGCN: ST-GCN with a projection graph conv after the first block.

Parity with ``models/stpgcn.py:129-189``: the standard 10-block plan plus a
``ProjectionGraphConv(64, vertices=32)`` inserted after block 0
(``stpgcn.py:142-152``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
from skeleton_action_recognition_tpu.models.projection import (
    ProjectionGraphConv,
)
from skeleton_action_recognition_tpu.models.stgcn import STGCNBackbone


class Model(nn.Module):
    """ST-PGCN model (``models/stpgcn.py:129-189``)."""

    num_classes: int = 60
    trainable_adjacency: bool = False
    dtype: Optional[Any] = None
    remat: bool = True

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
            extra_block_index=0,
            extra_block_factory=lambda: ProjectionGraphConv(
                64, 32, name="projection"
            ),
            name="backbone",
        )(x, a, train)
