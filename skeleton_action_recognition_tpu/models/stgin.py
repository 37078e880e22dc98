"""ST-GIN: ST-GCN topology with Graph-Isomorphism spatial convs.

Parity with ``models/stgin.py``: identical 10-block plan, but the spatial
conv is ``GraphIsoConvTD`` with a 2-layer ``[f/2, f/2]`` MLP per partition
(``stgin.py:24-25``), and the adjacency is the *first two* matrices of the
spatial-partition stack (``graph.A[:2]`` at ``stgin.py:86-89`` — identity
plus normalized inward; the GIN layer appends its own ``(1+eps)I``
partition).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
from skeleton_action_recognition_tpu.models.gcn import GraphIsoConvTD
from skeleton_action_recognition_tpu.models.stgcn import STGCNBackbone


def _gin_factory(filters: int) -> nn.Module:
    return GraphIsoConvTD(
        (filters // 2, filters // 2), name="sgcn"
    )


class Model(nn.Module):
    """ST-GIN model (``models/stgin.py:81-140``)."""

    num_classes: int = 60
    trainable_adjacency: bool = False
    dtype: Optional[Any] = None
    remat: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        a_init = Graph("spatial").A[:2].astype(np.float32)
        if self.trainable_adjacency:
            a = self.param(
                "adjacency_matrix", lambda rng: jnp.asarray(a_init)
            )
        else:
            a = jnp.asarray(a_init)
        return STGCNBackbone(
            self.num_classes,
            sgcn_factory=_gin_factory,
            dtype=self.dtype,
            remat=self.remat,
            name="backbone",
        )(x, a, train)
