"""Device-mesh construction.

The reference's only parallelism is synchronous data-parallel replication
(``tf.distribute.MirroredStrategy``, ``main_gnn.py:257``; SURVEY §2
"Parallelism inventory"). The TPU-native equivalent is a 1-D device mesh
whose ``data`` axis shards the batch; gradient all-reduce compiles to XLA
``psum`` over ICI. The mesh generalizes to 2-D (``data`` x ``model``) for
tensor-parallel experiments, though the reference models are small enough
that DP saturates a v5e slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when a
    coordinator is configured via the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``] or a TPU pod environment). No-op on single-host.

    Multi-host data loading composes with this through the per-host shard
    partitioning in :class:`..data.pipeline.TFRecordDataset` (each host
    reads a disjoint shard subset; gradients psum over DCN+ICI).
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            return True
        except (RuntimeError, ValueError):
            return False
    return False


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With the default 1-D ``('data',)`` axis, every device is a data-parallel
    replica. Pass e.g. ``axis_names=('data', 'model'), shape=(4, 2)`` for a
    2-D layout.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))
