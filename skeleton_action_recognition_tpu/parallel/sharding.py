"""Sharding policies: how states and batches live on the mesh."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DataParallel:
    """Synchronous data-parallel policy over a mesh's ``data`` axis.

    Parameters/optimizer state are replicated; batches are sharded on the
    leading (batch) dimension. ``jit``-ing a train step with these
    shardings makes XLA insert the gradient all-reduce (``psum``) over ICI
    — the TPU-native equivalent of MirroredStrategy's NCCL all-reduce.
    """

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.replicated = NamedSharding(mesh, P())
        self.batch_sharding = NamedSharding(mesh, P(axis))

    def shard_state(self, state):
        """Replicate a train state across the mesh."""
        return jax.device_put(state, self.replicated)

    def shard_batch(self, *arrays):
        """Place host arrays with the batch axis split over the mesh.

        Single-host semantics (or multi-host with *identical* data on
        every process — e.g. an eval set every host decodes in the same
        order). For disjoint per-host training data use
        :meth:`shard_host_batch`.
        """
        out = tuple(
            jax.device_put(a, self.batch_sharding) for a in arrays
        )
        return out if len(out) > 1 else out[0]

    def shard_host_batch(self, *arrays):
        """Assemble a global batch from per-process **local** slices.

        Each process passes its local batch of ``global_batch /
        process_count`` rows (its disjoint shard subset — the
        ``experimental_distribute_dataset`` contract,
        ``main_gnn.py:295``); rows land on the process's addressable
        devices, so nothing is decoded and thrown away. The global batch
        is the device-order concatenation of the per-process slices.
        """
        if jax.process_count() == 1:
            return self.shard_batch(*arrays)
        out = tuple(
            jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(a)
            )
            for a in arrays
        )
        return out if len(out) > 1 else out[0]

    def jit_train_step(self, step, n_flags: int = 1):
        """Compile a step with state replicated and batch sharded.

        ``n_flags`` is the number of trailing scalar arguments after
        ``(state, x, y)`` — 1 for the GNN step's ``train_adj``, 2 for the
        radar step's ``(train_lambda, train_loc)``.
        """
        return jax.jit(
            step,
            in_shardings=(
                self.replicated,
                self.batch_sharding,
                self.batch_sharding,
            )
            + (None,) * n_flags,
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,),
        )

    def jit_eval_step(self, step):
        return jax.jit(
            step,
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=self.batch_sharding,
        )


def shard_batch(mesh: Mesh, array, axis: str = "data"):
    """One-off batch placement helper."""
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def prefetch_to_device(iterator, place_fn, depth: int = 2):
    """Double-buffer host->device transfer against compute.

    Issues ``place_fn(*item)`` (e.g. ``dp.shard_host_batch``) for the
    NEXT ``depth - 1`` batches before yielding the current one, so the
    host->HBM copy of batch ``i+1`` overlaps step ``i``'s execution
    (``jax.device_put`` is asynchronous) — the ``tf.data``
    ``prefetch(AUTOTUNE)``-to-device equivalent the reference gets for
    free (``main_gnn.py:193-195``).
    """
    from collections import deque

    buf: deque = deque()
    for item in iterator:
        if not isinstance(item, tuple):
            item = (item,)
        placed = place_fn(*item)
        buf.append(placed if isinstance(placed, tuple) else (placed,))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
