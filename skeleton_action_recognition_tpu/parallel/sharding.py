"""Sharding policies: how states and batches live on the mesh."""

from __future__ import annotations

import jax
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
        """Place host arrays with the batch axis split over the mesh."""
        out = tuple(
            jax.device_put(a, self.batch_sharding) for a in arrays
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
