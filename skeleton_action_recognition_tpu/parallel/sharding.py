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

    def multi_batch_sharding(self) -> NamedSharding:
        """Sharding for ``(K, B, ...)`` stacks of K micro-batches: the
        scan axis K is unsharded, the batch axis B splits over the
        mesh."""
        return NamedSharding(self.mesh, P(None, self.axis))

    def shard_multi_batch(self, *arrays):
        """Place ``(K, B, ...)`` stacked micro-batches (see
        :func:`group_batches`); multi-host processes pass their local
        ``(K, B/process_count, ...)`` slices, mirroring
        :meth:`shard_host_batch`."""
        sh = self.multi_batch_sharding()
        if jax.process_count() == 1:
            out = tuple(jax.device_put(a, sh) for a in arrays)
        else:
            out = tuple(
                jax.make_array_from_process_local_data(sh, np.asarray(a))
                for a in arrays
            )
        return out if len(out) > 1 else out[0]

    def jit_multi_train_step(self, step, n_flags: int = 1):
        """Compile a ``lax.scan`` over K micro-batches — ONE device
        dispatch per K optimizer steps.

        Per-step dispatch through a high-latency device transport (the
        remote-TPU tunnel here; same reason ``tf.data`` pushes iteration
        into the device loop) caps CLI training throughput well below
        the compiled step's own rate; scanning K steps per call
        amortizes that latency K-fold. Takes ``(state, xs, ys, *flags)``
        with ``xs/ys`` stacked ``(K, B, ...)``; returns the final state
        and metrics stacked ``(K,)`` — step-for-step equivalent to K
        sequential :meth:`jit_train_step` calls up to f32 reassociation
        in the separately-compiled programs (``tests/test_parallel.py``).
        The scan length is static, so each distinct K (the group size
        plus at most one epoch-tail remainder) compiles once.
        """

        def multi(state, xs, ys, *flags):
            def body(s, xy):
                s, m = step(s, xy[0], xy[1], *flags)
                return s, m

            return jax.lax.scan(body, state, (xs, ys))

        return jax.jit(
            multi,
            in_shardings=(
                self.replicated,
                self.multi_batch_sharding(),
                self.multi_batch_sharding(),
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


def group_batches(iterator, k: int):
    """Stack consecutive ``(x, y)`` batches into ``(K, B, ...)``
    super-batches for :meth:`DataParallel.jit_multi_train_step`.

    Yields stacks of exactly ``k`` batches; a final shorter stack
    carries the epoch's remainder (its scan program compiles once —
    the tail length is the same every epoch). Requires constant ``B``
    across the iterator (the trainers drop the partial batch in the
    train phase, so this holds there).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    buf_x, buf_y = [], []
    for x, y in iterator:
        if buf_x and x.shape[0] != buf_x[0].shape[0]:
            raise ValueError(
                "group_batches (--steps-per-dispatch > 1) requires a "
                "constant batch size across the iterator, got "
                f"{x.shape[0]} after {buf_x[0].shape[0]} — feed it a "
                "drop_remainder iterator"
            )
        buf_x.append(x)
        buf_y.append(y)
        if len(buf_x) == k:
            yield np.stack(buf_x), np.stack(buf_y)
            buf_x, buf_y = [], []
    if buf_x:
        yield np.stack(buf_x), np.stack(buf_y)


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
