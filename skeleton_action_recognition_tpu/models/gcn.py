"""Graph-convolution layer zoo (flax.linen, channels-last).

Re-designs of the five primitives in the reference's ``models/gcn.py``
(``GraphConv:22``, ``GraphIsoConv:54``, ``GraphIsoConvTD:112``,
``GraphConvTD:187``, ``AdjGraphConv:212``). All layers take and return
``(x, A)`` so downstream layers may rewrite the graph mid-network (the
projection pools in :mod:`.stpgcnp` rely on this).

Layout: activations are channels-last — ``(N, V, C)`` for the static-graph
layers, ``(N, T, V, C)`` for the temporal (``*TD``) layers. Adjacency is
``(V, V)``, ``(K, V, V)``, or batched ``(N, V, V)``; ``A[.., v, w]`` routes
source ``v`` into destination ``w``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.models.layers import (
    CONV_INIT,
    PointwiseMLP,
)


def _adjacency_einsum(x, a):
    """Contract node axis of ``(..., V, C)`` with ``A``s trailing ``(V, W)``."""
    if a.ndim == 2:
        return jnp.einsum("...vc,vw->...wc", x, a)
    if a.ndim == 3 and a.shape[0] == x.shape[0]:
        return jnp.einsum("n...vc,nvw->n...wc", x, a)
    raise ValueError(f"unsupported adjacency shape {a.shape}")


class GraphConv(nn.Module):
    """1x1 conv then adjacency contraction (``models/gcn.py:22-36``).

    Input ``(N, V, C)``; adjacency ``(V, V)`` shared or ``(N, V, V)``
    per-sample (the reference's ``'ncv,nvw->ncw'`` einsum is per-sample).
    """

    filters: int

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        x = nn.Dense(self.filters, kernel_init=CONV_INIT)(x)
        x = _adjacency_einsum(x, a)
        return x, a


class GraphIsoConv(nn.Module):
    """GIN conv: ``(A + (1+eps) I)`` aggregation then MLP
    (``models/gcn.py:54-93``)."""

    features: Sequence[int]
    return_logits: bool = False

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        eps = self.param(
            "epsilon", nn.initializers.zeros, (), jnp.float32
        )
        v = a.shape[-1]
        a_hat = a + (1.0 + eps) * jnp.eye(v, dtype=x.dtype)
        x = _adjacency_einsum(x, a_hat)
        x = PointwiseMLP(
            tuple(self.features), return_logits=self.return_logits
        )(x, train)
        return x, a


class GraphIsoConvTD(nn.Module):
    """GIN conv over ``(N, T, V, C)`` with per-partition MLPs
    (``models/gcn.py:112-163``).

    The binary adjacency stack ``(K-1, V, V)`` is extended with a
    ``(1 + eps) I`` partition (appended last, matching the reference's
    concat order), each partition gets its own MLP, and partition outputs
    are summed.
    """

    features: Sequence[int]
    kernel_size: int = 3
    return_logits: bool = False

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        eps = self.param(
            "epsilon", nn.initializers.zeros, (), jnp.float32
        )
        v = a.shape[-1]
        self_loop = (1.0 + eps) * jnp.eye(v, dtype=x.dtype)
        a_full = jnp.concatenate([a, self_loop[None]], axis=0)
        agg = jnp.einsum("ntvc,kvw->kntwc", x, a_full)
        out = 0.0
        for k in range(self.kernel_size):
            out = out + PointwiseMLP(
                tuple(self.features),
                return_logits=self.return_logits,
                name=f"mlp_{k}",
            )(agg[k], train)
        return out, a


class _DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s variable tree (used by
    the fused-kernel path so checkpoints stay interchangeable)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", CONV_INIT, (in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,),
            jnp.float32,
        )
        return kernel, bias


class GraphConvTD(nn.Module):
    """ST-GCN spatial conv (``models/gcn.py:187-209``).

    One 1x1 conv produces ``K * filters`` channels (partition-major), which
    are contracted against the ``(K, V, V)`` spatial-partition stack:
    ``out[.., w, c] = sum_k sum_v A[k, v, w] z[.., v, k, c]``.

    The two contractions commute; ``adjacency_first=True`` aggregates over
    the graph *before* the channel matmul — identical parameters and math
    (associativity), but the stored intermediate is ``K * C_in`` channels
    instead of ``K * C_out``, which halves peak activation memory at the
    channel-doubling blocks and removes XLA's transpose copies of the
    ``(..., V, K, C_out)`` tensor on the backward path.

    ``fused=True`` routes through the fused Pallas kernel
    (:func:`..ops.pallas.sgcn.make_fused_graph_conv`): the ``K * C_out``
    intermediate stays in VMEM instead of round-tripping HBM. Requires a
    *constant* adjacency (numpy passed via ``fused_adjacency``) — not
    compatible with trainable adjacency stacks.
    """

    filters: int
    kernel_size: int = 3
    dtype: Optional[Any] = None
    # Measured on v5e: the conv-first (reference-order) formulation beats
    # both adjacency-first variants (einsum 'ntwkc': OOM-prone transpose
    # copies; per-k concat: ~25% slower end-to-end), so it stays default.
    adjacency_first: bool = False
    fused: bool = False
    fused_adjacency: Optional[np.ndarray] = None
    # with ``fused``: also emit BN batch statistics (sum, sum-of-squares)
    # from the kernel epilogue in training — ``__call__`` then returns
    # ``((out, s, ss), a)`` for a stats-consuming BatchNorm
    # (:class:`..stgcn.StatsTemporalConv`)
    emit_stats: bool = False

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        if self.fused:
            from skeleton_action_recognition_tpu.ops.pallas.sgcn import (
                make_fused_graph_conv,
            )

            a_np = self.fused_adjacency
            assert a_np is not None, (
                "fused GraphConvTD needs the constant adjacency as "
                "numpy (fused_adjacency=...)"
            )
            c_in = x.shape[-1]
            kernel, bias = _DenseParams(
                self.filters * self.kernel_size, name="Dense_0"
            )(c_in)
            with_stats = self.emit_stats and train
            fgc = make_fused_graph_conv(
                a_np, x.shape[2], with_stats=with_stats
            )
            out = fgc(x.astype(self.dtype or x.dtype), kernel, bias)
            return out, a

        a = a.astype(self.dtype or x.dtype)
        if self.adjacency_first:
            xc = x.astype(self.dtype or x.dtype)
            # per-partition contraction, concatenated on channels: keeps
            # each intermediate in the activation layout (XLA inserted
            # ~700 MB layout copies for the single 5-D einsum form)
            agg = jnp.concatenate(
                [
                    jnp.einsum("ntvc,vw->ntwc", xc, a[k])
                    for k in range(self.kernel_size)
                ],
                axis=-1,
            )
            # kernel shape ((K, C_in), C_out) — same function class as the
            # reference's conv-first (C_in, K*C_out) parameterization
            x = nn.Dense(
                self.filters, kernel_init=CONV_INIT, dtype=self.dtype
            )(agg)
            return x, a
        z = nn.Dense(
            self.filters * self.kernel_size,
            kernel_init=CONV_INIT,
            dtype=self.dtype,
        )(x)
        z = z.reshape(z.shape[:-1] + (self.kernel_size, self.filters))
        x = jnp.einsum("ntvko,kvw->ntwo", z, a)
        return x, a


class AdjGraphConv(nn.Module):
    """``GraphConvTD`` with its own *trainable* adjacency
    (``models/gcn.py:212-238``).

    The parameter is named ``adjacency_matrix`` so the trainer's
    freeze-graph-until mask (``main_gnn.py:228-232``) applies to it.
    """

    filters: int
    adjacency_init: np.ndarray  # (K, V, V)

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.param(
            "adjacency_matrix",
            lambda rng: jnp.asarray(self.adjacency_init, jnp.float32),
        )
        k = a.shape[0]
        z = nn.Dense(self.filters * k, kernel_init=CONV_INIT)(x)
        z = z.reshape(z.shape[:-1] + (k, self.filters))
        return jnp.einsum("ntvko,kvw->ntwo", z, a)
