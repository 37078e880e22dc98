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
import jax
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
        x = batch_norm(train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.filters,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding="SAME",
            kernel_init=CONV_INIT,
            dtype=self.dtype,
        )(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return x


class _BNParams(nn.Module):
    """Parameter/stat holder matching ``nn.BatchNorm``'s variable tree
    (so the fused kernel path shares checkpoints with the stock path)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean, var


class _ConvParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s variable tree."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", CONV_INIT,
            (self.kernel_size, 1, in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class FusedTemporalConv(nn.Module):
    """``TemporalConv`` with the training-mode hot chain executed by the
    fused Pallas kernel (:func:`..ops.pallas.tconv.affine_relu_tconv`):
    BN1's normalize (as a folded per-channel affine), the ReLU, the 9-tap
    temporal conv, and BN2's batch statistics run in one VMEM pass — the
    normalized/ReLU'd intermediate never exists in HBM and the conv
    output is read back only once (for BN2's normalize + the residual
    join). Variable tree is identical to :class:`TemporalConv`, so
    checkpoints are interchangeable; parity (output AND both BatchNorms'
    statistics) is pinned in ``tests/test_pallas_tconv.py``.

    Stride-1 only — the two stride-2 blocks keep the stock XLA path.
    """

    filters: int
    kernel_size: int = 9
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        from skeleton_action_recognition_tpu.ops.pallas.tconv import (
            affine_relu_tconv,
        )

        c_in = x.shape[-1]
        g1, b1, m1, v1 = _BNParams(c_in, name="BatchNorm_0")()
        kernel, cbias = _ConvParams(
            self.filters, self.kernel_size, name="Conv_0"
        )(c_in)
        g2, b2, m2, v2 = _BNParams(self.filters, name="BatchNorm_1")()

        v_joints = x.shape[2]
        eps = self.epsilon
        cd = self.dtype or x.dtype

        if not train:
            scale1 = g1 * jax.lax.rsqrt(v1.value + eps)
            shift1 = b1 - m1.value * scale1
            h = jnp.maximum(
                x.astype(jnp.float32) * scale1 + shift1, 0.0
            ).astype(cd)
            u = jax.lax.conv_general_dilated(
                h, kernel.astype(cd), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + cbias
            scale2 = g2 * jax.lax.rsqrt(v2.value + eps)
            return u * scale2 + (b2 - m2.value * scale2)

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mu * mu
        scale1 = g1 * jax.lax.rsqrt(var + eps)
        shift1 = b1 - mu * scale1

        u, s2, ss2 = affine_relu_tconv(
            x.astype(cd), scale1, shift1, kernel, cbias,
            v_joints, self.kernel_size,
        )
        n = u.size // u.shape[-1]
        mu2 = s2 / n
        var2 = ss2 / n - mu2 * mu2

        if not self.is_initializing():
            mom = self.momentum
            m1.value = mom * m1.value + (1 - mom) * mu
            v1.value = mom * v1.value + (1 - mom) * var
            m2.value = mom * m2.value + (1 - mom) * mu2
            v2.value = mom * v2.value + (1 - mom) * var2

        scale2 = g2 * jax.lax.rsqrt(var2 + eps)
        return u.astype(jnp.float32) * scale2 + (
            b2 - mu2 * scale2
        )


class StatsTemporalConv(nn.Module):
    """``TemporalConv`` consuming precomputed BN1 batch statistics.

    Paired with the fused spatial kernel's stats epilogue
    (:func:`..ops.pallas.sgcn.make_fused_graph_conv` with
    ``with_stats=True``): in training, BN1's batch mean/var come from
    the kernel-emitted ``sum`` / ``sum-of-squares`` instead of a
    separate full read of the spatial activation, and the normalize +
    ReLU collapse to one per-channel affine fused by XLA into the
    temporal conv's input. Variable tree is identical to
    :class:`TemporalConv`, so checkpoints are interchangeable.
    """

    filters: int
    kernel_size: int = 9
    stride: int = 1
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, s, ss, train: bool):
        c_in = x.shape[-1]
        g1, b1, m1, v1 = _BNParams(c_in, name="BatchNorm_0")()
        eps = self.epsilon
        cd = self.dtype or x.dtype

        if train:
            n = x.size // c_in
            mu = s / n
            var = jnp.maximum(ss / n - mu * mu, 0.0)
            if not self.is_initializing():
                mom = self.momentum
                m1.value = mom * m1.value + (1 - mom) * mu
                v1.value = mom * v1.value + (1 - mom) * var
        else:
            mu, var = m1.value, v1.value

        scale1 = g1 * jax.lax.rsqrt(var + eps)
        shift1 = b1 - mu * scale1
        h = jnp.maximum(
            x.astype(jnp.float32) * scale1 + shift1, 0.0
        ).astype(cd)
        h = nn.Conv(
            self.filters,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding="SAME",
            kernel_init=CONV_INIT,
            dtype=self.dtype,
            name="Conv_0",
        )(h)
        return batch_norm(
            train, name="BatchNorm_1", dtype=self.dtype
        )(h)


class STConvBlock(nn.Module):
    """One spatio-temporal block: spatial conv + temporal conv + residual.

    ``sgcn_factory`` builds the spatial module (``GraphConvTD`` for ST-GCN,
    ``GraphIsoConvTD`` for ST-GIN), mirroring how the two reference model
    files differ only in that one line (``stgcn.py:24`` vs ``stgin.py:24``).
    Residual selection follows ``stgcn.py:41-56``: identity when channels
    and stride match, 1x1 strided conv + BN otherwise, absent for the first
    block. ``fused_tconv`` routes stride-1 temporal convs through the
    fused Pallas training kernel (:class:`FusedTemporalConv`).
    """

    filters: int
    stride: int = 1
    residual: bool = True
    sgcn_factory: Optional[Callable[[int], nn.Module]] = None
    dtype: Optional[Any] = None
    fused_tconv: bool = False
    fused_sgcn: bool = False
    fused_adjacency: Optional[np.ndarray] = None
    sgcn_stats: bool = False

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
            res = batch_norm(
                train, name="residual_bn", dtype=self.dtype
            )(res)

        use_stats = (
            self.sgcn_stats and self.fused_sgcn
            and self.sgcn_factory is None
        )
        factory = self.sgcn_factory or (
            lambda f: GraphConvTD(
                f,
                dtype=self.dtype,
                fused=self.fused_sgcn,
                fused_adjacency=self.fused_adjacency,
                emit_stats=use_stats,
                name="sgcn",
            )
        )
        x, a = factory(self.filters)(x, a, train)
        if use_stats:
            if train:
                x, s, ss = x
            else:
                s = ss = None
            x = StatsTemporalConv(
                self.filters, stride=self.stride, dtype=self.dtype,
                name="tgcn",
            )(x, s, ss, train)
        elif self.fused_tconv and self.stride == 1:
            x = FusedTemporalConv(
                self.filters, dtype=self.dtype, name="tgcn"
            )(x, train)
        else:
            x = TemporalConv(
                self.filters, stride=self.stride, dtype=self.dtype,
                name="tgcn",
            )(x, train)
        x = nn.relu(x + res)
        return x, a


class DataBatchNorm(nn.Module):
    """BatchNorm over flattened ``(V * C)`` input features
    (``stgcn.py:142-147``): stats per (joint, channel) over batch x time."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        nm, t, v, c = x.shape
        x = x.reshape(nm, t, v * c)
        x = batch_norm(train, dtype=self.dtype)(x)
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
    fused_tconv: bool = False
    fused_sgcn: bool = False
    fused_adjacency: Optional[np.ndarray] = None
    sgcn_stats: bool = False
    # fused spatial kernel only for blocks with >= this many output
    # channels: at C=64 the kernel's VP/block-diagonal padding overhead
    # exceeds the saved z-intermediate HBM round-trip, while the wide
    # blocks win (per-shape microbench + end-to-end A/B, ROADMAP #1)
    fused_sgcn_min_channels: int = 0

    @nn.compact
    def __call__(self, x, a, train: bool):
        x, n, m = reshape_skeleton_input(x)
        x = DataBatchNorm(name="data_bn", dtype=self.dtype)(x, train)

        if not self.remat:
            block_cls = STConvBlock
        elif self.remat_policy == "dots":
            block_cls = nn.remat(
                STConvBlock,
                static_argnums=(3,),
                policy=jax.checkpoint_policies.checkpoint_dots,
            )
        else:
            block_cls = nn.remat(STConvBlock, static_argnums=(3,))
        for i, (filters, stride, residual) in enumerate(self.block_plan):
            fuse_here = (
                self.fused_sgcn
                and filters >= self.fused_sgcn_min_channels
            )
            x, a = block_cls(
                filters,
                stride=stride,
                residual=residual,
                sgcn_factory=self.sgcn_factory,
                dtype=self.dtype,
                fused_tconv=self.fused_tconv,
                fused_sgcn=fuse_here,
                fused_adjacency=(
                    self.fused_adjacency if fuse_here else None
                ),
                sgcn_stats=self.sgcn_stats,
                name=f"block_{i}",
            )(x, a, train)
            if i == self.extra_block_index and self.extra_block_factory:
                x, a = self.extra_block_factory()(x, a, train)

        # pool in f32: a bf16 sum over T*V ~ 7.5k terms loses mantissa
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
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
    fused_tconv: bool = False  # fused Pallas temporal chain in training
    fused_sgcn: bool = False  # fused Pallas spatial conv (constant A only)
    # with fused_sgcn: BN1 batch stats from the spatial kernel's epilogue
    # (no separate reduce pass over the spatial activation)
    sgcn_stats: bool = False
    # fused spatial conv only on blocks with >= this many channels (the
    # narrow C=64 blocks lose to stock XLA — padding overhead > HBM win)
    fused_sgcn_min_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        a_init = Graph("spatial").A.astype(np.float32)
        if self.trainable_adjacency:
            a = self.param(
                "adjacency_matrix", lambda rng: jnp.asarray(a_init)
            )
        else:
            a = jnp.asarray(a_init)
        if self.fused_sgcn and self.trainable_adjacency:
            raise ValueError(
                "fused_sgcn bakes the adjacency into a constant MXU "
                "operand — incompatible with trainable_adjacency"
            )
        return STGCNBackbone(
            self.num_classes,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            fused_tconv=self.fused_tconv,
            fused_sgcn=self.fused_sgcn,
            fused_adjacency=a_init if self.fused_sgcn else None,
            sgcn_stats=self.sgcn_stats,
            fused_sgcn_min_channels=self.fused_sgcn_min_channels,
            name="backbone",
        )(x, a, train)
