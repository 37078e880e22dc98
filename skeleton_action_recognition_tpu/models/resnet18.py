"""ResNet-18 for single-channel spectrograms (flax.linen, NHWC).

Parity with the reference's vendored torchvision ResNet
(``models/resnet18.py``) including its two modifications: the stem conv
takes **1 channel** (``resnet18.py:159-164``) and the width is
parameterized by ``num_filters`` (``:141,147,168-183``). Kaiming fan-out
init (``:187-194``) and optional zero-init of the last BN scale in each
block (``:199-204``) are reproduced. BatchNorm uses torch defaults
(``eps=1e-5``, running-stat momentum 0.1 -> flax ``momentum=0.9``).

The reference's broken ``pretrained=True`` path (undefined
``load_state_dict_from_url``, ``resnet18.py:257-263``) is intentionally not
reproduced.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(train: bool, name=None, scale_init=nn.initializers.ones,
        dtype=None):
    # dtype=bfloat16 keeps the normalize pass (and the activation written
    # back to HBM) in bf16; flax accumulates batch stats in f32 and
    # params/running stats stay f32
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        name=name,
        scale_init=scale_init,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/projection shortcut
    (``resnet18.py:26-76``)."""

    filters: int
    stride: int = 1
    zero_init_residual: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.Conv(
            self.filters,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=KAIMING,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = _bn(train, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.filters,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=KAIMING,
            dtype=self.dtype,
            name="conv2",
        )(out)
        scale_init = (
            nn.initializers.zeros
            if self.zero_init_residual
            else nn.initializers.ones
        )
        out = _bn(
            train, name="bn2", scale_init=scale_init, dtype=self.dtype
        )(out)

        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(
                self.filters,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=KAIMING,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = _bn(
                train, name="downsample_bn", dtype=self.dtype
            )(identity)

        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Width-parameterized ResNet with BasicBlocks
    (``resnet18.py:131-251``). Input NHWC with 1 channel."""

    num_classes: int = 60
    num_filters: int = 64
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    zero_init_residual: bool = False
    # compute dtype for convs/BN (params stay f32); e.g. jnp.bfloat16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            self.num_filters,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            kernel_init=KAIMING,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = _bn(train, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        for stage, blocks in enumerate(self.stage_sizes):
            filters = self.num_filters * (2**stage)
            for block in range(blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(
                    filters,
                    stride=stride,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)

        # pool + logits head in f32 (logit stability; cost is tiny)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            ),
            name="fc",
        )(x)
        return x


def resnet18(num_classes: int = 60, num_filters: int = 64, **kwargs):
    """Constructor mirroring ``resnet18()`` (``resnet18.py:266-274``)."""
    return ResNet(
        num_classes=num_classes, num_filters=num_filters, **kwargs
    )


Model = ResNet
