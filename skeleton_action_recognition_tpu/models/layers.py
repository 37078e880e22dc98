"""Shared building blocks: initializers, norm config, regularization.

Reference conventions reproduced here:

* conv/dense kernels use He-style
  ``VarianceScaling(scale=2, fan_out, truncated_normal)`` with L2(1e-4)
  regularization (``models/gcn.py:4-6``);
* BatchNorm uses TF/Keras defaults ``momentum=0.99, epsilon=1e-3`` on the
  channel axis.

Activations are channels-last ``(N, T, V, C)`` throughout the GNN stack.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

CONV_INIT = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)
L2_WEIGHT = 1e-4

# Compute dtype for matmul-heavy layers (params stay float32). bfloat16
# feeds the MXU at full rate; BatchNorm statistics are always accumulated
# in float32 regardless.
DEFAULT_COMPUTE_DTYPE = None  # None = float32 everywhere (exact parity)


def batch_norm(train: bool, name: str | None = None, **kwargs) -> nn.BatchNorm:
    """BatchNorm with the reference stack's Keras defaults.

    Pass ``dtype=jnp.bfloat16`` to keep the normalize pass (and thus the
    activation written back to HBM) in bf16 — flax still accumulates the
    batch statistics in f32 internally, and parameters/running stats stay
    f32. Without it, f32 params promote a bf16 input to an f32 output,
    doubling the HBM traffic of every BN pass in the network.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1e-3,
        name=name,
        **kwargs,
    )


def l2_regularization(params, weight: float = L2_WEIGHT):
    """Keras-style L2 penalty over conv/dense kernels.

    The reference attaches ``tf.keras.regularizers.l2(1e-4)`` to every conv
    kernel (``models/gcn.py:4``); Keras adds ``weight * sum(w**2)`` (no 1/2)
    to the loss. BN scales/biases, adjacency matrices, and projection
    centers/variances carry no regularizer there, and are excluded here by
    filtering on the ``kernel`` leaf name.
    """
    import jax

    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        leaf_name = path[-1]
        key = getattr(leaf_name, "key", getattr(leaf_name, "name", None))
        if key == "kernel":
            total = total + jnp.sum(jnp.square(leaf))
    return weight * total


class PointwiseMLP(nn.Module):
    """1x1-conv MLP: [Dense -> BN -> act] x (n-1) -> Dense [-> BN -> act].

    Channels-last equivalent of the GIN MLPs built at
    ``models/gcn.py:123-143``: the final BN+activation is skipped when
    ``return_logits``.
    """

    features: Sequence[int]
    activation: Callable[[Any], Any] = nn.relu
    return_logits: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        for f in self.features[:-1]:
            x = nn.Dense(f, kernel_init=CONV_INIT)(x)
            x = batch_norm(train)(x)
            x = self.activation(x)
        x = nn.Dense(self.features[-1], kernel_init=CONV_INIT)(x)
        if not self.return_logits:
            x = batch_norm(train)(x)
            x = self.activation(x)
        return x
