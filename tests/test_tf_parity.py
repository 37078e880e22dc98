"""Cross-framework parity: our layers vs reference-style TF/Keras layers.

Builds the reference's computations directly in TensorFlow (same
architecture the reference files define, constructed here from the
published equations — channels-first conv + adjacency einsum + Keras
BatchNorm), copies identical weights into both sides, and compares
outputs. This is the strongest available stand-in for "bit-compatible"
training parity given the dataset itself isn't shipped.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from skeleton_action_recognition_tpu.graphs import Graph
from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.models.gcn import GraphConvTD


def test_graph_conv_td_matches_tf():
    """Our channels-last GraphConvTD == TF conv2d(1x1, K*C) + einsum
    'nkctv,kvw->nctw' with the same kernel (models/gcn.py:187-209)."""
    rng = np.random.default_rng(0)
    n, t, v, ci, co, k = 2, 6, 25, 8, 16, 3
    x = rng.normal(size=(n, t, v, ci)).astype(np.float32)
    a = Graph("spatial").A.astype(np.float32)

    layer = GraphConvTD(co, adjacency_first=False)
    variables = layer.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(a)
    )
    kernel = np.asarray(variables["params"]["Dense_0"]["kernel"])
    bias = np.asarray(variables["params"]["Dense_0"]["bias"])
    ours, _ = layer.apply(variables, jnp.asarray(x), jnp.asarray(a))

    # TF reference formulation: channels-first (N, C, T, V)
    x_tf = tf.constant(x.transpose(0, 3, 1, 2))
    # Conv2D(1x1) kernel layout (1, 1, C_in, K*C_out); ours is
    # (C_in, K*C_out) with k-major output blocks — identical ordering
    z = tf.nn.conv2d(
        tf.transpose(x_tf, [0, 2, 3, 1]),  # NHWC for tf.nn.conv2d
        kernel[None, None],
        strides=1,
        padding="SAME",
    ) + bias
    z = tf.transpose(z, [0, 3, 1, 2])  # back to (N, K*C, T, V)
    z = tf.reshape(z, [n, k, co, t, v])
    out_tf = tf.einsum("nkctv,kvw->nctw", z, tf.constant(a))
    out_tf = tf.transpose(out_tf, [0, 2, 3, 1])  # to (N, T, V, C)

    np.testing.assert_allclose(
        np.asarray(ours), out_tf.numpy(), atol=2e-5
    )


def test_batchnorm_matches_keras_training_mode():
    """flax BatchNorm with our settings == Keras BatchNormalization
    (momentum 0.99, eps 1e-3) in training mode, stats and outputs."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 10, 12)).astype(np.float32) * 3 + 1

    import flax.linen as nn

    from skeleton_action_recognition_tpu.models.layers import batch_norm

    bn = batch_norm(train=True)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    ours, mutated = bn.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )

    kbn = tf.keras.layers.BatchNormalization(
        axis=-1, momentum=0.99, epsilon=1e-3
    )
    theirs = kbn(tf.constant(x), training=True)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=1e-5
    )
    # running stats after one step
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        kbn.moving_mean.numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        kbn.moving_variance.numpy(),
        rtol=1e-4,
    )


def test_temporal_conv_same_padding_matches_tf():
    """Strided [9,1] SAME conv: flax and TF agree on output and the
    asymmetric padding convention (stgcn.py:29-36)."""
    rng = np.random.default_rng(2)
    n, t, v, c = 2, 300, 25, 4
    x = rng.normal(size=(n, t, v, c)).astype(np.float32)
    kernel = rng.normal(size=(9, 1, c, 6)).astype(np.float32) * 0.1

    import flax.linen as nn

    conv = nn.Conv(6, (9, 1), strides=(2, 1), padding="SAME")
    variables = {
        "params": {"kernel": jnp.asarray(kernel), "bias": jnp.zeros(6)}
    }
    ours = conv.apply(variables, jnp.asarray(x))

    theirs = tf.nn.conv2d(
        tf.constant(x), tf.constant(kernel), strides=[1, 2, 1, 1],
        padding="SAME",
    )
    assert ours.shape == tuple(theirs.shape) == (2, 150, 25, 6)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-5
    )


def test_stconv_block_end_to_end_matches_tf():
    """Full block (spatial conv + BN/ReLU/temporal conv/BN + residual) in
    eval mode vs a TF replica with copied weights (stgcn.py:11-64)."""
    rng = np.random.default_rng(3)
    n, t, v, c = 2, 20, 25, 12
    x = rng.normal(size=(n, t, v, c)).astype(np.float32)
    a = Graph("spatial").A.astype(np.float32)

    block = stgcn.STConvBlock(filters=c, stride=1, residual=True)
    variables = block.init(
        jax.random.key(5), jnp.asarray(x), jnp.asarray(a), False
    )
    ours, _ = block.apply(variables, jnp.asarray(x), jnp.asarray(a), False)

    p = jax.device_get(variables["params"])
    bs = jax.device_get(variables["batch_stats"])

    def bn_eval(z, scope_p, scope_s):
        mean, var = scope_s["mean"], scope_s["var"]
        return (
            scope_p["scale"] * (z - mean) / np.sqrt(var + 1e-3)
            + scope_p["bias"]
        )

    # TF replica, channels-last NHWC throughout for simplicity
    xt = tf.constant(x)
    k = 3
    z = tf.nn.conv2d(
        xt, tf.constant(p["sgcn"]["Dense_0"]["kernel"])[None, None],
        strides=1, padding="SAME",
    ) + p["sgcn"]["Dense_0"]["bias"]
    z = tf.reshape(z, [n, t, v, k, c])
    z = tf.einsum("ntvko,kvw->ntwo", z, tf.constant(a))
    z = bn_eval(
        z.numpy(), p["tgcn"]["BatchNorm_0"], bs["tgcn"]["BatchNorm_0"]
    )
    z = np.maximum(z, 0)
    z = tf.nn.conv2d(
        tf.constant(z.astype(np.float32)),
        tf.constant(p["tgcn"]["Conv_0"]["kernel"]),
        strides=1, padding="SAME",
    ) + p["tgcn"]["Conv_0"]["bias"]
    z = bn_eval(
        z.numpy(), p["tgcn"]["BatchNorm_1"], bs["tgcn"]["BatchNorm_1"]
    )
    expected = np.maximum(z + x, 0)

    np.testing.assert_allclose(np.asarray(ours), expected, atol=3e-5)
