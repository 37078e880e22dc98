"""Coverage for the less-traveled layers: GraphIsoConv, AdjGraphConv,
demo loaders, L2 regularization."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.data import demo
from skeleton_action_recognition_tpu.graphs import Graph
from skeleton_action_recognition_tpu.models import gcn
from skeleton_action_recognition_tpu.models.layers import l2_regularization
from skeleton_action_recognition_tpu.train.losses import total_loss


def test_graph_iso_conv_static_graph():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 25, 8)).astype(np.float32))
    a = jnp.asarray(Graph("GIN").A[0].astype(np.float32))  # (V, V)
    layer = gcn.GraphIsoConv((16, 16))
    variables = layer.init(jax.random.key(0), x, a)
    out, a_out = layer.apply(
        variables, x, a, False, mutable=["batch_stats"]
    )[0]
    assert out.shape == (2, 25, 16)
    np.testing.assert_array_equal(np.asarray(a_out), np.asarray(a))


def test_adj_graph_conv_trainable_adjacency():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 25, 8)).astype(np.float32))
    a_init = Graph("spatial").A.astype(np.float32)
    layer = gcn.AdjGraphConv(16, a_init)
    variables = layer.init(jax.random.key(0), x)
    assert variables["params"]["adjacency_matrix"].shape == (3, 25, 25)
    out = layer.apply(variables, x)
    assert out.shape == (2, 6, 25, 16)
    # adjacency participates in gradients (it's a param)
    g = jax.grad(
        lambda p: jnp.sum(layer.apply({"params": p}, x) ** 2)
    )(variables["params"])
    assert np.abs(np.asarray(g["adjacency_matrix"])).max() > 0


def test_l2_regularization_counts_only_kernels():
    params = {
        "dense": {"kernel": jnp.ones((2, 3)), "bias": jnp.ones(3)},
        "bn": {"scale": jnp.ones(3), "mean": jnp.ones(3)},
    }
    assert float(l2_regularization(params, 1.0)) == 6.0


def test_total_loss_l2_toggle():
    logits = jnp.zeros((2, 4))
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 4)
    params = {"d": {"kernel": jnp.ones((2, 2))}}
    base = float(total_loss(logits, y, params, 2, l2_weight=0.0))
    with_l2 = float(total_loss(logits, y, params, 2, l2_weight=0.5))
    assert with_l2 == base + 2.0  # 0.5 * sum(1^2 * 4)


def test_azure_kinect_loader(tmp_path):
    doc = {
        "frames": [
            {"num_bodies": 1,
             "bodies": [{"joint_positions": [[1000.0, 0.0, 500.0]] * 32}]},
            {"num_bodies": 0, "bodies": []},
            {"num_bodies": 1,
             "bodies": [{"joint_positions": [[2000.0, 100.0, 0.0]] * 32}]},
        ]
    }
    path = tmp_path / "capture.json"
    path.write_text(json.dumps(doc))
    data, edges = demo.load_azure_kinect(str(path))
    # empty frames dropped, mm -> m
    assert data.shape == (2, 32, 3)
    np.testing.assert_allclose(data[0, 0], [1.0, 0.0, 0.5])
    assert len(edges) == 26
