"""Experimental zoo + LSTM sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu.graphs import Graph
from skeleton_action_recognition_tpu.models import experimental, lstm_sampler


def test_gpool_shapes_and_selection():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 25, 8)).astype(np.float32))
    a = jnp.asarray(Graph("spatial").A.astype(np.float32))
    pool = experimental.GPool(keeprate=0.5)
    variables = pool.init(jax.random.key(0), x, a)
    out, a_out = pool.apply(variables, x, a)
    assert out.shape == (2, 6, 12, 8)
    assert a_out.shape == (2, 3, 12, 12)


def test_sgcn_batched_adjacency():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 25, 8)).astype(np.float32))
    a = jnp.asarray(
        rng.normal(size=(2, 3, 25, 25)).astype(np.float32)
    )
    layer = experimental.SGCN(16)
    variables = layer.init(jax.random.key(0), x, a)
    out, _ = layer.apply(variables, x, a)
    assert out.shape == (2, 4, 25, 16)


def test_sgtacn_per_timestep_adjacency():
    rng = np.random.default_rng(2)
    a_init = Graph("spatial").A.astype(np.float32)
    x = jnp.asarray(rng.normal(size=(2, 10, 25, 8)).astype(np.float32))
    layer = experimental.SGTACN(16, a_init, temporal_dim=10)
    variables = layer.init(jax.random.key(0), x)
    assert variables["params"]["adjacency_matrix"].shape == (
        3, 10, 25, 25,
    )
    out = layer.apply(variables, x)
    assert out.shape == (2, 10, 25, 16)


@pytest.mark.slow
def test_debug_model_forward(ntu_examples):
    x = jnp.asarray(ntu_examples[:1])  # needs T=300
    model = experimental.Model(num_classes=60)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 60)
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_attention_gate():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 25, 4)).astype(np.float32))
    layer = experimental.TemporalAttention((8,))
    variables = layer.init(jax.random.key(0), x)
    out = layer.apply(variables, x)
    assert out.shape == x.shape
    # gated output is elementwise-scaled input with per-frame gates in (0,1)
    ratio = np.asarray(out / x)
    per_frame = ratio.reshape(2, 5, -1)
    assert np.allclose(per_frame, per_frame[:, :, :1], atol=1e-5)
    assert (per_frame > 0).all() and (per_frame < 1).all()


def test_lstm_sampler_topk():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 20, 25, 3)).astype(np.float32))
    sampler = lstm_sampler.TemporalSampler((16,), top_k=5)
    variables = sampler.init(jax.random.key(0), x)
    out = sampler.apply(variables, x)
    assert out.shape == (2, 5, 25, 3)
    assert np.isfinite(np.asarray(out)).all()
