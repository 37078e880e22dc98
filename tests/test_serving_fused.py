"""Fused serving path: stock and folded predictors agree."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu import parallel, serving
from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.train import create_train_state


def test_fused_serving_matches_stock(ntu_examples):
    x = np.asarray(ntu_examples[:2, :, :16])
    model = stgcn.Model(num_classes=6)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(x), optax.sgd(0.1)
    )
    params = jax.device_get(state.params)
    bs = jax.device_get(state.batch_stats)

    stock = serving.Predictor(model, params, bs, max_batch=2)
    fused = serving.Predictor(model, params, bs, max_batch=2, fused=True)
    ps, pf = stock(x), fused(x)
    np.testing.assert_array_equal(ps.argmax(-1), pf.argmax(-1))
    np.testing.assert_allclose(ps, pf, atol=5e-2)


def test_fused_serving_sharded_over_mesh(ntu_examples):
    """Folded predictor batch-sharded over the 8-device mesh agrees with
    single-device (pure data parallelism; only matmul tiling may differ)."""
    x = np.asarray(ntu_examples[:3, :, :16])
    model = stgcn.Model(num_classes=6)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:1]), optax.sgd(0.1)
    )
    params = jax.device_get(state.params)
    bs = jax.device_get(state.batch_stats)

    single = serving.Predictor(model, params, bs, max_batch=8, fused=True)
    mesh = parallel.create_mesh()
    assert mesh.devices.size == 8
    sharded = serving.Predictor(
        model, params, bs, max_batch=8, mesh=mesh, fused=True
    )
    ps, pm = single(x), sharded(x)
    np.testing.assert_array_equal(ps.argmax(-1), pm.argmax(-1))
    np.testing.assert_allclose(ps, pm, atol=2e-3)

    with pytest.raises(ValueError):
        serving.Predictor(
            model, params, bs, max_batch=6, mesh=mesh, fused=True
        )


def test_quantized_serving_paths(ntu_examples):
    x = np.asarray(ntu_examples[:2, :, :16])
    model = stgcn.Model(num_classes=6)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(x), optax.sgd(0.1)
    )
    params = jax.device_get(state.params)
    bs = jax.device_get(state.batch_stats)

    stock = serving.Predictor(model, params, bs, max_batch=2)
    ps = stock(x)
    for q in ("w8", "w8a8"):
        quant = serving.Predictor(
            model, params, bs, max_batch=2, fused=True, quantize=q
        )
        pq = quant(x)
        np.testing.assert_array_equal(ps.argmax(-1), pq.argmax(-1))
        np.testing.assert_allclose(ps, pq, atol=0.1)

    with pytest.raises(ValueError):
        serving.Predictor(model, params, bs, quantize="w8a8")
    with pytest.raises(ValueError):
        serving.Predictor(
            model, params, bs, fused=True, quantize="int4"
        )
