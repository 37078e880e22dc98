"""Serving predictor: checkpoint -> compiled inference, partial batches."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu import parallel, serving
from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.train import (
    checkpoint as ckpt_lib,
    create_train_state,
)


@pytest.fixture()
def trained_checkpoint(tmp_path, ntu_examples):
    x = jnp.asarray(ntu_examples[:2, :, :16])
    model = stgcn.Model(num_classes=6)
    state = create_train_state(
        model, jax.random.key(0), x,
        optax.sgd(0.1, momentum=0.9, nesterov=True),
    )
    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, jax.device_get(state), {"epoch": 0})
    mgr.close()
    return model, str(tmp_path / "ck"), np.asarray(x)


def test_predictor_from_checkpoint(trained_checkpoint):
    model, ckpt, x = trained_checkpoint
    pred = serving.Predictor.from_checkpoint(
        model, ckpt, x[:1], max_batch=4
    )
    probs = pred(x)  # partial batch (2 of 4)
    assert probs.shape == (2, 6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # full batch
    probs4 = pred(np.tile(x, (2, 1, 1, 1, 1)))
    assert probs4.shape == (4, 6)
    # padding must not change the first rows' predictions
    np.testing.assert_allclose(probs4[:2], probs, atol=1e-5)
    with pytest.raises(ValueError):
        pred(np.tile(x, (3, 1, 1, 1, 1)))


def test_predictor_sharded_over_mesh(trained_checkpoint):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model, ckpt, x = trained_checkpoint
    mesh = parallel.create_mesh()
    pred = serving.Predictor.from_checkpoint(
        model, ckpt, x[:1], max_batch=8, mesh=mesh
    )
    probs = pred(np.tile(x, (4, 1, 1, 1, 1)))
    assert probs.shape == (8, 6)
    # matches the unsharded predictor
    pred1 = serving.Predictor.from_checkpoint(
        model, ckpt, x[:1], max_batch=8
    )
    np.testing.assert_allclose(
        probs, pred1(np.tile(x, (4, 1, 1, 1, 1))), atol=1e-4
    )
