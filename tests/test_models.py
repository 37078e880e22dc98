"""Model-zoo forward/backward tests (shapes, determinism, loss descent)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu.models import (
    resnet18,
    spectrogram,
    stgcn,
    stgin,
    stpgcn,
    stpgcnp,
)
from skeleton_action_recognition_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _small_batch(ntu_examples, t=48):
    return jnp.asarray(ntu_examples[:, :, :t])  # (4, 3, t, 25, 2)


MODEL_CLASSES = {
    "stgcn": stgcn.Model,
    "stgin": stgin.Model,
    "stpgcn": stpgcn.Model,
    "stpgcnp": stpgcnp.Model,
}


@pytest.mark.parametrize("name", sorted(MODEL_CLASSES))
def test_gnn_model_forward_shapes(name, ntu_examples):
    x = _small_batch(ntu_examples)
    model = MODEL_CLASSES[name](num_classes=60)
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (4, 60)
    assert np.isfinite(np.asarray(logits)).all()


def test_stgcn_has_batchstats_and_deterministic_eval(ntu_examples):
    x = _small_batch(ntu_examples)
    model = stgcn.Model(num_classes=60)
    variables = model.init(jax.random.key(1), x, train=False)
    assert "batch_stats" in variables
    l1 = model.apply(variables, x, train=False)
    l2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_stgcn_train_step_decreases_loss(ntu_examples):
    """Minimum end-to-end slice (SURVEY §7): jitted train step on the
    bundled examples must reduce the loss."""
    x = _small_batch(ntu_examples, t=32)
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 60)

    model = stgcn.Model(num_classes=60)
    tx = optax.sgd(1e-2, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(2), x, tx)
    step = jax.jit(make_train_step(global_batch_size=4))

    losses = []
    for _ in range(8):
        state, metrics = step(state, x, y, False)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_eval_step_probabilities(ntu_examples):
    x = _small_batch(ntu_examples, t=32)
    model = stgcn.Model(num_classes=60)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), x, tx)
    probs = jax.jit(make_eval_step())(state, x)
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1), 1.0, atol=1e-5
    )


def test_trainable_adjacency_freeze_mask(ntu_examples):
    """adjacency_matrix params update only when train_adj=True
    (main_gnn.py:228-232 semantics)."""
    x = _small_batch(ntu_examples, t=32)
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 60)
    model = stgcn.Model(num_classes=60, trainable_adjacency=True)
    tx = optax.sgd(1e-2, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(4), x, tx)
    step = jax.jit(make_train_step(global_batch_size=4))

    a0 = np.asarray(state.params["adjacency_matrix"])
    state_frozen, _ = step(state, x, y, False)
    np.testing.assert_array_equal(
        np.asarray(state_frozen.params["adjacency_matrix"]), a0
    )
    state_free, _ = step(state, x, y, True)
    assert np.abs(
        np.asarray(state_free.params["adjacency_matrix"]) - a0
    ).max() > 0


def test_resnet18_forward():
    x = jnp.zeros((2, 64, 64, 1))
    model = resnet18.resnet18(num_classes=60, num_filters=8)
    variables = model.init(jax.random.key(5), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 60)


def test_spectrogram_model_forward(ntu_examples):
    x = jnp.asarray(ntu_examples[:1, :, :64])  # (1, 3, 64, 25, 2)
    model = spectrogram.Model(num_classes=60, num_filters=8, image_size=64)
    variables = model.init(jax.random.key(6), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 60)
    assert np.isfinite(np.asarray(out)).all()
    # radar params exposed under the documented names
    vr = variables["params"]["virtual_radar"]
    assert "radar_lambda" in vr and "radar_loc" in vr
