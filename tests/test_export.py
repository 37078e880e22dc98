"""Folded inference predictor == stock eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skeleton_action_recognition_tpu.models import export, stgcn
from skeleton_action_recognition_tpu.train import (
    create_train_state,
    make_train_step,
)


def _trained_state(ntu_examples, steps=3):
    """A few real train steps so BN stats and params are non-trivial."""
    x = jnp.asarray(ntu_examples[:, :, :32])
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 60)
    model = stgcn.Model(num_classes=60)
    state = create_train_state(
        model, jax.random.key(0), x,
        optax.sgd(5e-3, momentum=0.9, nesterov=True),
    )
    step = jax.jit(make_train_step(4))
    for _ in range(steps):
        state, _ = step(state, x, y, False)
    return model, state, x


def test_fused_predictor_matches_eval_forward(ntu_examples):
    model, state, x = _trained_state(ntu_examples)
    reference = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x,
        train=False,
    )
    fused = export.fused_stgcn_predictor(
        state.params, state.batch_stats, dtype=jnp.float32, jit=False
    )
    got = fused(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(reference), atol=2e-3
    )
    # predictions identical
    np.testing.assert_array_equal(
        np.asarray(got).argmax(-1), np.asarray(reference).argmax(-1)
    )


def test_fused_predictor_bf16_close(ntu_examples):
    model, state, x = _trained_state(ntu_examples, steps=1)
    reference = np.asarray(
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
    )
    fused = export.fused_stgcn_predictor(
        state.params, state.batch_stats, dtype=jnp.bfloat16, jit=False
    )
    got = np.asarray(fused(x))
    # bf16 matmuls: logits agree to ~1e-1 absolute, argmax preserved
    assert np.abs(got - reference).max() < 0.2
    np.testing.assert_array_equal(
        got.argmax(-1), reference.argmax(-1)
    )


def test_quantized_predictor_preserves_predictions(ntu_examples):
    model, state, x = _trained_state(ntu_examples, steps=2)
    reference = np.asarray(
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
    )
    quant = export.quantized_stgcn_predictor(
        state.params, state.batch_stats, jit=False
    )
    got = np.asarray(quant(x))
    # int8 weight-only: logits close, argmax preserved
    assert np.abs(got - reference).max() < 0.5
    np.testing.assert_array_equal(
        got.argmax(-1), reference.argmax(-1)
    )
    # int8 storage actually used
    pred = export.QuantizedSTGCNPredictor(state.params, state.batch_stats)
    assert pred.weights[0]["wf_q"].dtype == jnp.int8


def test_int8_w8a8_predictor_preserves_predictions(ntu_examples):
    model, state, x = _trained_state(ntu_examples, steps=2)
    reference = np.asarray(
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
    )
    quant = export.int8_stgcn_predictor(
        state.params, state.batch_stats, jit=False
    )
    got = np.asarray(quant(x))
    # W8A8: activation rounding roughly doubles the weight-only noise;
    # logits stay close and argmax is preserved on this workload
    assert np.abs(got - reference).max() < 1.0
    np.testing.assert_array_equal(
        got.argmax(-1), reference.argmax(-1)
    )


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 7, 33)).astype(np.float32) * 8)
    q, scale = export._quantize_rows(x)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    # symmetric 8-bit: error bounded by half an LSB = scale/2 per entry
    assert np.abs(deq - np.asarray(x)).max() <= np.asarray(scale).max() * 0.51
    # all-zero rows must not divide by zero
    z = jnp.zeros((2, 5))
    qz, sz = export._quantize_rows(z)
    assert np.all(np.asarray(qz) == 0) and np.all(np.asarray(sz) == 1.0)
