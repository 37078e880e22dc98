"""Rematerialization must not change the math.

``Model(remat=..., remat_policy=...)`` only changes WHAT the backward
pass stores vs recomputes (HBM-vs-FLOPs trade for the TPU, cf. the
reference's always-store torch/TF semantics); the gradients themselves
must be identical. Pins the ``dots`` policy path (save matmul/conv
outputs, recompute the elementwise chains), which `bench.py` A/Bs via
``BENCH_REMAT``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.train import (
    create_train_state,
    make_train_step,
)


def _grads(model, variables, x, y):
    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return optax.softmax_cross_entropy(logits, y).mean()

    return jax.jit(jax.grad(loss_fn))(variables["params"])


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_remat_policy_grads_match_no_remat(ntu_examples, policy):
    x = jnp.asarray(ntu_examples[:, :, :32])
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 6)

    base = stgcn.Model(num_classes=6, remat=False)
    variables = base.init(jax.random.key(0), x, train=False)

    g0 = _grads(base, variables, x, y)
    g1 = _grads(
        stgcn.Model(num_classes=6, remat=True, remat_policy=policy),
        variables,
        x,
        y,
    )

    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    assert len(flat0) == len(flat1)
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat1[path]),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"{policy}: {jax.tree_util.keystr(path)}",
        )


def test_remat_dots_trains(ntu_examples):
    """The dots-policy model must also run the full optimizer step
    (exercises flax's remat wrapper with mutable batch_stats)."""
    x = jnp.asarray(ntu_examples[:, :, :32])
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 6)
    model = stgcn.Model(num_classes=6, remat=True, remat_policy="dots")
    tx = optax.sgd(1e-2, momentum=0.9, nesterov=True)
    state = create_train_state(model, jax.random.key(2), x, tx)
    step = jax.jit(make_train_step(global_batch_size=4))
    losses = []
    for _ in range(4):
        state, metrics = step(state, x, y, False)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
