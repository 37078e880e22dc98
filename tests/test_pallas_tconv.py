"""Fused Pallas temporal-conv: parity with the stock flax chain.

VERDICT r1 item 3's contract: the fused training-mode block must match
the unfused block's output AND batch statistics. The kernel itself is
additionally pinned against a pure-XLA oracle (forward and every
gradient) at f32 where the comparison is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.ops.pallas.tconv import (
    affine_relu_tconv,
)


def _oracle(s, scale, shift, k, b):
    h = jnp.maximum(s * scale + shift, 0.0)
    u = jax.lax.conv_general_dilated(
        h, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return u, jnp.sum(u, axis=(0, 1, 2)), jnp.sum(u * u, axis=(0, 1, 2))


@pytest.fixture()
def op_inputs():
    rng = np.random.default_rng(3)
    nm, t, v, c = 2, 12, 25, 16
    s = jnp.asarray(rng.normal(size=(nm, t, v, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    shift = jnp.asarray(
        rng.normal(size=(c,)).astype(np.float32) * 0.3
    )
    k = jnp.asarray(
        rng.normal(size=(9, 1, c, c)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    return s, scale, shift, k, b, v


def test_kernel_forward_matches_oracle(op_inputs):
    s, scale, shift, k, b, v = op_inputs
    u0, s20, ss20 = _oracle(s, scale, shift, k, b)
    u1, s21, ss21 = affine_relu_tconv(s, scale, shift, k, b, v, 9)
    np.testing.assert_allclose(u0, u1, atol=1e-5)
    np.testing.assert_allclose(s20, s21, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(ss20, ss21, rtol=1e-5, atol=1e-3)


def test_kernel_gradients_match_oracle(op_inputs):
    s, scale, shift, k, b, v = op_inputs

    def loss(fn, args):
        u, s2, ss2 = fn(*args)
        return (
            jnp.sum(jnp.sin(u))
            + jnp.sum(s2 * 0.1)
            + jnp.sum(ss2 * 0.01)
        )

    g0 = jax.grad(lambda a: loss(_oracle, a))((s, scale, shift, k, b))
    g1 = jax.grad(
        lambda a: loss(lambda *a_: affine_relu_tconv(*a_, v, 9), a)
    )((s, scale, shift, k, b))
    for name, a, c_ in zip(
        ["g_s", "g_scale", "g_shift", "g_kernel", "g_bias"], g0, g1
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c_),
            rtol=2e-4, atol=1e-4, err_msg=name,
        )


def test_fused_module_matches_stock_output_and_stats():
    """FusedTemporalConv == TemporalConv in training mode: same output,
    same updated running statistics (both BatchNorms), same variable
    tree (checkpoint-interchangeable)."""
    rng = np.random.default_rng(5)
    nm, t, v, c = 3, 16, 25, 8
    x = jnp.asarray(rng.normal(size=(nm, t, v, c)).astype(np.float32))

    stock = stgcn.TemporalConv(c)
    fused = stgcn.FusedTemporalConv(c)
    vs = stock.init(jax.random.key(0), x, False)
    vf = fused.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(vs) == (
        jax.tree_util.tree_structure(vf)
    )

    # identical (randomized) variables on both paths
    leaves = jax.tree_util.tree_leaves(vs)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    rand = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(vs),
        [
            0.5 + 0.1 * jax.random.normal(kk, l.shape, l.dtype)
            for kk, l in zip(keys, leaves)
        ],
    )

    out_s, upd_s = stock.apply(rand, x, True, mutable=["batch_stats"])
    out_f, upd_f = fused.apply(rand, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_f), rtol=2e-4, atol=2e-4
    )
    flat_s = jax.tree_util.tree_leaves_with_path(upd_s)
    flat_f = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(upd_f)
    )
    for p, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_f[jax.tree_util.keystr(p)]),
            rtol=2e-4, atol=2e-4, err_msg=jax.tree_util.keystr(p),
        )

    # eval mode agrees too (same folded running-stat math)
    es = stock.apply(rand, x, False)
    ef = fused.apply(rand, x, False)
    np.testing.assert_allclose(
        np.asarray(es), np.asarray(ef), rtol=2e-4, atol=2e-4
    )


def test_fused_model_trains_and_matches_stock_grads():
    """Full ST-GCN with fused_tconv: forward and parameter gradients
    match the stock model (shared params) in training mode."""
    import optax

    from skeleton_action_recognition_tpu.train import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.normal(size=(2, 3, 16, 25, 2)).astype(np.float32)
    )
    y = jax.nn.one_hot(jnp.asarray([1, 3]), 6)

    stock = stgcn.Model(num_classes=6, remat=False)
    fused = stgcn.Model(num_classes=6, remat=False, fused_tconv=True)
    tx = optax.sgd(0.1)
    state_s = create_train_state(stock, jax.random.key(0), x[:1], tx)
    state_f = create_train_state(fused, jax.random.key(0), x[:1], tx)
    # identical init trees (param shapes/names match)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape,
            state_s.params, state_f.params,
        )
    )
    state_f = state_f.replace(
        params=state_s.params, batch_stats=state_s.batch_stats
    )

    step = make_train_step(global_batch_size=2)
    new_s, m_s = jax.jit(step, static_argnums=3)(state_s, x, y, False)
    new_f, m_f = jax.jit(step, static_argnums=3)(state_f, x, y, False)
    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_f["loss"]), rtol=1e-4
    )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_s.params),
        jax.tree_util.tree_leaves_with_path(new_f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(p),
        )
