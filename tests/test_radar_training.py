"""Spectrogram-stack training semantics: staged unfreeze, loss descent."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu.models import spectrogram
from skeleton_action_recognition_tpu.train import (
    create_train_state,
    steps as steps_lib,
)


@pytest.fixture(scope="module")
def radar_state(ntu_examples):
    x = jnp.asarray(ntu_examples[:2, :, :30])
    model = spectrogram.Model(
        num_classes=4, num_filters=8, image_size=64, num_pad_frames=4
    )
    state = create_train_state(
        model, jax.random.key(0), x, optax.adam(1e-3)
    )
    return model, state, x


def test_staged_unfreeze_of_radar_params(radar_state):
    """radar_lambda / radar_loc update only when their flags are on
    (the reference's intended-but-broken main_spectrogram.py:128-136)."""
    _, state, x = radar_state
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 4)

    def step_for(tl, tloc):
        return jax.jit(
            steps_lib.make_radar_train_step(
                2, train_lambda=tl, train_loc=tloc
            )
        )

    lam0 = float(state.params["virtual_radar"]["radar_lambda"])
    loc0 = np.asarray(state.params["virtual_radar"]["radar_loc"])

    s_frozen, _ = step_for(False, False)(state, x, y)
    assert float(
        s_frozen.params["virtual_radar"]["radar_lambda"]
    ) == lam0
    np.testing.assert_array_equal(
        np.asarray(s_frozen.params["virtual_radar"]["radar_loc"]), loc0
    )

    s_lam, _ = step_for(True, False)(state, x, y)
    assert float(s_lam.params["virtual_radar"]["radar_lambda"]) != lam0
    np.testing.assert_array_equal(
        np.asarray(s_lam.params["virtual_radar"]["radar_loc"]), loc0
    )

    s_loc, _ = step_for(False, True)(state, x, y)
    assert (
        np.abs(
            np.asarray(s_loc.params["virtual_radar"]["radar_loc"]) - loc0
        ).max()
        > 0
    )


@pytest.mark.slow
def test_radar_training_decreases_loss(radar_state):
    _, state, x = radar_state
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 4)
    step = jax.jit(steps_lib.make_radar_train_step(2))
    losses = []
    for _ in range(6):
        state, m = step(state, x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_radar_params_train_at_real_wavelength(ntu_examples):
    """Unfreeze lambda/loc at step 0 and run 10 steps at the real
    wavelength (5e-4 m): params and optimizer state stay finite and
    lambda actually moves (VERDICT r1 item 4 — the raw gradients
    overflow f32 here; the physics-param optimizer partition must
    absorb that)."""
    from skeleton_action_recognition_tpu.train import optim as optim_lib

    x = jnp.asarray(ntu_examples[:2, :, :30])
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 4)
    model = spectrogram.Model(
        num_classes=4, num_filters=8, image_size=64, num_pad_frames=4
    )
    tx = optim_lib.make_radar_optimizer(optax.adam(1e-3))
    state = create_train_state(model, jax.random.key(0), x, tx)
    lam0 = float(state.params["virtual_radar"]["radar_lambda"])
    assert lam0 == pytest.approx(5e-4)

    step = jax.jit(
        steps_lib.make_radar_train_step(
            2, train_lambda=True, train_loc=True
        )
    )
    for _ in range(10):
        state, m = step(state, x, y)

    lam = float(state.params["virtual_radar"]["radar_lambda"])
    loc = np.asarray(state.params["virtual_radar"]["radar_loc"])
    assert np.isfinite(lam) and np.isfinite(loc).all()
    assert lam != lam0 and lam > 0
    # relative stepping: lambda stayed within (1 +- rel_step)^10
    assert lam0 * 0.9 < lam < lam0 * 1.11
    for leaf in jax.tree_util.tree_leaves(
        (state.params, state.opt_state)
    ):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(float(m["loss"]))


def test_lambda_step_decay_anneals_only_active_steps():
    """step_decay halves the relative step per *active* step; masked
    (all-zero-gradient) steps don't advance the decay counter."""
    from skeleton_action_recognition_tpu.train import optim as optim_lib

    tx = optim_lib.radar_physics_transform(
        rel_step=0.1, floor=0.0, step_decay=0.5
    )
    p = {"lam": jnp.asarray(1.0)}
    st = tx.init(p)

    def rel_move(g, p, st):
        up, st = tx.update({"lam": jnp.asarray(g)}, st, p)
        newp = {"lam": p["lam"] + up["lam"]}
        return float(up["lam"] / p["lam"]), newp, st

    r1, p, st = rel_move(3.0, p, st)          # active: full step
    assert r1 == pytest.approx(-0.1)
    r0, p, st = rel_move(0.0, p, st)          # frozen: no move, no decay
    assert r0 == 0.0
    r2, p, st = rel_move(-7.0, p, st)         # active: halved step
    assert r2 == pytest.approx(+0.05)
    r3, p, st = rel_move(1.0, p, st)          # active: quartered step
    assert r3 == pytest.approx(-0.025)
    # default (no decay) keeps the legacy constant-step behavior
    tx0 = optim_lib.radar_physics_transform(rel_step=0.1)
    p0 = {"lam": jnp.asarray(1.0)}
    s0 = tx0.init(p0)
    for _ in range(3):
        up, s0 = tx0.update({"lam": jnp.asarray(2.0)}, s0, p0)
        assert float(up["lam"] / p0["lam"]) == pytest.approx(-0.1)


def test_all_nan_gradient_consumes_no_decay_budget():
    """An all-NaN gradient produces a zero update (sanitized direction),
    so it must not advance the step_decay counter either (ADVICE r4:
    NaN != 0 is True, which previously counted it as active); an
    all-inf gradient keeps its sign and IS active."""
    from skeleton_action_recognition_tpu.train import optim as optim_lib

    tx = optim_lib.radar_physics_transform(
        rel_step=0.1, floor=0.0, step_decay=0.5
    )
    p = {"lam": jnp.asarray(1.0)}
    st = tx.init(p)
    up, st = tx.update({"lam": jnp.asarray(jnp.nan)}, st, p)
    assert float(up["lam"]) == 0.0
    assert int(st.count["lam"]) == 0
    # next real step still gets the full (undecayed) relative step
    up, st = tx.update({"lam": jnp.asarray(2.0)}, st, p)
    assert float(up["lam"] / p["lam"]) == pytest.approx(-0.1)
    assert int(st.count["lam"]) == 1
    # inf keeps its sign: active, moves, and consumes budget
    up, st = tx.update({"lam": jnp.asarray(-jnp.inf)}, st, p)
    assert float(up["lam"] / p["lam"]) == pytest.approx(+0.05)
    assert int(st.count["lam"]) == 2


def test_freeze_mask_kills_nonfinite_gradients():
    """Frozen params must stay clean even when their raw gradients
    overflow (the radar 4*pi/lambda^2 sums overflow f32 at real scale;
    `0 * inf = nan` poisoned the optimizer before this was a `where`)."""
    grads = {
        "virtual_radar": {"radar_lambda": jnp.asarray(jnp.inf)},
        "dense": {"kernel": jnp.ones((2, 2))},
    }
    masked = steps_lib.mask_gradients_by_name(
        grads, "radar_lambda", False
    )
    assert float(masked["virtual_radar"]["radar_lambda"]) == 0.0
    nan_grads = {
        "virtual_radar": {"radar_lambda": jnp.asarray(jnp.nan)},
        "dense": {"kernel": jnp.ones((2, 2))},
    }
    masked = steps_lib.mask_gradients_by_name(
        nan_grads, "radar_lambda", False
    )
    assert float(masked["virtual_radar"]["radar_lambda"]) == 0.0
    # enabled=True passes values through untouched
    passed = steps_lib.mask_gradients_by_name(grads, "radar_lambda", True)
    assert np.isinf(float(passed["virtual_radar"]["radar_lambda"]))
