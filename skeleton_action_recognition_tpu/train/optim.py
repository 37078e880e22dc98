"""Optimizer partitions for the spectrogram stack.

The reference intends to train the radar wavelength / location with the
same Adam that trains the ResNet (``main_spectrogram.py:106-111`` +
the epoch-gated ``requires_grad`` toggles at ``:128-136``). That can
never work, for two separate reasons:

1. **Scale.** The raw loss gradient w.r.t. ``lambda`` carries a
   ``4*pi*d/lambda^2 ~ 5e7`` factor per timestep-edge term; summed over
   the ~3.6M terms of one clip it routinely exceeds f32 range (and
   Adam's second moment ``g^2`` overflows ~1e19x earlier), so the
   update is inf/nan.
2. **Invariance.** Even when finite, Adam is scale-invariant: any
   nonzero gradient produces a ``+-lr`` step, and the trainer's cyclic
   lr (1e-4..0.1) would throw a 5e-4-meter wavelength across five
   orders of magnitude in one step.

So the physics parameters get their own partition:
:func:`radar_physics_transform` updates them along the (sanitized)
gradient *direction* with a step proportional to the parameter's own
magnitude — ``update = -rel_step * max(max|p|, floor) * g / ||g||`` —
which is finite by construction (inf gradients keep their sign, nan
terms drop out), can never flip the sign of a scalar like ``lambda``
when ``floor=0`` (steps are a fixed fraction of ``|p|``), and moves
``radar_loc`` off its zero initialization via ``floor``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

_F32_BIG = 3e38  # finite stand-in for +-inf gradient entries


def _sanitized_direction(g):
    """Unit-norm gradient direction, robust to inf/nan entries.

    nan terms carry no information and drop to 0; inf terms keep their
    sign (the common overflow case is a single scalar accumulator that
    saturated — the direction survives). Returns zero for an all-zero
    (e.g. frozen/masked) gradient.
    """
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.clip(g, -_F32_BIG, _F32_BIG)
    m = jnp.max(jnp.abs(g))
    scaled = jnp.where(m > 0, g / jnp.where(m > 0, m, 1.0), 0.0)
    norm = jnp.sqrt(jnp.sum(scaled * scaled))
    return jnp.where(
        norm > 0, scaled / jnp.where(norm > 0, norm, 1.0), 0.0
    )


class RadarPhysicsState(NamedTuple):
    """Per-parameter count of steps that actually moved the parameter
    (steps frozen by the staged-unfreeze mask arrive as all-zero
    gradients and don't advance the count)."""

    count: Any


def radar_physics_transform(
    rel_step: float = 1e-2, floor: float = 0.0, step_decay: float = 1.0
) -> optax.GradientTransformation:
    """Relative-step normalized-gradient updates for physics parameters.

    ``update = -rel_step * step_decay^count * max(max|p|, floor)
    * direction(g)``.

    With ``floor=0`` the step is purely relative, so a positive scalar
    (``radar_lambda``) decays/grows geometrically and never crosses
    zero; parameters initialized at zero (``radar_loc``) need a nonzero
    ``floor`` to receive their first step.

    ``step_decay < 1`` anneals the step geometrically per *active* step.
    A constant relative step random-walks the parameter by ``±rel_step``
    forever once near an optimum (the measured failure mode of the
    wavelength experiment: λ oscillated in a ±30% band late in training
    and val accuracy collapsed with it); decay bounds total log-space
    movement at ``rel_step / (1 - step_decay)`` and lets λ settle.
    """

    def init(params):
        return RadarPhysicsState(
            count=jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError(
                "radar_physics_transform requires params "
                "(use optax.apply_updates pipeline that passes them)"
            )

        def u(g, p, n):
            scale = rel_step * jnp.maximum(
                jnp.max(jnp.abs(p)), floor
            )
            if step_decay != 1.0:
                scale = scale * jnp.power(
                    jnp.float32(step_decay), n.astype(jnp.float32)
                )
            return (-scale * _sanitized_direction(g)).astype(p.dtype)

        def bump(g, n):
            # count a step as active only when the *sanitized* direction
            # is nonzero: an all-NaN gradient (NaN != 0 is True) zeroes
            # out in _sanitized_direction, so it must not consume decay
            # budget while moving nothing (ADVICE r4)
            g = jnp.nan_to_num(g, nan=0.0, posinf=1.0, neginf=-1.0)
            return n + jnp.any(g != 0).astype(jnp.int32)

        updates = jax.tree.map(u, grads, params, state.count)
        return updates, RadarPhysicsState(
            count=jax.tree.map(bump, grads, state.count)
        )

    return optax.GradientTransformation(init, update)


class TFSGDState(NamedTuple):
    """Keras-2 SGD slot state: per-parameter velocity + step count."""

    count: Any
    velocity: Any


def tf_sgd(
    learning_rate, momentum: float = 0.9, nesterov: bool = True
) -> optax.GradientTransformation:
    """SGD with exact Keras-2 semantics (``tf.keras.optimizers.SGD``,
    the reference GNN optimizer — ``main_gnn.py:312-314``).

    Keras folds the learning rate into the velocity at accumulation
    time::

        v   <- momentum * v - lr(t) * g
        p   += momentum * v - lr(t) * g        (nesterov)
        p   += v                               (plain momentum)

    whereas ``optax.sgd`` keeps an lr-free trace and scales the whole
    trace by the *current* lr. The two coincide while lr is constant,
    but differ transiently after every schedule boundary: at a 10x
    PiecewiseConstantDecay drop (``main_gnn.py:303-311``) optax
    instantly shrinks the momentum carried from the high-lr phase by
    10x, while Keras lets it decay geometrically (~0.9^n). Matching the
    reference's trajectory bit-for-bit across boundaries requires the
    Keras rule, so this is the GNN trainer's optimizer.

    ``learning_rate`` may be a float or an optax schedule; the schedule
    is evaluated at the pre-increment step count, exactly like Keras
    evaluates ``lr(self.iterations)`` before incrementing.
    """

    def init(params):
        return TFSGDState(
            count=jnp.zeros((), jnp.int32),
            velocity=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )

        def vel(v, g):
            return momentum * v - lr * g

        velocity = jax.tree.map(vel, state.velocity, grads)
        if nesterov:
            updates = jax.tree.map(
                lambda v, g: momentum * v - lr * g, velocity, grads
            )
        else:
            updates = velocity
        return updates, TFSGDState(
            count=state.count + 1, velocity=velocity
        )

    return optax.GradientTransformation(init, update)


def _path_label(path) -> str:
    for p in path:
        key = str(getattr(p, "key", getattr(p, "name", "")))
        if "radar_lambda" in key:
            return "radar_lambda"
        if "radar_loc" in key:
            return "radar_loc"
    return "backbone"


def radar_param_labels(params):
    """Label pytree routing physics params to their own transform."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_label(path), params
    )


def make_radar_optimizer(
    backbone_tx: optax.GradientTransformation,
    lambda_rel_step: float = 1e-2,
    loc_step: float = 1e-2,
    lambda_step_decay: float = 1.0,
) -> optax.GradientTransformation:
    """The spectrogram trainer's optimizer: Adam (or any ``backbone_tx``)
    for the network, relative-step normalized updates for the radar
    physics parameters (see module docstring for why Adam cannot train
    them). ``loc_step`` is in meters: radar_loc starts at the origin, so
    its step is ``loc_step * max(|loc|, 1 m)`` — a fixed ``loc_step``
    meters at first, relative once the radar moves beyond 1 m.
    ``lambda_step_decay`` anneals the wavelength step per active step
    (see :func:`radar_physics_transform`)."""
    return optax.multi_transform(
        {
            "backbone": backbone_tx,
            "radar_lambda": radar_physics_transform(
                rel_step=lambda_rel_step, floor=0.0,
                step_decay=lambda_step_decay,
            ),
            "radar_loc": radar_physics_transform(
                rel_step=loc_step, floor=1.0
            ),
        },
        radar_param_labels,
    )
