"""Rotation math (Rodrigues axis-angle), numpy and JAX variants.

Semantics match ``data_gen/rotation.py:5-42`` including the degenerate
guards: near-zero axis or angle yields the identity; near-zero vectors give
a zero angle; the axis-angle matrix is built from quaternion components
with the *negated* axis convention the reference uses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_matrix_np(axis, theta) -> np.ndarray:
    if np.abs(axis).sum() < 1e-6 or np.abs(theta) < 1e-6:
        return np.eye(3)
    axis = np.asarray(axis, np.float64)
    axis = axis / np.sqrt(axis @ axis)
    a = np.cos(theta / 2.0)
    b, c, d = -axis * np.sin(theta / 2.0)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
        ]
    )


def angle_between_np(v1, v2) -> float:
    if np.abs(v1).sum() < 1e-6 or np.abs(v2).sum() < 1e-6:
        return 0.0
    u1 = v1 / np.linalg.norm(v1)
    u2 = v2 / np.linalg.norm(v2)
    return float(np.arccos(np.clip(u1 @ u2, -1.0, 1.0)))


def rotation_matrix(axis, theta):
    """JAX traced variant with the same degenerate-input guards."""
    degenerate = (jnp.abs(axis).sum() < 1e-6) | (jnp.abs(theta) < 1e-6)
    safe_axis = jnp.where(degenerate, jnp.array([1.0, 0.0, 0.0]), axis)
    safe_axis = safe_axis / jnp.sqrt(jnp.sum(safe_axis * safe_axis))
    a = jnp.cos(theta / 2.0)
    bcd = -safe_axis * jnp.sin(theta / 2.0)
    b, c, d = bcd[0], bcd[1], bcd[2]
    m = jnp.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
        ]
    )
    return jnp.where(degenerate, jnp.eye(3), m)


def angle_between(v1, v2):
    degenerate = (jnp.abs(v1).sum() < 1e-6) | (jnp.abs(v2).sum() < 1e-6)
    n1 = jnp.linalg.norm(v1)
    n2 = jnp.linalg.norm(v2)
    cos = jnp.dot(v1, v2) / jnp.where(degenerate, 1.0, n1 * n2)
    return jnp.where(
        degenerate, 0.0, jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    )
