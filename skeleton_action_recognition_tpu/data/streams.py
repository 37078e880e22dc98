"""Bone and motion stream derivation.

* Bone stream (``data_gen/gen_bone_data.py:22-41``):
  ``bone[:, :, :, v1-1] = joint[..., v1-1] - joint[..., v2-1]`` over the 25
  directed 1-indexed pairs (including the ``(21, 21)`` self-pair, which
  yields an identically-zero bone at the spine).
* Motion stream (``data_gen/gen_motion_data.py:24-27``):
  ``motion[t] = x[t+1] - x[t]`` with the final frame zeroed.

Both are one-line gathers/diffs; they work on numpy or JAX arrays and any
leading batch layout ``(..., C, T, V, M)``.
"""

from __future__ import annotations

import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import BONE_PAIRS

_V1 = np.asarray([p[0] - 1 for p in BONE_PAIRS])
_V2 = np.asarray([p[1] - 1 for p in BONE_PAIRS])


def bone_stream(joint):
    """``(..., C, T, V, M)`` joints -> same-shape bone vectors."""
    if joint.shape[-2] != len(BONE_PAIRS):
        raise ValueError(
            f"expected V={len(BONE_PAIRS)} joints, got {joint.shape[-2]}"
        )
    out = joint[..., _V1, :] - joint[..., _V2, :]
    # scatter back into v1 order == gather order (v1 covers 0..24 uniquely)
    order = np.empty(len(BONE_PAIRS), np.intp)
    order[_V1] = np.arange(len(BONE_PAIRS))
    return out[..., order, :]


def motion_stream(x):
    """``(..., C, T, V, M)`` -> frame-difference stream, last frame zero."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(x, np.ndarray) else np
    diff = x[..., 1:, :, :] - x[..., :-1, :, :]
    zero = xp.zeros_like(x[..., :1, :, :])
    return xp.concatenate([diff, zero], axis=-3)
