"""Pre-normalization of raw NTU joint tensors.

Semantics of ``data_gen/preprocess.py:8-88``, four passes over
``(N, C, T, V, M)``:

1. **Null-frame padding** — per body: if the first frame is empty, compact
   valid frames to the front (dropping interior empties); then cyclically
   tile the valid prefix over the trailing empty block.
2. **Centering** — subtract body 0's per-frame spine joint (joint 1)
   position from every body, masking empty (joint, frame) entries so they
   stay zero.
3. **Z-alignment** — rotate all joints by the matrix that maps body 0 /
   frame 0's hip→spine bone onto the z axis.
4. **X-alignment** — likewise for the shoulder bone onto the x axis.

Two implementations with identical results:

* :func:`pre_normalize_np` — host-side numpy, vectorized per sample (the
  reference runs a quadruple Python loop; this is ~2 orders of magnitude
  faster on the same CPU).
* :func:`pre_normalize` — fully traced JAX version (``vmap`` over samples),
  suitable for on-device preprocessing inside a jitted input transform.

Note the reference applies rotations to *all* frames including empty ones —
rotation of zeros is zeros, so skipping the empty-person/frame guards
changes nothing; both implementations exploit that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.data import rotation


# --------------------------------------------------------------------------
# numpy implementation (host-side oracle + data_gen path)
# --------------------------------------------------------------------------

def _pad_person_np(person: np.ndarray) -> np.ndarray:
    """Pass-1 padding for one ``(T, V, C)`` body."""
    t = person.shape[0]
    frame_valid = person.sum((1, 2)) != 0
    if not frame_valid.any():
        return person
    if not frame_valid[0]:
        valid = person[frame_valid]
        person = np.zeros_like(person)
        person[: len(valid)] = valid
        frame_valid = person.sum((1, 2)) != 0
    last_valid = np.nonzero(frame_valid)[0].max()
    length = last_valid + 1
    if length < t:
        idx = np.arange(t)
        person = person[np.where(idx < length, idx, idx % length)]
    return person


def pre_normalize_np(
    data: np.ndarray, zaxis=(0, 1), xaxis=(8, 4)
) -> np.ndarray:
    """Vectorized numpy pre-normalization of ``(N, C, T, V, M)``."""
    n, c, t, v, m = data.shape
    s = np.transpose(data, (0, 4, 2, 3, 1)).copy()  # N, M, T, V, C

    for i in range(n):
        if s[i].sum() == 0:
            continue
        for p in range(m):
            if s[i, p].sum() == 0:
                continue
            s[i, p] = _pad_person_np(s[i, p])

        center = s[i, 0][:, 1:2, :].copy()  # (T, 1, C) spine of body 0
        for p in range(m):
            if s[i, p].sum() == 0:
                continue
            mask = (s[i, p].sum(-1) != 0)[..., None]
            s[i, p] = (s[i, p] - center) * mask

        bottom = s[i, 0, 0, zaxis[0]]
        top = s[i, 0, 0, zaxis[1]]
        axis = np.cross(top - bottom, [0, 0, 1])
        angle = rotation.angle_between_np(top - bottom, np.array([0.0, 0.0, 1.0]))
        mz = rotation.rotation_matrix_np(axis, angle)

        s[i] = np.einsum("ij,mtvj->mtvi", mz, s[i])

        rs = s[i, 0, 0, xaxis[0]]
        ls = s[i, 0, 0, xaxis[1]]
        axis = np.cross(rs - ls, [1, 0, 0])
        angle = rotation.angle_between_np(rs - ls, np.array([1.0, 0.0, 0.0]))
        mx = rotation.rotation_matrix_np(axis, angle)

        s[i] = np.einsum("ij,mtvj->mtvi", mx, s[i])

    return np.transpose(s, (0, 4, 2, 3, 1)).astype(data.dtype)


# --------------------------------------------------------------------------
# JAX implementation (vmapped, jittable)
# --------------------------------------------------------------------------

def _pad_person_jax(person):
    t = person.shape[0]
    frame_sum = person.sum((1, 2))
    frame_valid = frame_sum != 0
    any_valid = frame_valid.any()

    # compaction when frame 0 is empty: stable sort moves valid frames first
    order = jnp.argsort(~frame_valid, stable=True)
    compacted = person[order] * frame_valid[order][:, None, None]
    person = jnp.where(~frame_valid[0], compacted, person)

    frame_valid2 = person.sum((1, 2)) != 0
    idx = jnp.arange(t)
    last_valid = jnp.max(jnp.where(frame_valid2, idx, -1))
    length = jnp.maximum(last_valid + 1, 1)
    src = jnp.where(idx < length, idx, idx % length)
    tiled = person[src]
    return jnp.where(any_valid, tiled, person)


def _normalize_sample(sample, zaxis, xaxis):
    """One ``(C, T, V, M)`` sample."""
    s = jnp.transpose(sample, (3, 1, 2, 0))  # M, T, V, C
    person_valid = s.sum((1, 2, 3)) != 0

    padded = jax.vmap(_pad_person_jax)(s)
    s = jnp.where(person_valid[:, None, None, None], padded, s)

    center = s[0, :, 1:2, :]
    mask = (s.sum(-1) != 0)[..., None]
    centered = (s - center[None]) * mask
    s = jnp.where(person_valid[:, None, None, None], centered, s)

    bone_z = s[0, 0, zaxis[1]] - s[0, 0, zaxis[0]]
    axis_z = jnp.cross(bone_z, jnp.array([0.0, 0.0, 1.0]))
    mz = rotation.rotation_matrix(
        axis_z, rotation.angle_between(bone_z, jnp.array([0.0, 0.0, 1.0]))
    )
    s = jnp.einsum("ij,mtvj->mtvi", mz, s)

    bone_x = s[0, 0, xaxis[0]] - s[0, 0, xaxis[1]]
    axis_x = jnp.cross(bone_x, jnp.array([1.0, 0.0, 0.0]))
    mx = rotation.rotation_matrix(
        axis_x, rotation.angle_between(bone_x, jnp.array([1.0, 0.0, 0.0]))
    )
    s = jnp.einsum("ij,mtvj->mtvi", mx, s)

    sample_valid = sample.sum() != 0
    out = jnp.transpose(s, (3, 1, 2, 0))
    return jnp.where(sample_valid, out, sample)


def pre_normalize(data, zaxis=(0, 1), xaxis=(8, 4)):
    """JAX pre-normalization of ``(N, C, T, V, M)`` (vmap over samples)."""
    return jax.vmap(lambda x: _normalize_sample(x, zaxis, xaxis))(data)
