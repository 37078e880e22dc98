"""Soft-projection graph layers (projection conv / pool).

Re-designs of ``ProjectionGraphConv`` (``models/stpgcn.py:11-47``) and
``ProjectionGraphPool`` (``models/stpgcnp.py:11-38``): features are
soft-assigned onto ``J`` learnable Gaussian centers, a projected adjacency
``z^T z`` is built from the normalized centroids, and (for the conv
variant) a graph conv runs in projected space before un-projecting
residually.

TPU-first formulation: the reference materializes the whitened residual
tensor ``z = (x - mu) / sigma(var)`` of shape ``(N, C, T*V, J)`` — ~61 MB
per sample at block 1 — purely to take its squared norm and a weighted
mean. Both are expanded here into quadratic/linear forms computed with
``(P, C) @ (C, J)`` matmuls, so nothing bigger than ``(N, P, J)`` is ever
materialized and the MXU does all the work. Numerics agree up to
float-summation order.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.models.gcn import GraphConv


def _tf_glorot_uniform_4d(c: int, j: int):
    """Uniform init matching TF's default glorot on the reference's
    ``[1, C, 1, J]`` weight shape (fan_in = C, fan_out = C * J)."""
    limit = float(np.sqrt(6.0 / (c + c * j)))

    def init(rng, shape=None, dtype=jnp.float32):
        import jax.random as jr

        return jr.uniform(rng, (c, j), dtype, -limit, limit)

    return init


class SoftProjection(nn.Module):
    """Soft-assignment of ``(N, P, C)`` points onto ``J`` Gaussian centers.

    Returns ``(q, z, a_proj)``:

    * ``q``: ``(N, P, J)`` softmax assignment weights,
    * ``z``: ``(N, J, C)`` per-center aggregated whitened residuals,
      L2-normalized across the center axis per channel (the reference's
      ``l2_normalize(axis=-1)`` on ``(N, C, J)``),
    * ``a_proj``: ``(N, J, J)`` projected adjacency ``z z^T`` over channels.
    """

    vertices: int

    @nn.compact
    def __call__(self, x):
        n, p, c = x.shape
        j = self.vertices
        centers = self.param("centers", _tf_glorot_uniform_4d(c, j))
        variance = self.param("variance", _tf_glorot_uniform_4d(c, j))

        s = nn.sigmoid(variance)  # (C, J)
        inv_s2 = 1.0 / (s * s)
        mu_over_s2 = centers * inv_s2

        # ||(x - mu) / s||^2 expanded into three matmul terms.
        d2 = (
            jnp.einsum("npc,cj->npj", x * x, inv_s2)
            - 2.0 * jnp.einsum("npc,cj->npj", x, mu_over_s2)
            + jnp.sum(centers * centers * inv_s2, axis=0)
        )
        q = nn.softmax(jnp.maximum(d2, 1e-12) * (-0.5), axis=-1)

        q_sum = jnp.sum(q, axis=1)  # (N, J)
        qx = jnp.einsum("npj,npc->njc", q, x)  # (N, J, C)
        num = (qx - q_sum[..., None] * centers.T[None]) / s.T[None]
        # Deviation from the reference (`z /= reduce_sum(q)`,
        # stpgcnp.py:34): centers that receive no assignment mass have
        # q_sum underflow to exactly 0 in f32, which NaNs the whole layer
        # there; the epsilon turns those centers into zeros instead.
        z = num / (q_sum[..., None] + 1e-12)
        # L2-normalize across the center axis (per sample, per channel).
        norm = jnp.sqrt(
            jnp.maximum(jnp.sum(z * z, axis=1, keepdims=True), 1e-12)
        )
        z = z / norm
        a_proj = jnp.einsum("nic,njc->nij", z, z)
        return q, z, a_proj


class ProjectionGraphConv(nn.Module):
    """Residual graph conv in soft-projected space
    (``models/stpgcn.py:11-47``). Input/output ``(N, T, V, C)``."""

    filters: int
    vertices: int

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        n, t, v, c = x.shape
        points = x.reshape(n, t * v, c)
        q, z, a_proj = SoftProjection(self.vertices)(points)
        z, _ = GraphConv(self.filters, name="graph_conv")(z, a_proj, train)
        x_proj = jnp.einsum("npj,njc->npc", q, z)
        x = x + x_proj.reshape(n, t, v, self.filters)
        return x, a


class ProjectionGraphPool(nn.Module):
    """Replace the vertex set with soft-assignment centroids
    (``models/stpgcnp.py:11-38``).

    Accepts ``(N, T, V, C)`` or already-pooled ``(N, V, C)``; returns
    ``((N, J, C), (N, J, J))`` — the new graph and its adjacency.
    """

    vertices: int

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        if x.ndim == 4:
            n, t, v, c = x.shape
            points = x.reshape(n, t * v, c)
        else:
            points = x
        _, z, a_proj = SoftProjection(self.vertices)(points)
        return z, a_proj
