"""Graph-convolution contractions as MXU-friendly einsums.

These are the TPU-native formulations of the reference's conv-then-einsum
primitives (``models/gcn.py:22-238``). The channel contraction is one large
``dot_general`` (rides the MXU); the adjacency contraction is a small
``(V, V)`` matmul batched over ``N*T`` rows that XLA fuses around it.
"""

from __future__ import annotations

import jax.numpy as jnp


def spatial_graph_conv(x, w, a, b=None):
    """ST-GCN spatial conv: per-partition 1x1 conv then adjacency contraction.

    TPU-native equivalent of ``GraphConvTD`` (``models/gcn.py:187-209``):
    the reference runs ``Conv2D(K*C)`` over ``(N, C, T, V)`` then
    ``einsum('nkctv,kvw->nctw')``. Here the channel matmul and the adjacency
    contraction are expressed directly over channels-last activations.

    Args:
      x: ``(..., V, C_in)`` activations (typically ``(N, T, V, C_in)``).
      w: ``(C_in, K, C_out)`` weights — one 1x1 conv per spatial partition.
      a: ``(K, V, V)`` adjacency stack; ``a[k, v, w]`` routes node ``v``
        into node ``w`` (column-source convention of ``graph/tools.py:4-8``).
      b: optional ``(K, C_out)`` or ``(C_out,)`` bias added after the channel
        matmul (the reference's Conv2D bias, added before the adjacency
        contraction).

    Returns:
      ``(..., V, C_out)``.
    """
    z = jnp.einsum("...vi,iko->...vko", x, w)
    if b is not None:
        z = z + b
    return jnp.einsum("...vko,kvw->...wo", z, a)


def gin_aggregate(x, a, epsilon):
    """GIN neighborhood aggregation with learnable self-loop weight.

    Equivalent of the aggregation inside ``GraphIsoConvTD``
    (``models/gcn.py:152-157``): appends ``(1 + eps) * I`` as an extra
    partition to the binary adjacency stack and contracts, returning per-
    partition features for the per-partition MLPs.

    Args:
      x: ``(..., V, C)``.
      a: ``(K-1, V, V)`` binary adjacency without self connections.
      epsilon: scalar; self-loop weight is ``1 + epsilon``.

    Returns:
      ``(..., K, V, C)`` with the self-loop partition last, matching the
      reference's ``concat([A, (1+eps)I], axis=0)`` ordering.
    """
    v = a.shape[-1]
    self_loop = (1.0 + epsilon) * jnp.eye(v, dtype=x.dtype)
    a_full = jnp.concatenate([a, self_loop[None]], axis=0)
    return jnp.einsum("...vc,kvw->...kwc", x, a_full)
