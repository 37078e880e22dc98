"""Adjacency-matrix construction utilities.

Functional parity with the reference's ``graph/tools.py`` (see
``/root/reference/graph/tools.py:4-30``): directed edge lists become binary
adjacency matrices with ``A[dst, src] = 1``, in-degree column normalization
``A @ D^-1``, and the 3-way spatial labeling ``stack([I, In_norm, Out_norm])``
of ST-GCN.

Everything here is host-side numpy executed once at model-construction time;
the resulting ``(K, V, V)`` tensors are closed over as constants (or bound as
trainable parameters) by the JAX models.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import numpy as np

Edge = Tuple[int, int]


def edge2mat(edges: Iterable[Edge], num_nodes: int) -> np.ndarray:
    """Binary adjacency with ``A[j, i] = 1`` for each directed edge ``(i, j)``.

    Matches ``graph/tools.py:4-8`` in the reference: the *column* index is the
    edge source, the *row* index the destination, so that the model-side
    contraction ``x @ A`` aggregates each node's in-neighbors.
    """
    a = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    for i, j in edges:
        a[j, i] = 1.0
    return a


def normalize_digraph(a: np.ndarray) -> np.ndarray:
    """Column-normalize: ``A @ D^-1`` with zero-degree columns left at zero.

    Matches ``graph/tools.py:11-19``.
    """
    degree = a.sum(axis=0)
    inv = np.where(degree > 0, 1.0 / np.where(degree > 0, degree, 1.0), 0.0)
    return a * inv[None, :]


def get_spatial_graph(
    num_nodes: int,
    self_link: Sequence[Edge],
    inward: Sequence[Edge],
    outward: Sequence[Edge],
    normalize: bool = True,
) -> np.ndarray:
    """ST-GCN spatial-configuration labeling: ``(3, V, V)`` stack.

    ``[identity, normalize(inward), normalize(outward)]`` when ``normalize``
    is True (ST-GCN's spatial partitioning), or the unnormalized binary stack
    otherwise (used for the GIN labeling). Matches ``graph/tools.py:22-30``.
    """
    i = edge2mat(self_link, num_nodes)
    inw = edge2mat(inward, num_nodes)
    out = edge2mat(outward, num_nodes)
    if normalize:
        inw = normalize_digraph(inw)
        out = normalize_digraph(out)
    return np.stack([i, inw, out])
