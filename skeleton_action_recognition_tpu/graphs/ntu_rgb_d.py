"""NTU RGB+D 25-joint skeleton graph.

Topology and labeling semantics match the reference's
``graph/ntu_rgb_d.py:6-40``:

* 24 inward edges given 1-indexed, converted to 0-indexed;
* ``'spatial'`` labeling → ``(3, V, V)`` ``[I, norm(In), norm(Out)]``;
* ``'GIN'`` labeling → unnormalized stack with the identity row dropped,
  ``(2, V, V)``.

Also hosts two auxiliary edge lists the reference keeps elsewhere:

* :data:`RADAR_EDGES` — the pruned 24-edge list the VirtualRadar layer
  defaults to (``layers/virtual_radar.py:10-13``);
* :data:`BONE_PAIRS` — the 25 directed (1-indexed) joint pairs used to
  derive the bone stream, including the self-pair ``(21, 21)`` that yields
  a zero bone at the spine (``data_gen/gen_bone_data.py:7-16``; identical
  for the xview and xsub benchmarks).
"""

from __future__ import annotations

import numpy as np

from skeleton_action_recognition_tpu.graphs import tools

NUM_JOINTS = 25

SELF_LINK = [(i, i) for i in range(NUM_JOINTS)]

# 1-indexed (child, parent) pairs toward the spine; graph/ntu_rgb_d.py:8-11.
_INWARD_1INDEXED = [
    (1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5), (7, 6),
    (8, 7), (9, 21), (10, 9), (11, 10), (12, 11), (13, 1),
    (14, 13), (15, 14), (16, 15), (17, 1), (18, 17), (19, 18),
    (20, 19), (22, 23), (23, 8), (24, 25), (25, 12),
]
INWARD = [(i - 1, j - 1) for (i, j) in _INWARD_1INDEXED]
OUTWARD = [(j, i) for (i, j) in INWARD]
NEIGHBOR = INWARD + OUTWARD

# Pruned default edge list of the VirtualRadar layer
# (layers/virtual_radar.py:10-13): joints/edges with negligible spectrogram
# impact removed.
RADAR_EDGES = [
    (0, 1), (1, 20), (20, 2), (2, 3), (20, 4), (4, 5), (5, 6), (6, 7),
    (7, 21), (7, 22), (20, 8), (8, 9), (9, 10), (10, 11), (11, 23),
    (11, 24), (0, 16), (0, 12), (12, 13), (13, 14), (14, 15), (16, 17),
    (17, 18), (18, 19),
]

# Bone-stream (v1, v2) pairs, 1-indexed: bone[v1] = joint[v1] - joint[v2]
# (data_gen/gen_bone_data.py:7-16).
BONE_PAIRS = (
    (1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5), (7, 6), (8, 7),
    (9, 21), (10, 9), (11, 10), (12, 11), (13, 1), (14, 13), (15, 14),
    (16, 15), (17, 1), (18, 17), (19, 18), (20, 19), (22, 23), (21, 21),
    (23, 8), (24, 25), (25, 12),
)


class Graph:
    """NTU RGB+D skeleton graph with selectable adjacency labeling."""

    def __init__(self, labeling_mode: str = "spatial"):
        self.num_node = NUM_JOINTS
        self.self_link = SELF_LINK
        self.inward = INWARD
        self.outward = OUTWARD
        self.neighbor = NEIGHBOR
        self.A = self.get_adjacency_matrix(labeling_mode)

    def get_adjacency_matrix(self, labeling_mode: str) -> np.ndarray:
        if labeling_mode == "spatial":
            return tools.get_spatial_graph(
                NUM_JOINTS, SELF_LINK, INWARD, OUTWARD
            )
        if labeling_mode == "GIN":
            a = tools.get_spatial_graph(
                NUM_JOINTS, SELF_LINK, INWARD, OUTWARD, normalize=False
            )
            return a[1:]
        raise ValueError(f"unknown labeling_mode: {labeling_mode!r}")


if __name__ == "__main__":
    # visual debugging entry point (the reference plots adjacency
    # matrices from graph/ntu_rgb_d.py:43-54); saves heatmaps to disk
    import sys

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mode = sys.argv[1] if len(sys.argv) > 1 else "spatial"
    a = Graph(mode).A
    fig, axes = plt.subplots(1, len(a), figsize=(4 * len(a), 4))
    for i, (ax, mat) in enumerate(zip(np.atleast_1d(axes), a)):
        ax.imshow(mat, cmap="gray")
        ax.set_title(f"{mode}[{i}]")
    out = f"/tmp/adjacency_{mode}.png"
    plt.savefig(out, dpi=80)
    print(f"{a.shape} -> {out}")
