"""Demo-data loaders for the VirtualRadar examples.

Equivalents of the loaders in the reference's ``utils.py``:

* :func:`load_azure_kinect` — Azure Kinect body-tracking JSON -> joints in
  meters + the 26-edge skeleton (``utils.py:29-50``);
* :func:`load_ntu_file` — a single raw ``.skeleton`` file -> ``(T, V, 3)``
  joints + the pruned radar edge list (``utils.py:61-69``).
"""

from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

from skeleton_action_recognition_tpu.data.skeleton import read_xyz
from skeleton_action_recognition_tpu.graphs.azure_kinect import (
    AZURE_KINECT_EDGES,
)
from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import RADAR_EDGES


def load_azure_kinect(filename: str) -> Tuple[np.ndarray, List]:
    """Returns ``((T, 32, 3) meters, edges)``; frames without a tracked
    body are dropped and millimeters are converted to meters."""
    with open(filename) as f:
        doc = json.load(f)
    frames = [
        frame["bodies"][0]["joint_positions"]
        for frame in doc["frames"]
        if frame["num_bodies"] > 0
    ]
    return np.asarray(frames, np.float64) * 0.001, list(AZURE_KINECT_EDGES)


def load_ntu_file(filename: str) -> Tuple[np.ndarray, List]:
    """Returns ``((M, T, V, 3), edges)`` for one raw NTU clip."""
    data = read_xyz(filename)  # (3, T, V, M)
    return np.transpose(data, (3, 1, 2, 0)), list(RADAR_EDGES)
