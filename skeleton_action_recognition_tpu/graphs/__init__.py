"""Skeleton graph construction (adjacency matrices and edge lists)."""

from skeleton_action_recognition_tpu.graphs.tools import (
    edge2mat,
    get_spatial_graph,
    normalize_digraph,
)
from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import (
    BONE_PAIRS,
    INWARD,
    NEIGHBOR,
    NUM_JOINTS,
    OUTWARD,
    RADAR_EDGES,
    SELF_LINK,
    Graph,
)
from skeleton_action_recognition_tpu.graphs.azure_kinect import (
    AZURE_KINECT_EDGES,
)

__all__ = [
    "AZURE_KINECT_EDGES",
    "BONE_PAIRS",
    "Graph",
    "INWARD",
    "NEIGHBOR",
    "NUM_JOINTS",
    "OUTWARD",
    "RADAR_EDGES",
    "SELF_LINK",
    "edge2mat",
    "get_spatial_graph",
    "normalize_digraph",
]
