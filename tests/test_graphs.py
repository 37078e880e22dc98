"""Adjacency construction parity with graph/tools.py + graph/ntu_rgb_d.py."""

import numpy as np

from skeleton_action_recognition_tpu import graphs


def test_edge2mat_convention():
    a = graphs.edge2mat([(0, 1), (2, 1)], 3)
    # A[dst, src] = 1
    assert a[1, 0] == 1 and a[1, 2] == 1
    assert a.sum() == 2


def test_normalize_digraph_columns():
    a = graphs.edge2mat([(0, 1), (2, 1), (0, 2)], 3)
    n = graphs.normalize_digraph(a)
    # Each nonzero column sums to 1; zero columns stay zero.
    sums = n.sum(axis=0)
    np.testing.assert_allclose(sums[a.sum(axis=0) > 0], 1.0)
    assert (sums[a.sum(axis=0) == 0] == 0).all()


def test_spatial_graph_shape_and_identity():
    g = graphs.Graph("spatial")
    assert g.A.shape == (3, 25, 25)
    np.testing.assert_allclose(g.A[0], np.eye(25))
    # inward/outward are transposes of each other before normalization
    inw = graphs.edge2mat(graphs.INWARD, 25)
    out = graphs.edge2mat(graphs.OUTWARD, 25)
    np.testing.assert_allclose(inw, out.T)


def test_gin_graph_drops_identity():
    g = graphs.Graph("GIN")
    assert g.A.shape == (2, 25, 25)
    # unnormalized binary matrices
    assert set(np.unique(g.A)) <= {0.0, 1.0}
    assert g.A[0].sum() == 24  # one inward edge per non-root joint


def test_graph_matches_reference_construction():
    """Recompute the reference algorithm inline and compare."""
    ref_inward = [(i - 1, j - 1) for i, j in [
        (1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5), (7, 6),
        (8, 7), (9, 21), (10, 9), (11, 10), (12, 11), (13, 1),
        (14, 13), (15, 14), (16, 15), (17, 1), (18, 17), (19, 18),
        (20, 19), (22, 23), (23, 8), (24, 25), (25, 12)]]
    a = np.zeros((25, 25))
    for i, j in ref_inward:
        a[j, i] = 1
    d = a.sum(0)
    dn = np.zeros((25, 25))
    for i in range(25):
        if d[i] > 0:
            dn[i, i] = d[i] ** -1
    np.testing.assert_allclose(
        graphs.Graph("spatial").A[1], a @ dn, atol=1e-12
    )


def test_bone_pairs_and_radar_edges():
    assert len(graphs.BONE_PAIRS) == 25
    assert (21, 21) in graphs.BONE_PAIRS  # zero spine bone
    assert len(graphs.RADAR_EDGES) == 24
    assert len(graphs.AZURE_KINECT_EDGES) == 26
