"""Visualizer dump tests (reference show_result role, VERDICT r3 #3/#9)."""
import numpy as np

from geomae_tpu.core.visualize import box_corners, show_result


def test_box_corners_axis_aligned():
    b = np.array([[1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.0, 0, 0]])
    c = box_corners(b)[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 6))), [-1, 3])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 6))), [1, 3])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 6))),
                               [-1, 0.5])
    # 90-degree yaw swaps the BEV extents
    b90 = b.copy()
    b90[0, 6] = np.pi / 2
    c90 = box_corners(b90)[0]
    np.testing.assert_allclose(c90[:, 0].max() - c90[:, 0].min(), 2.0,
                               atol=1e-6)
    np.testing.assert_allclose(c90[:, 1].max() - c90[:, 1].min(), 4.0,
                               atol=1e-6)


def test_show_result_writes_objs(tmp_path, rng):
    pts = rng.normal(0, 5, (100, 3)).astype(np.float32)
    pred = np.array([[0, 0, -1, 4, 2, 1.5, 0.3, 0, 0]], np.float32)
    gt = np.array([[1, 1, -1, 4, 2, 1.5, 0.0, 0, 0]], np.float32)
    written = show_result(pts, gt, pred, str(tmp_path), "frame0",
                          scores=np.array([0.9]))
    assert {"points", "gt", "pred"} <= set(written)
    obj = open(written["pred"]).read().splitlines()
    assert sum(1 for l in obj if l.startswith("v ")) == 8
    assert sum(1 for l in obj if l.startswith("l ")) == 12
    assert sum(1 for l in open(written["points"])
               if l.startswith("v ")) == 100
    if "bev" in written:
        import os
        assert os.path.getsize(written["bev"]) > 1000
