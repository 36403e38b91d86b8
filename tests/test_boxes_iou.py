"""Box utilities + rotated IoU vs rasterization oracle."""
import jax.numpy as jnp
import numpy as np

from geomae_tpu.core import boxes as B
from geomae_tpu.models import box_coder
from geomae_tpu.ops.rotated_iou import boxes_iou_bev, nms_bev


def raster_iou(b1, b2, res=0.02):
    """Monte-Carlo-free oracle: rasterize both rectangles on a fine grid."""
    def corners(b):
        x, y, dx, dy, yaw = b
        c, s = np.cos(yaw), np.sin(yaw)
        lx = np.array([dx, dx, -dx, -dx]) / 2
        ly = np.array([-dy, dy, dy, -dy]) / 2
        return np.stack([x + lx * c - ly * s, y + lx * s + ly * c], -1)

    pts = np.concatenate([corners(b1), corners(b2)])
    lo, hi = pts.min(0) - res, pts.max(0) + res
    xs = np.arange(lo[0], hi[0], res)
    ys = np.arange(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)

    def inside(b):
        x, y, dx, dy, yaw = b
        c, s = np.cos(-yaw), np.sin(-yaw)
        lx = (gx - x) * c - (gy - y) * s
        ly = (gx - x) * s + (gy - y) * c
        return (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2)

    m1, m2 = inside(b1), inside(b2)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / max(union, 1)


def test_rotated_iou_vs_raster(rng):
    boxes = []
    for _ in range(12):
        boxes.append([rng.uniform(-3, 3), rng.uniform(-3, 3),
                      rng.uniform(1, 4), rng.uniform(1, 4),
                      rng.uniform(-np.pi, np.pi)])
    boxes = np.asarray(boxes, np.float32)
    got = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes),
                                   row_chunk=4))
    for i in range(12):
        for j in range(12):
            want = raster_iou(boxes[i], boxes[j])
            assert abs(got[i, j] - want) < 2e-2, (i, j, got[i, j], want)
    # diagonal is exactly 1
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)


def test_identical_and_disjoint():
    a = jnp.asarray([[0, 0, 2, 4, 0.7]], jnp.float32)
    b = jnp.asarray([[10, 10, 2, 4, 0.7], [0, 0, 2, 4, 0.7]], jnp.float32)
    iou = np.asarray(boxes_iou_bev(a, b))
    assert iou[0, 0] < 1e-6
    assert abs(iou[0, 1] - 1.0) < 1e-5


def test_axis_aligned_case():
    # two unit squares overlapping by half
    a = jnp.asarray([[0.0, 0, 1, 1, 0]], jnp.float32)
    b = jnp.asarray([[0.5, 0, 1, 1, 0]], jnp.float32)
    iou = float(boxes_iou_bev(a, b)[0, 0])
    assert abs(iou - 0.5 / 1.5) < 1e-5


def test_nms_bev():
    boxes = jnp.asarray([
        [0, 0, 2, 2, 0],       # kept (highest score)
        [0.1, 0, 2, 2, 0],     # suppressed by 0
        [5, 5, 2, 2, 0.3],     # kept
        [0, 0, 2, 2, 0],       # suppressed
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_bev(boxes, scores, jnp.ones(4, bool), 0.2, 10))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nearest_bev():
    b = jnp.asarray([[0, 0, 0, 2, 4, 1, 0.0, 0, 0],
                     [0, 0, 0, 2, 4, 1, 1.57, 0, 0]], jnp.float32)
    nb = np.asarray(B.nearest_bev(b))
    np.testing.assert_allclose(nb[0], [-1, -2, 1, 2], atol=1e-5)
    np.testing.assert_allclose(nb[1], [-2, -1, 2, 1], atol=1e-5)  # swapped


def test_box_coder_roundtrip(rng):
    anchors = np.stack([
        rng.uniform(-10, 10, 20), rng.uniform(-10, 10, 20),
        rng.uniform(-2, 0, 20), rng.uniform(1, 3, 20),
        rng.uniform(1, 5, 20), rng.uniform(1, 2, 20),
        rng.uniform(-np.pi, np.pi, 20),
        np.zeros(20), np.zeros(20)], -1).astype(np.float32)
    gt = anchors + rng.normal(scale=0.2, size=anchors.shape).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.5
    enc = box_coder.encode(jnp.asarray(gt), jnp.asarray(anchors))
    dec = np.asarray(box_coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-4)


def test_points_in_boxes():
    boxes = jnp.asarray([[0, 0, 0, 2, 4, 2, np.pi / 2, 0, 0]], jnp.float32)
    # box rotated 90deg: extent 4 along x, 2 along y, z in [0, 2]
    pts = jnp.asarray([[1.8, 0.0, 1.0], [0.0, 1.8, 1.0], [0, 0, 2.5]],
                      jnp.float32)
    got = np.asarray(B.points_in_boxes(pts, boxes))[:, 0]
    np.testing.assert_array_equal(got, [True, False, False])


def test_limit_period():
    v = jnp.asarray([0.1, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    out = np.asarray(B.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
