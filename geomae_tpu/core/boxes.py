"""LiDAR 3D box utilities (pure JAX + numpy-compatible).

Rebuilds the parts of ``LiDARInstance3DBoxes``
(``/root/reference/mmdet3d/core/bbox/structures/lidar_box3d.py:10-269``)
that the GeoMAE fine-tune path touches: gravity/bottom centers, BEV
projections, nearest-axis-aligned BEV, corners, rotation/flip, and
point-in-box tests.  Boxes are plain ``[..., 7+]`` arrays
``(x, y, z_bottom, w, l, h, yaw, [vx, vy])`` in LiDAR frame, matching the
reference's storage convention (z is the BOTTOM of the box; dims are
(w=dx, l=dy, h=dz) with yaw about +z).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Map to [-offset*period, (1-offset)*period) (reference
    ``core/bbox/structures/utils.py``)."""
    return val - jnp.floor(val / period + offset) * period


def gravity_center(boxes):
    """[..., 3] — z at box middle (lidar boxes store bottom z)."""
    return jnp.concatenate(
        [boxes[..., :2], (boxes[..., 2:3] + boxes[..., 5:6] * 0.5)], -1)


def bev(boxes):
    """[..., 5] (x, y, dx, dy, yaw) rotated BEV boxes."""
    return jnp.concatenate([boxes[..., 0:2], boxes[..., 3:5],
                            boxes[..., 6:7]], -1)


def nearest_bev(boxes):
    """Axis-aligned BEV [..., 4] (x1, y1, x2, y2) after rotating each box to
    its nearest axis (``base_box3d.py`` ``nearest_bev``): if yaw (mod pi) is
    closer to pi/2, swap dx/dy."""
    b = bev(boxes)
    rot = limit_period(b[..., 4], 0.5, np.pi)
    cond = (jnp.abs(rot) > np.pi / 4)[..., None]
    dims = jnp.where(cond, b[..., [3, 2]], b[..., 2:4])
    ctr = b[..., :2]
    return jnp.concatenate([ctr - dims / 2, ctr + dims / 2], -1)


def corners_bev(boxes):
    """[..., 4, 2] BEV corner points (counter-clockwise)."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    cs, sn = jnp.cos(yaw), jnp.sin(yaw)
    # local corners (+-dx/2, +-dy/2), CCW
    lx = jnp.stack([dx, dx, -dx, -dx], -1) * 0.5
    ly = jnp.stack([-dy, dy, dy, -dy], -1) * 0.5
    cx = x[..., None] + lx * cs[..., None] - ly * sn[..., None]
    cy = y[..., None] + lx * sn[..., None] + ly * cs[..., None]
    return jnp.stack([cx, cy], -1)


def aligned_iou_2d(boxes1, boxes2, eps: float = 1e-6):
    """Axis-aligned 2D IoU matrix: boxes [N, 4] x [M, 4] -> [N, M].

    Matches ``BboxOverlapsNearest3D`` (``iou3d_calculator.py:9``) when fed
    ``nearest_bev`` outputs.
    """
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1]))
    a2 = ((boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1]))
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, eps)


def points_in_boxes(points, boxes):
    """Bool [P, N]: point inside rotated box (z within [z, z+h]).

    Replaces the roiaware_pool3d CUDA op (``points_in_boxes_gpu``,
    ``mmdet3d/ops/roiaware_pool3d``): rotate points into each box frame and
    compare against half-dims.
    """
    ctr = boxes[:, :3]
    local = points[:, None, :3] - ctr[None]
    yaw = boxes[:, 6]
    cs, sn = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = local[..., 0] * cs - local[..., 1] * sn
    ly = local[..., 0] * sn + local[..., 1] * cs
    lz = local[..., 2]
    inside = ((jnp.abs(lx) <= boxes[:, 3] / 2)
              & (jnp.abs(ly) <= boxes[:, 4] / 2)
              & (lz >= 0) & (lz <= boxes[:, 5]))
    return inside
