"""Rotated BEV IoU + rotated NMS in pure JAX.

Replaces the ``iou3d_cuda`` extension (``/root/reference/mmdet3d/ops/iou3d/
src/iou3d_kernel.cu``: ``boxes_overlap_bev_gpu`` / ``nms_gpu``) and its
wrappers (``core/post_processing/box3d_nms.py:110-149``).

The CUDA kernel walks polygon edges with scalar branches; here the
rectangle-rectangle intersection is computed branch-free and fixed-shape,
which is what the VPU wants:

1. 24 candidate vertices per pair: 16 edge-pair intersections + 4 corners of
   A inside B + 4 corners of B inside A (validity-masked);
2. the intersection of convex sets is convex, so order candidates by angle
   around their mean and take the shoelace area.

Greedy NMS is a ``fori_loop`` over the score-sorted list with a running
suppression mask — same result as the CUDA bitmask algorithm.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.boxes import corners_bev

_EPS = 1e-8


def _point_in_rect(pts, rect):
    """pts [..., P, 2] inside rotated rect [..., 5] (x, y, dx, dy, yaw)."""
    d = pts - rect[..., None, 0:2]
    cs, sn = jnp.cos(rect[..., 4]), jnp.sin(rect[..., 4])
    lx = d[..., 0] * cs[..., None] + d[..., 1] * sn[..., None]
    ly = -d[..., 0] * sn[..., None] + d[..., 1] * cs[..., None]
    return ((jnp.abs(lx) <= rect[..., None, 2] * 0.5 + 1e-5)
            & (jnp.abs(ly) <= rect[..., None, 3] * 0.5 + 1e-5))


def _segment_intersections(ca, cb):
    """All 16 edge-pair intersection points of two quads.

    ca, cb: [..., 4, 2] corners.  Returns (pts [..., 16, 2], valid)."""
    a1 = ca
    a2 = jnp.roll(ca, -1, axis=-2)
    b1 = cb
    b2 = jnp.roll(cb, -1, axis=-2)
    # broadcast into [..., 4, 4, 2]
    a1 = a1[..., :, None, :]
    a2 = a2[..., :, None, :]
    b1 = b1[..., None, :, :]
    b2 = b2[..., None, :, :]
    da = a2 - a1
    db = b2 - b1
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    ab = b1 - a1
    t = (ab[..., 0] * db[..., 1] - ab[..., 1] * db[..., 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom)
    u = (ab[..., 0] * da[..., 1] - ab[..., 1] * da[..., 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom)
    ok = ((jnp.abs(denom) >= _EPS) & (t >= 0) & (t <= 1)
          & (u >= 0) & (u <= 1))
    pts = a1 + t[..., None] * da
    shp = pts.shape[:-3] + (16, 2)
    return pts.reshape(shp), ok.reshape(shp[:-1])


def rect_intersection_area(boxes_a, boxes_b):
    """Intersection area of rotated BEV boxes, pairwise along the leading
    axes.  boxes: [..., 5] (x, y, dx, dy, yaw)."""
    ca = _corners5(boxes_a)
    cb = _corners5(boxes_b)
    p_int, v_int = _segment_intersections(ca, cb)
    v_ab = _point_in_rect(ca, boxes_b)
    v_ba = _point_in_rect(cb, boxes_a)
    pts = jnp.concatenate([p_int, ca, cb], axis=-2)          # [..., 24, 2]
    valid = jnp.concatenate([v_int, v_ab, v_ba], axis=-1)

    n = jnp.sum(valid, axis=-1, keepdims=True)               # [..., 1]
    ctr = (jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2,
                   keepdims=True) / jnp.maximum(n[..., None], 1))
    rel = pts - ctr
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, 1e3)                          # invalid last
    order = jnp.argsort(ang, axis=-1)
    rel = jnp.take_along_axis(rel, order[..., None].repeat(2, -1), axis=-2)

    K = pts.shape[-2]
    i = jnp.arange(K)
    nxt = jnp.roll(rel, -1, axis=-2)
    cross = rel[..., 0] * nxt[..., 1] - rel[..., 1] * nxt[..., 0]
    inner = jnp.where(i < n - 1, cross, 0.0).sum(-1)
    last = jnp.take_along_axis(
        rel, jnp.clip(n - 1, 0, K - 1)[..., None].repeat(2, -1), axis=-2
    )[..., 0, :]
    first = rel[..., 0, :]
    closing = last[..., 0] * first[..., 1] - last[..., 1] * first[..., 0]
    area = 0.5 * jnp.abs(inner + closing)
    return jnp.where(n[..., 0] >= 3, area, 0.0)


def _corners5(b):
    """Corners of [..., 5] (x, y, dx, dy, yaw) BEV boxes."""
    fake = jnp.concatenate(
        [b[..., 0:2], jnp.zeros_like(b[..., 0:1]), b[..., 2:4],
         jnp.ones_like(b[..., 0:1]), b[..., 4:5]], -1)
    return corners_bev(fake)


def boxes_iou_bev(boxes_a, boxes_b, row_chunk: int = 128):
    """Rotated BEV IoU matrix [N, M] (``boxes_iou_bev_gpu`` equivalent).

    boxes: [N, 5] / [M, 5].  Memory-chunked over rows via ``lax.map``.
    """
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    pad = (-N) % row_chunk
    a_pad = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    chunks = a_pad.reshape(-1, row_chunk, 5)

    def one(chunk):
        inter = rect_intersection_area(chunk[:, None, :].repeat(M, 1),
                                       boxes_b[None, :, :].repeat(
                                           row_chunk, 0))
        return inter

    inter = jax.lax.map(one, chunks).reshape(-1, M)[:N]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def circle_nms(centers, scores, valid, min_radius: float, max_out: int):
    """Greedy center-distance NMS (CenterPoint's ``circle_nms``, reference
    ``core/post_processing/box3d_nms.py:321`` numba kernel): suppress any
    candidate within ``min_radius`` of a kept higher-scoring one.

    Args: centers [K, 2] score-sorted descending; valid [K].
    Returns keep mask [K] (at most max_out True)."""
    K = centers.shape[0]
    d2 = jnp.sum((centers[:, None] - centers[None]) ** 2, -1)
    sup = d2 < min_radius ** 2

    def body(i, alive):
        keep_i = alive[i] & valid[i]
        kill = sup[i] & keep_i
        kill = kill.at[i].set(False)
        return alive & ~kill

    alive = jax.lax.fori_loop(0, K, body, jnp.ones((K,), bool))
    keep = alive & valid
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    return keep & (rank < max_out)


def nms_bev(boxes5, scores, valid, iou_thr: float, max_out: int):
    """Greedy rotated-BEV NMS (``nms_gpu`` / ``box3d_nms.py:110`` semantics).

    Args:
      boxes5: [K, 5] rotated BEV boxes (already score-sorted descending!).
      scores: [K] (sorted descending; used only for tie ordering upstream).
      valid:  [K] candidate mask.
      iou_thr: suppression threshold (0.2 for nuScenes Anchor3DHead).
      max_out: static cap on kept boxes.

    Returns: keep mask [K] (at most ``max_out`` True, best-score first).
    """
    K = boxes5.shape[0]
    iou = boxes_iou_bev(boxes5, boxes5, row_chunk=min(128, K))
    sup = (iou > iou_thr)

    def body(i, alive):
        keep_i = alive[i] & valid[i]
        kill = sup[i] & keep_i
        kill = kill.at[i].set(False)
        return alive & ~kill

    alive = jax.lax.fori_loop(0, K, body, jnp.ones((K,), bool))
    keep = alive & valid
    # enforce max_out: keep only the first max_out kept (list is sorted)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    return keep & (rank < max_out)
