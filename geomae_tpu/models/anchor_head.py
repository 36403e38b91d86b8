"""Anchor3DHead: 1x1 conv heads, MaxIoU target assignment, losses, decode.

Rebuilds ``Anchor3DHead`` (``/root/reference/mmdet3d/models/dense_heads/
anchor3d_head.py:23-570``) + ``AnchorTrainMixin`` (``train_mixins.py:
11-236``) + ``box3d_multiclass_nms`` (``core/post_processing/box3d_nms.py:
149``) with static shapes:

* assignment is MaxIoUAssigner over nearest-BEV (axis-aligned) IoU
  (pos 0.6 / neg 0.3 / per-gt best >= 0.3, gt_max_assign_all, later gt
  wins), computed in anchor chunks so the [560k x G] IoU matrix never
  materializes;
* losses: sigmoid focal (avg over num_total_pos, mmdet FocalLoss
  sampling=False branch), SmoothL1 (beta 1/9) on sin-difference rotation
  encoding with code weights, direction CE (weight 0.2);
* inference: top nms_pre by max sigmoid score, decode, per-class rotated
  NMS at thr 0.2, top max_num, dir-aware yaw fix.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnchorHeadConfig
from ..core import boxes as B
from ..ops.rotated_iou import boxes_iou_bev
from . import box_coder, losses

_CHUNK = 16384


class HeadOutputs(NamedTuple):
    cls: jnp.ndarray   # [B, H, W, A*num_classes]
    reg: jnp.ndarray   # [B, H, W, A*code_size]
    dir: jnp.ndarray   # [B, H, W, A*2]


class Anchor3DHead(nn.Module):
    cfg: AnchorHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> HeadOutputs:
        c = self.cfg
        A = len(c.anchor_sizes) * len(c.rotations)
        # torch Conv2d default init (kaiming uniform a=sqrt(5))
        init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")
        conv = lambda n, name: nn.Conv(n, (1, 1), use_bias=True,
                                       kernel_init=init, dtype=self.dtype,
                                       name=name)
        return HeadOutputs(
            cls=conv(A * c.num_classes, "conv_cls")(x),
            reg=conv(A * c.code_size, "conv_reg")(x),
            dir=conv(A * 2, "conv_dir_cls")(x),
        )


# ---------------------------------------------------------------------------
# target assignment
# ---------------------------------------------------------------------------


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray         # [N] in [0, num_classes]; num_classes = bg
    label_weights: jnp.ndarray  # [N]
    bbox_targets: jnp.ndarray   # [N, 9]
    bbox_weights: jnp.ndarray   # [N]
    dir_targets: jnp.ndarray    # [N]
    num_pos: jnp.ndarray        # []


def _nearest_bev_iou_chunked(anchors_bev4, gt_bev4, gt_valid):
    """Per-anchor (max_iou, argmax_gt) + per-gt max_iou, chunked over N."""
    N = anchors_bev4.shape[0]
    G = gt_bev4.shape[0]
    pad = (-N) % _CHUNK
    a = jnp.pad(anchors_bev4, ((0, pad), (0, 0)))
    chunks = a.reshape(-1, _CHUNK, 4)

    def one(chunk):
        iou = B.aligned_iou_2d(chunk, gt_bev4)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        return iou.max(-1), iou.argmax(-1).astype(jnp.int32), iou.max(0)

    amax, aarg, gmax = jax.lax.map(one, chunks)
    return (amax.reshape(-1)[:N], aarg.reshape(-1)[:N], gmax.max(0))


def assign_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                   cfg: AnchorHeadConfig) -> AnchorTargets:
    """One sample (vmap over batch).  anchors [N, 9], gt [G, 9]."""
    N = anchors.shape[0]
    G = gt_boxes.shape[0]
    a4 = B.nearest_bev(anchors)
    g4 = B.nearest_bev(gt_boxes)
    amax, aarg, gmax = _nearest_bev_iou_chunked(a4, g4, gt_valid)

    # second pass: per-gt best anchors (gt_max_assign_all, later gt wins)
    pad = (-N) % _CHUNK
    a_pad = jnp.pad(a4, ((0, pad), (0, 0)))

    def best_of(chunk):
        iou = B.aligned_iou_2d(chunk, g4)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        hit = (iou == gmax[None, :]) & (gmax[None, :] >= cfg.min_pos_iou) \
            & gt_valid[None, :]
        gi = jnp.arange(G, dtype=jnp.int32)[None, :]
        return jnp.max(jnp.where(hit, gi, -1), axis=-1)

    best_gt = jax.lax.map(best_of, a_pad.reshape(-1, _CHUNK, 4)
                          ).reshape(-1)[:N]

    assigned = jnp.full((N,), -1, jnp.int32)                 # -1 = ignore
    assigned = jnp.where(amax < cfg.neg_iou_thr, -2, assigned)  # -2 = neg
    assigned = jnp.where(amax >= cfg.pos_iou_thr, aarg, assigned)
    assigned = jnp.where(best_gt >= 0, best_gt, assigned)

    pos = assigned >= 0
    neg = assigned == -2
    safe_gt = jnp.clip(assigned, 0, G - 1)
    gt_for = gt_boxes[safe_gt]
    labels = jnp.where(pos, gt_labels[safe_gt], cfg.num_classes)
    label_weights = (pos | neg).astype(jnp.float32)

    bt = box_coder.encode(gt_for, anchors)
    bt = jnp.where(pos[:, None], bt, 0.0)

    # direction target (train_mixins.py:317-340): bin of gt yaw - dir_offset
    rot_gt = gt_for[:, 6]
    offset_rot = B.limit_period(rot_gt - cfg.dir_offset, 0, 2 * np.pi)
    dir_t = jnp.clip(jnp.floor(offset_rot / np.pi).astype(jnp.int32), 0, 1)
    dir_t = jnp.where(pos, dir_t, 0)

    return AnchorTargets(labels=labels, label_weights=label_weights,
                         bbox_targets=bt,
                         bbox_weights=pos.astype(jnp.float32),
                         dir_targets=dir_t,
                         num_pos=pos.sum().astype(jnp.int32))


def head_loss(out: HeadOutputs, anchors: jnp.ndarray, gt_boxes, gt_labels,
              gt_mask, cfg: AnchorHeadConfig) -> dict:
    """Batched loss dict.  gt_*: [B, G, ...]."""
    Bz = out.cls.shape[0]
    C = cfg.num_classes
    code = cfg.code_size
    cls = out.cls.reshape(Bz, -1, C)
    reg = out.reg.reshape(Bz, -1, code)
    dirp = out.dir.reshape(Bz, -1, 2)

    tg = jax.vmap(lambda b, l, m: assign_targets(anchors, b, l, m, cfg))(
        gt_boxes, gt_labels, gt_mask)
    # num_total_pos = sum(max(pos_i, 1)) (train_mixins.py:85)
    num_pos = jnp.sum(jnp.maximum(tg.num_pos, 1)).astype(jnp.float32)

    f32 = lambda x: x.astype(jnp.float32)
    loss_cls = losses.sigmoid_focal_loss(
        f32(cls), tg.labels, C, cfg.focal_gamma, cfg.focal_alpha)
    loss_cls = jnp.sum(loss_cls * tg.label_weights) / num_pos \
        * cfg.loss_cls_weight

    pos_w = tg.bbox_weights[..., None] * jnp.asarray(cfg.code_weight)
    pred_sin, tgt_sin = _sin_difference(f32(reg), tg.bbox_targets)
    loss_bbox = losses.smooth_l1(pred_sin, tgt_sin, cfg.smooth_l1_beta)
    loss_bbox = jnp.sum(loss_bbox * pos_w) / num_pos * cfg.loss_bbox_weight

    loss_dir = losses.softmax_ce(f32(dirp), tg.dir_targets)
    loss_dir = jnp.sum(loss_dir * tg.bbox_weights) / num_pos \
        * cfg.loss_dir_weight

    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dir=loss_dir)


def _sin_difference(pred, target):
    """sin(a-b) encoding of the rotation residual (anchor3d_head.py:284)."""
    sin_p = jnp.sin(pred[..., 6:7]) * jnp.cos(target[..., 6:7])
    sin_t = jnp.cos(pred[..., 6:7]) * jnp.sin(target[..., 6:7])
    p = jnp.concatenate([pred[..., :6], sin_p, pred[..., 7:]], -1)
    t = jnp.concatenate([target[..., :6], sin_t, target[..., 7:]], -1)
    return p, t


# ---------------------------------------------------------------------------
# inference decode + multiclass rotated NMS
# ---------------------------------------------------------------------------


class Detections(NamedTuple):
    boxes: jnp.ndarray    # [max_num, 9]
    scores: jnp.ndarray   # [max_num]
    labels: jnp.ndarray   # [max_num]
    valid: jnp.ndarray    # [max_num] bool


def _nms_from_iou(iou, order, valid_sorted, thr, max_out):
    """Greedy NMS given a precomputed IoU matrix and a sorted order."""
    K = order.shape[0]
    iou_s = iou[order][:, order]
    sup = iou_s > thr

    def body(i, alive):
        keep_i = alive[i] & valid_sorted[i]
        kill = sup[i] & keep_i
        kill = kill.at[i].set(False)
        return alive & ~kill

    alive = jax.lax.fori_loop(0, K, body, jnp.ones((K,), bool))
    return alive & valid_sorted


def predict(out: HeadOutputs, anchors: jnp.ndarray,
            cfg: AnchorHeadConfig) -> Detections:
    """Batched decode; returns fixed-size per-sample detections."""

    def one(cls, reg, dirp):
        C = cfg.num_classes
        scores = jax.nn.sigmoid(cls.reshape(-1, C).astype(jnp.float32))
        reg = reg.reshape(-1, cfg.code_size).astype(jnp.float32)
        dir_score = jnp.argmax(dirp.reshape(-1, 2), axis=-1)

        k = min(cfg.nms_pre, scores.shape[0])
        top = jax.lax.top_k(scores.max(-1), k)[1]
        boxes = box_coder.decode(reg[top], anchors[top])
        scores = scores[top]
        dir_score = dir_score[top]

        bev5 = B.bev(boxes)
        iou = boxes_iou_bev(bev5, bev5)

        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for c in range(C):
            sc = scores[:, c]
            ok = sc > cfg.score_thr
            order = jnp.argsort(-sc)
            keep_sorted = _nms_from_iou(iou, order, ok[order], cfg.nms_thr,
                                        cfg.max_num)
            keep = jnp.zeros_like(ok).at[order].set(keep_sorted)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, sc, -1.0))
            all_labels.append(jnp.full((k,), c, jnp.int32))
            all_valid.append(keep)

        boxes_c = jnp.concatenate(all_boxes)
        scores_c = jnp.concatenate(all_scores)
        labels_c = jnp.concatenate(all_labels)
        valid_c = jnp.concatenate(all_valid)

        sc_top, idx = jax.lax.top_k(scores_c, cfg.max_num)
        boxes_f = boxes_c[idx]
        labels_f = labels_c[idx]
        valid_f = valid_c[idx] & (sc_top > 0)

        # dir-aware yaw (anchor3d_head.py:545-548), dir_limit_offset=1
        ds = jnp.concatenate([dir_score] * C)[idx]
        dir_rot = B.limit_period(boxes_f[:, 6] - cfg.dir_offset, 1, np.pi)
        yaw = dir_rot + cfg.dir_offset + np.pi * ds.astype(jnp.float32)
        boxes_f = boxes_f.at[:, 6].set(yaw)
        return Detections(boxes=boxes_f, scores=sc_top, labels=labels_f,
                          valid=valid_f)

    return jax.vmap(one)(out.cls, out.reg, out.dir)


def decode_pre_nms(out: HeadOutputs, anchors: jnp.ndarray,
                   cfg: AnchorHeadConfig):
    """Batched top-``nms_pre`` decode WITHOUT NMS — the device half of the
    weighted-NMS path (reference ``anchor3d_head.py:430-520`` up to the
    ``box3d_multiclass_wnms`` call).  Returns (boxes [B, k, code_size],
    scores [B, k, C], dir_scores [B, k])."""

    def one(cls, reg, dirp):
        C = cfg.num_classes
        scores = jax.nn.sigmoid(cls.reshape(-1, C).astype(jnp.float32))
        reg = reg.reshape(-1, cfg.code_size).astype(jnp.float32)
        dir_score = jnp.argmax(dirp.reshape(-1, 2), axis=-1)
        k = min(cfg.nms_pre, scores.shape[0])
        top = jax.lax.top_k(scores.max(-1), k)[1]
        return (box_coder.decode(reg[top], anchors[top]), scores[top],
                dir_score[top])

    return jax.vmap(one)(out.cls, out.reg, out.dir)


def predict_wnms(boxes, scores, dir_scores, cfg: AnchorHeadConfig,
                 thr_suppress: float = 0.1, thr_vote: float = 0.7,
                 use_3d: bool = False) -> Detections:
    """Host-side weighted-NMS prediction over :func:`decode_pre_nms`
    outputs (reference wnms_cpu branch, ``anchor3d_head.py:498-551``):
    per-class wnms merge, then the dir-aware yaw fix on the merged boxes.
    Returns fixed-size ``Detections`` (padded to ``cfg.max_num``)."""
    from ..core.wnms import box3d_multiclass_wnms

    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    dir_scores = np.asarray(dir_scores)
    Bn, _, code = boxes.shape
    m = cfg.max_num
    out_b = np.zeros((Bn, m, code), np.float32)
    out_s = np.full((Bn, m), -1.0, np.float32)
    out_l = np.zeros((Bn, m), np.int32)
    out_v = np.zeros((Bn, m), bool)
    for b in range(Bn):
        # sigmoid scores get a dummy bg column (use_sigmoid_cls pad)
        sc = np.concatenate(
            [scores[b], np.zeros((scores.shape[1], 1), np.float32)], -1)
        bx, ss, ll, ds = box3d_multiclass_wnms(
            boxes[b, :, :7], sc, cfg.score_thr, m, thr_suppress, thr_vote,
            use_3d, dir_scores[b])
        n = len(ss)
        if n == 0:
            continue
        # dir-aware yaw on merged boxes (anchor3d_head.py:545-549)
        dir_rot = np.asarray(B.limit_period(
            jnp.asarray(bx[:, 6]) - cfg.dir_offset, 1, np.pi))
        yaw = dir_rot + cfg.dir_offset + np.pi * ds.astype(np.float32)
        full = np.zeros((n, code), np.float32)
        full[:, :7] = bx
        full[:, 6] = yaw
        out_b[b, :n] = full
        out_s[b, :n] = ss
        out_l[b, :n] = ll
        out_v[b, :n] = True
    return Detections(boxes=jnp.asarray(out_b), scores=jnp.asarray(out_s),
                      labels=jnp.asarray(out_l), valid=jnp.asarray(out_v))
