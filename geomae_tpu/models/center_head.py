"""CenterHead (CenterPoint) — per-task separate heads, gaussian heatmap
targets, L1 regression, top-k decode.

Rebuilds ``CenterHead`` / ``SeparateHead``
(``/root/reference/mmdet3d/models/dense_heads/centerpoint_head.py:245-837``)
and the gaussian utilities (``core/utils/gaussian.py``) with static shapes:

* heatmap targets are computed WITHOUT per-object python loops or
  scatter-draws: the per-class heatmap at pixel p is
  ``max_k gaussian(p - center_k)`` over the padded object set, masked to the
  reference's (2r+1)² Chebyshev window around the integer center — a dense
  [H*W, max_objs] broadcast that the VPU eats;
* regression targets live at integer center pixels, masked (max_objs cap),
  L1 with code weights, normalized by num valid (+1e-4) — matching
  ``loss`` (``:578-625``) incl. the gaussian focal heatmap loss with
  clip-sigmoid and num_pos normalization;
* decode: per-task top-k over sigmoid heatmaps, center/rot/dim
  reconstruction, score + post-center-range filter, per-task rotated NMS.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CenterHeadConfig, VoxelConfig
from ..ops.rotated_iou import nms_bev
from .anchor_head import Detections
from .norm import MaskedBatchNorm2d


# ---------------------------------------------------------------------------
# module
# ---------------------------------------------------------------------------


class SeparateHead(nn.Module):
    """Shared 3x3 conv trunk + one small conv branch per output."""

    cfg: CenterHeadConfig
    num_cls: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        outs = {}
        heads = dict(c.common_heads)
        heads["heatmap"] = self.num_cls
        for name, ch_out in heads.items():
            h = x
            # num_conv=2: one conv+BN+ReLU then the final 3x3 conv w/ bias
            h = nn.Conv(c.share_conv_channel, (3, 3), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv0")(h)
            h = MaskedBatchNorm2d(c.share_conv_channel, c.bn_momentum,
                                  c.bn_eps, name=f"{name}_bn0")(h, train)
            h = nn.relu(h)
            bias_init = nn.initializers.constant(c.init_bias) \
                if name == "heatmap" else nn.initializers.zeros
            h = nn.Conv(ch_out, (3, 3), padding=1, use_bias=True,
                        bias_init=bias_init, dtype=self.dtype,
                        name=f"{name}_final")(h)
            outs[name] = h
        return outs


class CenterHead(nn.Module):
    cfg: CenterHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> List[Dict[str, jnp.ndarray]]:
        c = self.cfg
        h = nn.Conv(c.share_conv_channel, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="shared_conv")(x)
        h = MaskedBatchNorm2d(c.share_conv_channel, c.bn_momentum, c.bn_eps,
                              name="shared_bn")(h, train)
        h = nn.relu(h)
        return [SeparateHead(c, len(t), self.dtype, name=f"task_{i}")(
            h, train) for i, t in enumerate(c.tasks)]


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------


def gaussian_radius_feat(length_px, width_px, min_overlap: float):
    """CenterPoint radius formula (reference ``gaussian.py:56-90``).

    The reference divides ALL THREE quadratic roots by 2 — including r2
    (whose leading coefficient is 4) and r3 (computed as (b3 + sq3)/2 with
    NEGATIVE b3) — the original CornerNet variant.  Reproduced exactly;
    "fixing" the algebra would change every radius and break parity."""
    h, w = length_px, width_px
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1**2 - 4 * c1, 0.0))) / 2
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2**2 - 16 * c2, 0.0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterTargets(NamedTuple):
    heatmap: jnp.ndarray      # [num_classes, H, W]
    anno: jnp.ndarray         # [max_objs, 10]
    inds: jnp.ndarray         # [max_objs] flat pixel index (y*W + x)
    mask: jnp.ndarray         # [max_objs] bool
    cls: jnp.ndarray          # [max_objs] global class id (for task split)


def compute_center_targets(gt_boxes, gt_labels, gt_mask,
                           cfg: CenterHeadConfig, voxel: VoxelConfig,
                           featmap: Tuple[int, int]) -> CenterTargets:
    """One sample (vmap over batch).  gt_boxes [G, 9] (z = bottom)."""
    H, W = featmap
    G = gt_boxes.shape[0]
    r = voxel.point_cloud_range
    fac = cfg.out_size_factor
    vx, vy = voxel.voxel_size[0], voxel.voxel_size[1]

    wpx = gt_boxes[:, 3] / vx / fac
    lpx = gt_boxes[:, 4] / vy / fac
    radius = gaussian_radius_feat(lpx, wpx, cfg.gaussian_overlap)
    radius = jnp.maximum(cfg.min_radius,
                         jnp.floor(radius).astype(jnp.int32))

    cx = (gt_boxes[:, 0] - r[0]) / vx / fac
    cy = (gt_boxes[:, 1] - r[1]) / vy / fac
    # reference truncates toward zero (``center.to(torch.int32)``,
    # centerpoint_head.py:535), so cx in (-1, 0) lands on pixel 0
    ix = cx.astype(jnp.int32)
    iy = cy.astype(jnp.int32)
    ok = (gt_mask & (wpx > 0) & (lpx > 0)
          & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))

    # dense gaussian: value at pixel (py, px) for each object
    py = jnp.arange(H, dtype=jnp.int32)
    px = jnp.arange(W, dtype=jnp.int32)
    dx = px[None, :, None] - ix[None, None, :]            # [1, W, G]
    dy = py[:, None, None] - iy[None, None, :]            # [H, 1, G]
    diam = (2 * radius + 1).astype(jnp.float32)
    sigma = diam / 6.0
    d2 = (dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
    g = jnp.exp(-d2 / (2 * sigma[None, None, :] ** 2))
    win = (jnp.abs(dx) <= radius[None, None, :]) & \
          (jnp.abs(dy) <= radius[None, None, :])
    g = jnp.where(win & ok[None, None, :], g, 0.0)        # [H, W, G]

    heat = []
    for c in range(cfg.num_classes):
        sel = (gt_labels == c) & ok
        heat.append(jnp.max(jnp.where(sel[None, None, :], g, 0.0), axis=-1))
    heatmap = jnp.stack(heat, 0)

    zc = gt_boxes[:, 2] + gt_boxes[:, 5] / 2              # gravity center z
    dims = gt_boxes[:, 3:6]
    if cfg.norm_bbox:
        dims = jnp.log(jnp.maximum(dims, 1e-4))
    anno = jnp.concatenate([
        (cx - ix)[:, None], (cy - iy)[:, None], zc[:, None], dims,
        jnp.sin(gt_boxes[:, 6:7]), jnp.cos(gt_boxes[:, 6:7]),
        gt_boxes[:, 7:9]], axis=-1)
    anno = jnp.where(ok[:, None], anno, 0.0)
    inds = jnp.where(ok, iy * W + ix, 0)
    G_cap = min(G, cfg.max_objs)
    return CenterTargets(heatmap=heatmap, anno=anno[:G_cap],
                         inds=inds[:G_cap].astype(jnp.int32),
                         mask=ok[:G_cap], cls=gt_labels[:G_cap])


def _task_slices(cfg: CenterHeadConfig):
    out, start = [], 0
    for t in cfg.tasks:
        out.append((start, start + len(t)))
        start += len(t)
    return out


def _clip_sigmoid(x):
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def _gaussian_focal(pred, target):
    """mmdet GaussianFocalLoss (alpha=2, gamma=4), elementwise."""
    eps = 1e-12
    pos = (target == 1.0)
    pos_loss = -jnp.log(pred + eps) * (1 - pred) ** 2
    neg_loss = -jnp.log(1 - pred + eps) * pred ** 2 * (1 - target) ** 4
    return jnp.where(pos, pos_loss, neg_loss)


def center_head_loss(task_preds: List[Dict[str, jnp.ndarray]],
                     gt_boxes, gt_labels, gt_mask,
                     cfg: CenterHeadConfig, voxel: VoxelConfig) -> Dict:
    """Batched loss over all tasks."""
    H, W = task_preds[0]["heatmap"].shape[1:3]
    tg = jax.vmap(lambda b, l, m: compute_center_targets(
        b, l, m, cfg, voxel, (H, W)))(gt_boxes, gt_labels, gt_mask)

    losses = {}
    cw = jnp.asarray(cfg.code_weights)
    for ti, ((lo, hi), preds) in enumerate(zip(_task_slices(cfg),
                                               task_preds)):
        hm_pred = _clip_sigmoid(preds["heatmap"].astype(jnp.float32))
        hm_pred = jnp.moveaxis(hm_pred, -1, 1)            # [B, C, H, W]
        hm_tgt = tg.heatmap[:, lo:hi]
        num_pos = jnp.maximum(jnp.sum(hm_tgt == 1.0), 1.0)
        losses[f"task{ti}.loss_heatmap"] = jnp.sum(
            _gaussian_focal(hm_pred, hm_tgt)) / num_pos

        anno_pred = jnp.concatenate(
            [preds[k].astype(jnp.float32)
             for k in ("reg", "height", "dim", "rot", "vel")], -1)
        anno_pred = anno_pred.reshape(anno_pred.shape[0], H * W, 10)
        gathered = jnp.take_along_axis(
            anno_pred, tg.inds[..., None].astype(jnp.int32), axis=1)
        in_task = (tg.cls >= lo) & (tg.cls < hi) & tg.mask
        w = in_task[..., None].astype(jnp.float32) * cw
        num = jnp.sum(in_task.astype(jnp.float32))
        l1 = jnp.abs(gathered - tg.anno) * w
        losses[f"task{ti}.loss_bbox"] = jnp.sum(l1) / (num + 1e-4) \
            * cfg.loss_bbox_weight
    return losses


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_task(p: Dict[str, jnp.ndarray], cfg: CenterHeadConfig,
                voxel: VoxelConfig):
    """One sample, one task: top-k decode pre-NMS (CenterPointBBoxCoder
    ``decode``, ``centerpoint_bbox_coders.py:116-240``).

    Returns (boxes [K, 9] bottom-z, scores [K], cls [K] task-local,
    ok [K] score+post-center-range mask)."""
    H, W = p["heatmap"].shape[0:2]
    r = voxel.point_cloud_range
    fac = cfg.out_size_factor
    vx, vy = voxel.voxel_size[0], voxel.voxel_size[1]
    pcr = jnp.asarray(cfg.post_center_range)

    hm = jax.nn.sigmoid(p["heatmap"].astype(jnp.float32))
    flat = jnp.moveaxis(hm, -1, 0).reshape(-1)        # [C*H*W]
    k = min(cfg.topk, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    cls = idx // (H * W)
    pix = idx % (H * W)
    ys = (pix // W).astype(jnp.float32)
    xs = (pix % W).astype(jnp.float32)

    def gat(name):
        t = p[name].astype(jnp.float32).reshape(H * W, -1)
        return t[pix]

    reg = gat("reg")
    x = (xs + reg[:, 0]) * fac * vx + r[0]
    y = (ys + reg[:, 1]) * fac * vy + r[1]
    zc = gat("height")[:, 0]
    dim = gat("dim")
    if cfg.norm_bbox:
        dim = jnp.exp(dim)
    rot = gat("rot")
    yaw = jnp.arctan2(rot[:, 0], rot[:, 1])
    vel = gat("vel")
    z = zc - dim[:, 2] / 2
    boxes = jnp.stack([x, y, z, dim[:, 0], dim[:, 1], dim[:, 2],
                       yaw, vel[:, 0], vel[:, 1]], -1)
    ok = scores > cfg.score_threshold
    ctr = jnp.stack([x, y, zc], -1)
    ok &= jnp.all((ctr >= pcr[:3]) & (ctr <= pcr[3:]), -1)
    return boxes, scores, cls.astype(jnp.int32), ok


def center_head_decode(task_preds: List[Dict[str, jnp.ndarray]],
                       cfg: CenterHeadConfig,
                       voxel: VoxelConfig) -> Detections:
    """Batched decode -> fixed-size Detections (like the anchor head)."""
    if isinstance(cfg.nms_thr, (tuple, list)) and \
            len(cfg.nms_thr) != len(cfg.tasks):
        raise ValueError(
            f"per-task nms_thr needs one threshold per task: got "
            f"{len(cfg.nms_thr)} thresholds for {len(cfg.tasks)} tasks")

    def one(preds_flat):
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for ti, (lo, hi) in enumerate(_task_slices(cfg)):
            boxes, scores, cls, ok = decode_task(preds_flat[ti], cfg, voxel)
            bev5 = boxes[:, [0, 1, 3, 4, 6]]
            # per-task thresholds = the waymo variant's ``use_mul_nms``
            # (reference ``centerpoint_head_waymo.py``, its only
            # functional delta vs the base head)
            thr = (cfg.nms_thr[ti] if isinstance(cfg.nms_thr, (tuple, list))
                   else cfg.nms_thr)
            keep = nms_bev(bev5, scores, ok, thr, cfg.post_max_size)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, scores, -1.0))
            all_labels.append(cls + lo)
            all_valid.append(keep)

        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        labels = jnp.concatenate(all_labels)
        valid = jnp.concatenate(all_valid)
        k = cfg.topk
        sc, idx = jax.lax.top_k(scores, k)
        return Detections(boxes=boxes[idx], scores=sc, labels=labels[idx],
                          valid=valid[idx] & (sc > 0))

    B = task_preds[0]["heatmap"].shape[0]
    outs = [one([jax.tree_util.tree_map(lambda t: t[b], tp)
                 for tp in task_preds]) for b in range(B)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
