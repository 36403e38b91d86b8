"""KITTI 3D detection metrics (AP_R40 for bbox-less LiDAR evaluation).

Numpy rebuild of the metric core of ``kitti_eval``
(``/root/reference/mmdet3d/core/evaluation/kitti_utils/eval.py``, itself a
port of the official KITTI C++ devkit):

* per-class, per-difficulty AP with the official difficulty gates
  (easy/moderate/hard via 2D box height, occlusion, truncation);
* matching by BEV or 3D rotated IoU at the official thresholds
  (0.7 car, 0.5 pedestrian/cyclist), greedy over score order;
* AP_R40: mean over the 40 recall sample points r = 1/40..1 of the
  interpolated precision ``max_{rec >= r} prec(rec)``.

Deviation from the C++ devkit (documented): the devkit evaluates
precision at 41 sampled score thresholds derived from the GT count; this
implementation evaluates the exact precision envelope at every rank and
samples the same 40 recall positions — equal up to the devkit's score
discretization.  "DontCare"/ignored-GT handling follows the devkit:
ignored GTs (wrong difficulty but right class) neither count as GT nor
penalize matched predictions.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

CLASSES = ("Car", "Pedestrian", "Cyclist")
IOU_THRESHOLDS = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
# official difficulty gates: max truncation, max occlusion, min 2D height
DIFFICULTY = (
    (0.15, 0, 40.0),     # easy
    (0.30, 1, 25.0),     # moderate
    (0.50, 2, 25.0),     # hard
)


def _bev_iou(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Rotated BEV IoU [Na, Nb] via the JAX polygon-clipping op."""
    import jax.numpy as jnp

    from ..ops.rotated_iou import boxes_iou_bev
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    a5 = jnp.asarray(boxes_a[:, [0, 1, 3, 4, 6]], jnp.float32)
    b5 = jnp.asarray(boxes_b[:, [0, 1, 3, 4, 6]], jnp.float32)
    return np.asarray(boxes_iou_bev(a5, b5))


def _iou3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """3D IoU: BEV intersection x z-overlap / union (z is box BOTTOM)."""
    bev = _bev_iou(boxes_a, boxes_b)
    if bev.size == 0:
        return bev
    a_area = boxes_a[:, 3] * boxes_a[:, 4]
    b_area = boxes_b[:, 3] * boxes_b[:, 4]
    inter_bev = bev * (a_area[:, None] + b_area[None, :]) / (1.0 + bev)
    za0, za1 = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    zb0, zb1 = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    dz = np.clip(np.minimum(za1[:, None], zb1[None, :])
                 - np.maximum(za0[:, None], zb0[None, :]), 0, None)
    inter = inter_bev * dz
    vol_a = a_area * boxes_a[:, 5]
    vol_b = b_area * boxes_b[:, 5]
    return inter / np.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-8)


def _gt_care_masks(gt: Dict, cls: str, difficulty: int):
    """(care, ignore): GTs counted as targets vs class-matching but
    difficulty-failing (neither counted nor penalized)."""
    names = np.asarray(gt["names"])
    n = len(names)
    is_cls = names == cls
    # Van counts as ignored for Car, Person_sitting for Pedestrian (devkit)
    similar = {"Car": "Van", "Pedestrian": "Person_sitting"}.get(cls)
    is_similar = names == similar if similar else np.zeros(n, bool)
    trunc = np.asarray(gt.get("truncated", np.zeros(n)))
    occ = np.asarray(gt.get("occluded", np.zeros(n, np.int64)))
    hmin = np.asarray(gt.get("bbox_height", np.full(n, np.inf)))
    max_tr, max_occ, min_h = DIFFICULTY[difficulty]
    passes = (trunc <= max_tr) & (occ <= max_occ) & (hmin >= min_h)
    care = is_cls & passes
    ignore = (is_cls & ~passes) | is_similar
    return care, ignore


def ap_r40(scores: np.ndarray, is_tp: np.ndarray, n_gt: int) -> float:
    """AP over 40 recall samples of the interpolated precision."""
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = np.cumsum(is_tp[order])
    fp = np.cumsum(~is_tp[order])
    prec = tp / np.maximum(tp + fp, 1)
    rec = tp / n_gt
    # precision envelope: max precision at recall >= r
    env = np.maximum.accumulate(prec[::-1])[::-1]
    rs = np.arange(1, 41) / 40.0
    idx = np.searchsorted(rec, rs, side="left")
    vals = np.where(idx < len(rec), env[np.minimum(idx, len(rec) - 1)], 0.0)
    return float(vals.mean())


def evaluate_kitti(predictions: List[Dict], ground_truths: List[Dict],
                   classes: Sequence[str] = CLASSES,
                   metric: str = "3d") -> Dict[str, float]:
    """KITTI AP_R40 per class x difficulty.

    predictions[i]: {'boxes' [N, 7] lidar (x y z_bottom dx dy dz yaw),
                     'scores' [N], 'names' [N] str}
    ground_truths[i]: {'boxes' [M, 7], 'names' [M] str, and optionally
                      'truncated', 'occluded', 'bbox_height'}
    metric: 'bev' or '3d'.
    """
    iou_fn = _iou3d if metric == "3d" else _bev_iou
    out = {}
    for cls in classes:
        thr = IOU_THRESHOLDS.get(cls, 0.5)
        for d, dname in enumerate(("easy", "moderate", "hard")):
            all_scores, all_tp = [], []
            n_gt = 0
            for pred, gt in zip(predictions, ground_truths):
                care, ignore = _gt_care_masks(gt, cls, d)
                n_gt += int(care.sum())
                pm = np.asarray(pred["names"]) == cls
                pb = np.asarray(pred["boxes"])[pm]
                sc = np.asarray(pred["scores"])[pm]
                gb = np.asarray(gt["boxes"])
                iou = iou_fn(pb, gb) if len(pb) and len(gb) else \
                    np.zeros((len(pb), len(gb)))
                taken = np.zeros(len(gb), bool)
                for i in np.argsort(-sc):
                    cand = iou[i] * (~taken)
                    # care GTs take priority: an ignored GT with higher IoU
                    # must not steal a prediction that also clears a care GT
                    # (devkit matches against counted GTs first)
                    cc = np.where(care, cand, 0.0)
                    j = int(np.argmax(cc)) if len(gb) else -1
                    if j >= 0 and cc[j] >= thr:
                        taken[j] = True
                        all_scores.append(sc[i])
                        all_tp.append(True)
                        continue
                    ic = np.where(ignore, cand, 0.0)
                    j = int(np.argmax(ic)) if len(gb) else -1
                    if j >= 0 and ic[j] >= thr:
                        taken[j] = True   # ignored GT match: drop silently
                    else:
                        all_scores.append(sc[i])
                        all_tp.append(False)
            out[f"AP_{metric}_{cls}_{dname}"] = ap_r40(
                np.asarray(all_scores), np.asarray(all_tp), n_gt)
    keys = [k for k in out if "_moderate" in k]
    out[f"mAP_{metric}_moderate"] = float(np.mean([out[k] for k in keys]))
    return out
