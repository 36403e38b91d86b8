"""Golden parity of anchor target assignment vs EXECUTABLE reference code.

VERDICT.md round-2 item 7: executes ``anchor_target_single_assigner`` +
``get_direction_target`` (``/root/reference/mmdet3d/models/dense_heads/
train_mixins.py:237-346``), ``nearest_bev`` (``core/bbox/structures/
lidar_box3d.py:96-113``), ``limit_period`` and the reference box-coder
``encode`` on random anchor/GT sets and diffs labels, bbox/dir targets and
weights against ``models/anchor_head.assign_targets``.

Two shims stand in for *external mmdet* code (not in the reference tree),
each a transcription of the documented mmdet v2.20 semantics:
``bbox_overlaps`` (axis-aligned 2D IoU) and ``MaxIoUAssigner.
assign_wrt_overlaps`` (scalar neg interval, pos >= thr to argmax gt,
per-gt best with gt_max_assign_all=True, later gt wins) +
``PseudoSampler``.  Everything else is reference source.
"""
from __future__ import annotations

import os
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import _extract_functions  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


def _bbox_overlaps(b1, b2):
    """mmdet v2.20 axis-aligned IoU of xyxy boxes, eps 1e-6."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    overlap = wh[..., 0] * wh[..., 1]
    union = (area1[:, None] + area2[None, :] - overlap).clamp(min=1e-6)
    return overlap / union


class _MaxIoUAssigner:
    """mmdet MaxIoUAssigner semantics (scalar thresholds,
    gt_max_assign_all=True) over a provided iou function."""

    def __init__(self, iou_fn, pos=0.6, neg=0.3, min_pos=0.3):
        self.iou_fn = iou_fn
        self.pos, self.neg, self.min_pos = pos, neg, min_pos

    def assign(self, anchors, gt, gt_ignore, gt_labels):
        overlaps = self.iou_fn(gt, anchors)           # [G, N]
        N = anchors.shape[0]
        assigned = overlaps.new_full((N,), -1, dtype=torch.long)
        max_overlaps, argmax = overlaps.max(dim=0)
        gt_max, _ = overlaps.max(dim=1)
        assigned[(max_overlaps >= 0) & (max_overlaps < self.neg)] = 0
        pos = max_overlaps >= self.pos
        assigned[pos] = argmax[pos] + 1
        for i in range(overlaps.shape[0]):
            if gt_max[i] >= self.min_pos:
                assigned[overlaps[i] == gt_max[i]] = i + 1
        return types.SimpleNamespace(gt_inds=assigned,
                                     max_overlaps=max_overlaps,
                                     labels=None)


class _PseudoSampler:
    def sample(self, assign_result, anchors, gt):
        ai = assign_result.gt_inds
        pos_inds = torch.nonzero(ai > 0, as_tuple=False).squeeze(-1).unique()
        neg_inds = torch.nonzero(ai == 0, as_tuple=False).squeeze(-1).unique()
        return types.SimpleNamespace(
            pos_inds=pos_inds, neg_inds=neg_inds,
            pos_bboxes=anchors[pos_inds],
            pos_gt_bboxes=gt[ai[pos_inds] - 1],
            pos_assigned_gt_inds=ai[pos_inds] - 1)


def _reference_targets(anchors_np, gt_np, labels_np, cfg):
    ns_lim = _extract_functions(
        f"{REF}/mmdet3d/core/bbox/structures/utils.py", ["limit_period"])
    limit_period = ns_lim["limit_period"]
    ns = _extract_functions(
        f"{REF}/mmdet3d/models/dense_heads/train_mixins.py",
        ["anchor_target_single_assigner", "get_direction_target"],
        extra_globals={"limit_period": limit_period})
    ns_bev = _extract_functions(
        f"{REF}/mmdet3d/core/bbox/structures/lidar_box3d.py",
        ["nearest_bev"], extra_globals={"limit_period": limit_period})
    ns_coder = _extract_functions(
        f"{REF}/mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py",
        ["encode"])

    def nearest_bev(t):
        shim = types.SimpleNamespace(bev=t[:, [0, 1, 3, 4, 6]])
        return ns_bev["nearest_bev"](shim)

    def iou_fn(gt, anchors):
        return _bbox_overlaps(nearest_bev(gt), nearest_bev(anchors))

    shim = types.SimpleNamespace(
        bbox_assigner=_MaxIoUAssigner(iou_fn, cfg.pos_iou_thr,
                                      cfg.neg_iou_thr, cfg.min_pos_iou),
        bbox_sampler=_PseudoSampler(),
        bbox_coder=types.SimpleNamespace(encode=ns_coder["encode"]),
        dir_offset=cfg.dir_offset,
        train_cfg=types.SimpleNamespace(pos_weight=-1),
    )
    # get_direction_target is called as a free function inside the method
    ns["anchor_target_single_assigner"].__globals__[
        "get_direction_target"] = ns["get_direction_target"]
    return ns["anchor_target_single_assigner"](
        shim, shim.bbox_assigner, torch.from_numpy(anchors_np),
        torch.from_numpy(gt_np), None, torch.from_numpy(labels_np), {},
        num_classes=cfg.num_classes, sampling=False)


def test_assignment_matches_reference(rng):
    from geomae_tpu.config import AnchorHeadConfig
    from geomae_tpu.models.anchor_head import assign_targets
    from geomae_tpu.models.anchors import grid_anchors

    cfg = AnchorHeadConfig()
    anchors = np.asarray(grid_anchors(cfg, (20, 20)),
                         np.float32).reshape(-1, 9)
    N = anchors.shape[0]

    # GTs: perturbed copies of random anchors (guarantees pos matches) +
    # a few far-off boxes (pure negatives / per-gt-best cases)
    G = 24
    base = anchors[rng.choice(N, G - 4, replace=False)].copy()
    base[:, :2] += rng.normal(0, 0.4, (G - 4, 2))
    base[:, 3:6] *= rng.uniform(0.85, 1.15, (G - 4, 3))
    base[:, 6] += rng.normal(0, 0.2, G - 4)
    far = np.concatenate([
        rng.uniform(-49, 49, (4, 2)), rng.uniform(-2, 0, (4, 1)),
        rng.uniform(0.3, 0.6, (4, 3)), rng.uniform(-3, 3, (4, 1)),
        np.zeros((4, 2))], -1)
    gt = np.concatenate([base, far], 0).astype(np.float32)
    labels = rng.integers(0, cfg.num_classes, G).astype(np.int64)

    (r_labels, r_lw, r_bt, r_bw, r_dt, r_dw, r_pos, r_neg) = \
        _reference_targets(anchors, gt, labels, cfg)

    ours = assign_targets(jnp.asarray(anchors), jnp.asarray(gt),
                          jnp.asarray(labels.astype(np.int32)),
                          jnp.ones(G, bool), cfg)

    pos_ref = np.zeros(N, bool)
    pos_ref[r_pos.numpy()] = True
    pos_ours = np.asarray(ours.bbox_weights) > 0
    np.testing.assert_array_equal(pos_ours, pos_ref)
    assert pos_ref.sum() > 10            # the test has teeth

    neg_ref = np.zeros(N, bool)
    neg_ref[r_neg.numpy()] = True
    np.testing.assert_array_equal(
        np.asarray(ours.label_weights) > 0, pos_ref | neg_ref)

    np.testing.assert_array_equal(np.asarray(ours.labels)[pos_ref],
                                  r_labels.numpy()[pos_ref])
    np.testing.assert_allclose(np.asarray(ours.bbox_targets)[pos_ref],
                               r_bt.numpy()[pos_ref], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ours.dir_targets)[pos_ref],
                                  r_dt.numpy()[pos_ref])
    assert int(ours.num_pos) == len(r_pos)
