"""TTA merge: mapping-back round trips and multi-view NMS merging."""
import numpy as np
import pytest

from geomae_tpu.core.aug_merge import bbox3d_mapping_back, merge_aug_bboxes_3d


def _apply_aug(boxes, scale, fh, fv):
    """Forward augmentation on GT boxes (inverse of mapping_back)."""
    b = np.array(boxes, np.float32, copy=True)
    b[:, :6] *= scale
    if b.shape[-1] > 7:
        b[:, 7:9] *= scale
    if fv:
        b[:, 0] = -b[:, 0]
        if b.shape[-1] > 7:
            b[:, 7] = -b[:, 7]
        b[:, 6] = -b[:, 6]
    if fh:
        b[:, 1] = -b[:, 1]
        if b.shape[-1] > 7:
            b[:, 8] = -b[:, 8]
        b[:, 6] = -b[:, 6] + np.pi
    return b


@pytest.mark.parametrize("fh,fv,scale", [(False, False, 1.0),
                                         (True, False, 0.95),
                                         (False, True, 1.05),
                                         (True, True, 1.0)])
def test_mapping_back_roundtrip(rng, fh, fv, scale):
    boxes = np.concatenate([
        rng.uniform(-40, 40, (20, 2)), rng.uniform(-2, 0, (20, 1)),
        rng.uniform(1, 5, (20, 3)), rng.uniform(-np.pi, np.pi, (20, 1)),
        rng.normal(0, 2, (20, 2))], -1).astype(np.float32)
    aug = _apply_aug(boxes, scale, fh, fv)
    rec = bbox3d_mapping_back(aug, scale, fh, fv)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(rec[:, 7:9], boxes[:, 7:9], rtol=1e-5,
                               atol=1e-5)
    # yaw equal modulo 2pi
    dy = np.mod(rec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dy, 0, atol=1e-5)


def test_merge_collapses_duplicate_views(rng):
    """The same object seen from an identity view and an h-flipped view
    merges into one detection; a distinct object in one view survives."""
    obj = np.array([[5.0, 3.0, -1.0, 4.0, 2.0, 1.5, 0.4, 0.0, 0.0]],
                   np.float32)
    other = np.array([[-20.0, -10.0, -1.0, 4.0, 2.0, 1.5, 1.0, 0.0, 0.0]],
                     np.float32)
    view0 = dict(boxes=np.concatenate([obj, other]),
                 scores=np.array([0.9, 0.7], np.float32),
                 labels=np.array([0, 1], np.int64))
    view1 = dict(boxes=_apply_aug(obj, 1.0, True, False),
                 scores=np.array([0.8], np.float32),
                 labels=np.array([0], np.int64))
    merged = merge_aug_bboxes_3d(
        [view0, view1],
        [dict(pcd_scale_factor=1.0, pcd_horizontal_flip=False,
              pcd_vertical_flip=False),
         dict(pcd_scale_factor=1.0, pcd_horizontal_flip=True,
              pcd_vertical_flip=False)],
        nms_thr=0.2, max_num=10)
    assert len(merged["scores"]) == 2          # duplicate suppressed
    assert set(merged["labels"].tolist()) == {0, 1}
    top = merged["boxes"][np.argmax(merged["scores"])]
    np.testing.assert_allclose(top[:6], obj[0, :6], atol=1e-4)


def test_merge_max_num_and_empty(rng):
    empty = merge_aug_bboxes_3d(
        [dict(boxes=np.zeros((0, 9), np.float32),
              scores=np.zeros((0,), np.float32),
              labels=np.zeros((0,), np.int64))],
        [dict()], nms_thr=0.2, max_num=5)
    assert len(empty["scores"]) == 0
    boxes = np.concatenate([
        rng.uniform(-40, 40, (30, 2)), rng.uniform(-2, 0, (30, 1)),
        rng.uniform(1, 5, (30, 3)), rng.uniform(-np.pi, np.pi, (30, 1)),
        np.zeros((30, 2))], -1).astype(np.float32)
    res = dict(boxes=boxes, scores=rng.uniform(0, 1, 30).astype(np.float32),
               labels=rng.integers(0, 3, 30).astype(np.int64))
    merged = merge_aug_bboxes_3d([res], [dict()], nms_thr=0.99, max_num=7)
    assert len(merged["scores"]) == 7
    assert (np.diff(merged["scores"]) <= 1e-7).all()
