"""KITTI AP_R40 protocol: analytic fixtures."""
import numpy as np

from geomae_tpu.eval.kitti_eval import ap_r40, evaluate_kitti


def _frame(boxes, names, scores=None, **extra):
    d = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
         "names": np.asarray(names)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    n = len(d["names"])
    d.setdefault("truncated", extra.get("truncated", np.zeros(n)))
    d.setdefault("occluded", extra.get("occluded", np.zeros(n, np.int64)))
    d.setdefault("bbox_height", extra.get("bbox_height", np.full(n, 50.0)))
    return d


CAR = [0, 0, 0, 4.0, 2.0, 1.5, 0.0]


def box_at(x, y, yaw=0.0):
    b = list(CAR)
    b[0], b[1], b[6] = x, y, yaw
    return b


def test_perfect_predictions():
    gts = [_frame([box_at(0, 0), box_at(10, 0)], ["Car", "Car"])]
    preds = [_frame([box_at(0, 0), box_at(10, 0)], ["Car", "Car"],
                    scores=[0.9, 0.8])]
    m = evaluate_kitti(preds, gts)
    assert m["AP_3d_Car_easy"] == 1.0
    assert m["AP_3d_Car_moderate"] == 1.0


def test_ap_r40_half_recall():
    """1 TP then infinite misses: rec stops at 0.5 of 2 GT.

    prec envelope = 1.0 up to rec 0.5; recall samples 1/40..20/40 get 1.0,
    21/40..40/40 get 0 -> AP = 0.5.
    """
    scores = np.array([0.9])
    is_tp = np.array([True])
    assert abs(ap_r40(scores, is_tp, n_gt=2) - 0.5) < 1e-9


def test_fp_before_tp_envelope():
    """FP at higher score than the TP: prec = [0, 1/2]; envelope at every
    achieved recall = 1/2 -> AP = 0.5 with 1 GT."""
    scores = np.array([0.9, 0.8])
    is_tp = np.array([False, True])
    assert abs(ap_r40(scores, is_tp, n_gt=1) - 0.5) < 1e-9


def test_difficulty_gating_and_ignored():
    """A hard-only GT (small 2D height) is ignored for easy: a prediction
    matching it is neither TP nor FP; for hard it's a full TP."""
    gts = [_frame([box_at(0, 0)], ["Car"], bbox_height=[30.0])]
    preds = [_frame([box_at(0, 0)], ["Car"], scores=[0.9])]
    m = evaluate_kitti(preds, gts)
    assert m["AP_3d_Car_easy"] == 0.0      # no care GT, match ignored
    assert m["AP_3d_Car_moderate"] == 1.0  # 25px gate passes
    assert m["AP_3d_Car_hard"] == 1.0


def test_van_similar_class_not_penalized():
    gts = [_frame([box_at(0, 0), box_at(10, 0)], ["Van", "Car"])]
    preds = [_frame([box_at(0, 0), box_at(10, 0)], ["Car", "Car"],
                    scores=[0.9, 0.8])]
    m = evaluate_kitti(preds, gts)
    # the Van match is dropped silently; the Car match is 1/1 GT
    assert m["AP_3d_Car_easy"] == 1.0


def test_bev_vs_3d_z_offset():
    """A prediction floating 1m above the GT overlaps in BEV but not 3D."""
    gt_box = box_at(0, 0)
    pred_box = list(gt_box)
    pred_box[2] = 1.6          # z bottom above the GT's top (1.5)
    gts = [_frame([gt_box], ["Car"])]
    preds = [_frame([pred_box], ["Car"], scores=[0.9])]
    assert evaluate_kitti(preds, gts, metric="bev")["AP_bev_Car_easy"] == 1.0
    assert evaluate_kitti(preds, gts, metric="3d")["AP_3d_Car_easy"] == 0.0
