"""Waymo AP/APH metric protocol: analytic fixtures."""
import numpy as np

from geomae_tpu.eval.waymo_eval import evaluate_waymo


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.6)):
    return [x, y, 0.0, dims[0], dims[1], dims[2], yaw]


def _frame(boxes, names, scores=None, num_points=None):
    d = dict(boxes=np.asarray(boxes, np.float32),
             names=np.asarray(names))
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if num_points is not None:
        d["num_points"] = np.asarray(num_points)
    return d


def test_perfect_predictions_ap_one():
    gt = _frame([_box(0, 0), _box(10, 0)], ["Vehicle"] * 2,
                num_points=[10, 10])
    pred = _frame([_box(0, 0), _box(10, 0)], ["Vehicle"] * 2, [0.9, 0.8])
    m = evaluate_waymo([pred], [gt])
    assert m["AP_Vehicle_L1"] == 1.0
    assert m["APH_Vehicle_L1"] == 1.0
    assert m["AP_Vehicle_L2"] == 1.0


def test_aph_heading_error_weights():
    """A TP with heading off by pi/2 contributes weight 0.5 to APH."""
    gt = _frame([_box(0, 0, 0.0)], ["Vehicle"], num_points=[10])
    pred = _frame([[0, 0, 0.0, 4, 2, 1.6, np.pi / 2]], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    # the rotated box still overlaps itself enough only if square-ish;
    # with 4x2 at pi/2 the IoU is 1/3 < 0.7 -> use a square box instead
    gt = _frame([_box(0, 0, 0.0, dims=(2, 2, 2))], ["Vehicle"],
                num_points=[10])
    pred = _frame([[0, 0, 0.0, 2, 2, 2, np.pi / 2]], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    assert m["AP_Vehicle_L1"] == 1.0
    # heading weight h = 1 - (pi/2)/pi = 0.5 enters BOTH precision and
    # recall numerators (official protocol), so the single PR point is
    # (r=0.5, p=0.5) and the envelope area is 0.25
    np.testing.assert_allclose(m["APH_Vehicle_L1"], 0.25, atol=1e-6)
    # pi heading flip wraps to 0 -> full credit... no: wrap(|pi|) = pi
    pred = _frame([[0, 0, 0.0, 2, 2, 2, np.pi]], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    np.testing.assert_allclose(m["APH_Vehicle_L1"], 0.0, atol=1e-6)
    # 2*pi wraps back to 0
    pred = _frame([[0, 0, 0.0, 2, 2, 2, 2 * np.pi]], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    np.testing.assert_allclose(m["APH_Vehicle_L1"], 1.0, atol=1e-6)


def test_half_recall():
    """2 GTs, 1 found + 1 FP elsewhere: AP = envelope area = 0.5."""
    gt = _frame([_box(0, 0), _box(20, 0)], ["Vehicle"] * 2,
                num_points=[10, 10])
    pred = _frame([_box(0, 0), _box(40, 0)], ["Vehicle"] * 2, [0.9, 0.8])
    m = evaluate_waymo([pred], [gt])
    np.testing.assert_allclose(m["AP_Vehicle_L1"], 0.5, atol=1e-6)


def test_level_filtering():
    """A 2-point GT counts only in LEVEL_2; matching it never penalizes
    the L1 breakdown."""
    gt = _frame([_box(0, 0), _box(20, 0)], ["Vehicle"] * 2,
                num_points=[10, 2])
    pred = _frame([_box(0, 0), _box(20, 0)], ["Vehicle"] * 2, [0.9, 0.8])
    m = evaluate_waymo([pred], [gt])
    assert m["AP_Vehicle_L1"] == 1.0          # L2-only GT match dropped
    assert m["AP_Vehicle_L2"] == 1.0
    # zero-point GT is outside L2 as well
    gt = _frame([_box(0, 0), _box(20, 0)], ["Vehicle"] * 2,
                num_points=[10, 0])
    pred = _frame([_box(0, 0)], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    assert m["AP_Vehicle_L2"] == 1.0


def test_score_ordering_pr_curve():
    """FP above a TP in score order caps precision below 1."""
    gt = _frame([_box(0, 0)], ["Vehicle"], num_points=[10])
    pred = _frame([_box(40, 0), _box(0, 0)], ["Vehicle"] * 2, [0.9, 0.8])
    m = evaluate_waymo([pred], [gt])
    # PR points: (r=0, p=0) then (r=1, p=0.5) -> area = 0.5
    np.testing.assert_allclose(m["AP_Vehicle_L1"], 0.5, atol=1e-6)


def test_cross_class_no_match():
    gt = _frame([_box(0, 0)], ["Pedestrian"], num_points=[10])
    pred = _frame([_box(0, 0)], ["Vehicle"], [0.9])
    m = evaluate_waymo([pred], [gt])
    assert m["AP_Vehicle_L1"] == 0.0
    assert m["AP_Pedestrian_L1"] == 0.0
    assert m["mAP_L1"] == 0.0
