"""nuScenes metric protocol sanity tests."""
import numpy as np

from geomae_tpu.eval.nuscenes_eval import (accumulate_class, evaluate,
                                           format_results_json)

CLASSES = ("car", "pedestrian")


def make_frame(boxes, scores=None, labels=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 9)
    d = {"boxes": boxes, "labels": np.asarray(labels or [0] * len(boxes))}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    return d


def test_perfect_predictions_ap1():
    gt_boxes = [[0, 0, 0, 4, 2, 1.5, 0.3, 1, 0], [10, 5, 0, 4, 2, 1.5, 0, 0, 0]]
    gts = [make_frame(gt_boxes)]
    preds = [make_frame(gt_boxes, scores=[0.9, 0.8])]
    m = evaluate(preds, gts, CLASSES)
    assert m["AP_car"] > 0.97
    assert m["mtrans_err"] < 1e-6
    assert m["NDS"] > 0.6


def test_missed_and_false_positive():
    gts = [make_frame([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]])]
    # one hit + one far FP
    preds = [make_frame([[0.2, 0, 0, 4, 2, 1.5, 0, 0, 0],
                         [30, 30, 0, 4, 2, 1.5, 0, 0, 0]],
                        scores=[0.9, 0.8])]
    acc = accumulate_class([{k: v for k, v in preds[0].items()
                             if k in ("boxes", "scores")}],
                           [{"boxes": gts[0]["boxes"]}], dist_th=2.0)
    assert 0.3 < acc["ap"] <= 1.0
    assert acc["trans_err"] < 0.25


def test_empty_predictions():
    gts = [make_frame([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]])]
    preds = [dict(boxes=np.zeros((0, 9), np.float32),
                  scores=np.zeros(0, np.float32),
                  labels=np.zeros(0, np.int32))]
    m = evaluate(preds, gts, CLASSES)
    assert m["mAP"] == 0.0


def test_results_json_schema():
    preds = [make_frame([[1, 2, 0, 4, 2, 1.5, 0.3, 1, 0]], scores=[0.5])]
    out = format_results_json(["tok0"], preds, ("car",))
    assert "results" in out and "tok0" in out["results"]
    r = out["results"]["tok0"][0]
    assert r["detection_name"] == "car"
    assert len(r["rotation"]) == 4 and len(r["size"]) == 3
    # size is wlh (y-dim first per devkit convention)
    assert r["size"] == [2.0, 4.0, 1.5]
