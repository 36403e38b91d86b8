"""Devkit-gated diff: our nuScenes metric math vs the OFFICIAL devkit.

The reference shells out to ``NuScenesEval`` (``nuscenes_dataset.py:
367-514``); the full evaluator needs a database, but its metric core —
``nuscenes.eval.detection.algo.{accumulate, calc_ap, calc_tp}`` over
``DetectionBox`` lists — is database-free.  This test feeds identical
random scenes to that core and to
:func:`geomae_tpu.eval.nuscenes_eval.accumulate_class` and requires the
AP and all five TP errors to agree to float64 round-off, per class
(incl. the barrier pi-period orientation rule) and distance threshold.

Skipped when the devkit isn't installed (it is not in this image); run
``pip install nuscenes-devkit`` wherever parity needs re-proving.
"""
import numpy as np
import pytest

nuscenes = pytest.importorskip("nuscenes")

from nuscenes.eval.common.data_classes import EvalBoxes  # noqa: E402
from nuscenes.eval.detection.algo import accumulate, calc_ap, calc_tp  # noqa: E402
from nuscenes.eval.detection.data_classes import DetectionBox  # noqa: E402
from pyquaternion import Quaternion  # noqa: E402

from geomae_tpu.eval.nuscenes_eval import (DIST_THRESHOLDS,  # noqa: E402
                                           TP_NAMES, accumulate_class)

CLASSES = ("car", "pedestrian", "barrier", "traffic_cone")
ATTRS = {"car": ("vehicle.moving", "vehicle.parked", "vehicle.stopped"),
         "pedestrian": ("pedestrian.moving", "pedestrian.standing"),
         "barrier": ("",), "traffic_cone": ("",)}


def _rand_frames(seed, n_frames=4):
    rng = np.random.default_rng(seed)
    gt_frames, dt_frames = [], []
    for _ in range(n_frames):
        n = int(rng.integers(3, 9))
        cls = rng.integers(0, len(CLASSES), n)
        boxes = np.zeros((n, 9))
        boxes[:, 0:2] = rng.uniform(-30, 30, (n, 2))
        boxes[:, 2] = rng.uniform(-2, 0, n)
        boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        boxes[:, 7:9] = rng.uniform(-3, 3, (n, 2))
        attrs = [ATTRS[CLASSES[c]][rng.integers(0, len(ATTRS[CLASSES[c]]))]
                 for c in cls]
        gt_frames.append(dict(boxes=boxes, labels=cls, attrs=attrs))
        pb, pl, ps, pa = [], [], [], []
        for b, c in zip(boxes, cls):
            if rng.uniform() < 0.7:            # noisy copy
                bb = b.copy()
                bb[:2] += rng.normal(0, 0.5, 2)
                bb[6] += rng.normal(0, 0.2)
                bb[7:9] += rng.normal(0, 0.3, 2)
                pb.append(bb)
                pl.append(c)
                ps.append(rng.uniform(0.2, 1.0))
                pa.append(ATTRS[CLASSES[c]][
                    rng.integers(0, len(ATTRS[CLASSES[c]]))])
        for _ in range(int(rng.integers(0, 3))):   # false positives
            bb = np.zeros(9)
            bb[0:2] = rng.uniform(-30, 30, 2)
            bb[3:6] = rng.uniform(0.5, 4.0, 3)
            pb.append(bb)
            pl.append(rng.integers(0, len(CLASSES)))
            ps.append(rng.uniform(0.2, 1.0))
            pa.append("")
        dt_frames.append(dict(boxes=np.array(pb).reshape(-1, 9),
                              labels=np.array(pl, int),
                              scores=np.array(ps), attrs=pa))
    return gt_frames, dt_frames


def _to_eval_boxes(frames, with_score):
    eb = EvalBoxes()
    for fi, f in enumerate(frames):
        tok = f"sample_{fi}"
        boxes = []
        for k in range(len(f["boxes"])):
            b = f["boxes"][k]
            kw = dict(
                sample_token=tok,
                translation=(float(b[0]), float(b[1]),
                             float(b[2] + b[5] / 2)),
                size=(float(b[4]), float(b[3]), float(b[5])),   # wlh
                rotation=tuple(Quaternion(axis=(0, 0, 1),
                                          angle=float(b[6])).elements),
                velocity=(float(b[7]), float(b[8])),
                detection_name=CLASSES[int(f["labels"][k])],
                attribute_name=f["attrs"][k],
            )
            if with_score:
                kw["detection_score"] = float(f["scores"][k])
            boxes.append(DetectionBox(**kw))
        eb.add_boxes(tok, boxes)
    return eb


@pytest.mark.parametrize("dist_th", DIST_THRESHOLDS)
def test_accumulate_matches_devkit(dist_th):
    gt_frames, dt_frames = _rand_frames(seed=3)
    gt_eval = _to_eval_boxes(gt_frames, False)
    dt_eval = _to_eval_boxes(dt_frames, True)
    from nuscenes.eval.common.utils import center_distance
    for ci, cname in enumerate(CLASSES):
        md = accumulate(gt_eval, dt_eval, cname, center_distance, dist_th)
        ap_ref = calc_ap(md, 0.1, 0.1)

        def _filt(f, is_pred):
            m = f["labels"] == ci
            out = {"boxes": f["boxes"][m]}
            if is_pred:
                out["scores"] = f["scores"][m]
                out["attrs"] = [f["attrs"][i] for i in np.flatnonzero(m)]
            else:
                out["attrs"] = [f["attrs"][i] for i in np.flatnonzero(m)]
            return out

        preds = [_filt(f, True) for f in dt_frames]
        gts = [_filt(f, False) for f in gt_frames]
        period = np.pi if cname == "barrier" else 2 * np.pi
        acc = accumulate_class(preds, gts, dist_th, period=period)
        if acc is None:
            assert ap_ref == 0.0
            continue
        assert acc["ap"] == pytest.approx(ap_ref, abs=1e-9), cname
        for name, dk_name in zip(
                TP_NAMES, ("trans_err", "scale_err", "orient_err",
                           "vel_err", "attr_err")):
            ref = calc_tp(md, 0.1, dk_name)
            assert acc[name] == pytest.approx(ref, abs=1e-9), (cname, name)
