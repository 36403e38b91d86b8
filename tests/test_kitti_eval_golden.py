"""Golden KITTI-eval parity vs the EXECUTED reference protocol.

The reference's ``kitti_utils/eval.py`` + ``rotate_iou.py`` are pure
python + numba (the numba/cuda decorators wrap plain-python bodies).  We
AST-extract the exact functions — ``get_thresholds``, ``clean_data``,
``compute_statistics_jit``, ``d3_box_overlap_kernel`` and the full rotated
-intersection geometry chain — execute them with a pass-through numba/cuda
shim, drive them through ``eval_class``'s per-class/difficulty loop
(reference ``eval.py:450-576``), and diff
:func:`geomae_tpu.eval.kitti_eval.evaluate_kitti_ap11` against the result
on randomized scenes (difficulty gates, Van/DontCare ignores, low-height
detections, duplicate + far false positives).

Frame conversion for the reference (which evaluates in CAMERA coords,
``eval.py:343``): location = (-y, -z_bottom, x), dims (l, h, w) =
(dx, dz, dy), ry = -yaw - pi/2 — a pure rotation of the BEV plane
(verified against ``rbbox_to_corners``'s clockwise convention), so IoUs
are frame-invariant.
"""
import ast
import math
import types

import numpy as np
import pytest

from geomae_tpu.eval.kitti_eval import evaluate_kitti_ap11

REF_EVAL = "/root/reference/mmdet3d/core/evaluation/kitti_utils/eval.py"
REF_RIOU = "/root/reference/mmdet3d/core/evaluation/kitti_utils/rotate_iou.py"

import os

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_EVAL), reason="reference checkout not mounted")


def _fake_numba_ns():
    def jit(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    numba = types.SimpleNamespace(jit=jit, prange=range,
                                  float32=np.float32, int32=np.int32)
    cuda = types.SimpleNamespace(
        jit=jit,
        local=types.SimpleNamespace(
            array=lambda shape, dtype=np.float32: np.zeros(shape, dtype)))
    return dict(numba=numba, cuda=cuda, np=np, math=math)


def _extract(path, names, extra=None):
    with open(path) as f:
        tree = ast.parse(f.read())
    ns = _fake_numba_ns()
    if extra:
        ns.update(extra)
    found = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in names:
            node.decorator_list = []
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(ast.fix_missing_locations(mod), path, "exec"), ns)
            found.add(node.name)
    assert found == set(names), set(names) - found
    return ns


@pytest.fixture(scope="module")
def ref():
    """Executable reference namespace: geometry + protocol functions."""
    geo = _extract(REF_RIOU, [
        "trangle_area", "area", "sort_vertex_in_convex_polygon",
        "line_segment_intersection", "point_in_quadrilateral",
        "quadrilateral_intersection", "rbbox_to_corners", "inter",
        "devRotateIoUEval"])

    def rotate_iou_gpu_eval(boxes, query_boxes, criterion=-1, device_id=0):
        boxes = np.asarray(boxes, np.float64)
        query_boxes = np.asarray(query_boxes, np.float64)
        out = np.zeros((len(boxes), len(query_boxes)))
        for i in range(len(boxes)):
            for j in range(len(query_boxes)):
                out[i, j] = geo["devRotateIoUEval"](boxes[i], query_boxes[j],
                                                    criterion)
        return out

    ns = _extract(REF_EVAL, [
        "get_thresholds", "clean_data", "image_box_overlap",
        "d3_box_overlap_kernel", "compute_statistics_jit"],
        extra={"rotate_iou_gpu_eval": rotate_iou_gpu_eval})

    def d3_box_overlap(boxes, qboxes, criterion=-1):
        # reference d3_box_overlap (eval.py:153-159) inlined: the original
        # body does a package-relative import of rotate_iou
        rinc = rotate_iou_gpu_eval(boxes[:, [0, 2, 3, 5, 6]],
                                   qboxes[:, [0, 2, 3, 5, 6]], 2)
        ns["d3_box_overlap_kernel"](boxes, qboxes, rinc, criterion)
        return rinc

    def bev_box_overlap(boxes, qboxes, criterion=-1):
        return rotate_iou_gpu_eval(boxes, qboxes, criterion)

    ns["d3_box_overlap"] = d3_box_overlap
    ns["bev_box_overlap"] = bev_box_overlap
    return ns


def _to_camera_anno(frame, with_score):
    """Our LiDAR frame dict -> reference camera-frame anno dict."""
    b = np.asarray(frame["boxes"], np.float64).reshape(-1, 7)
    n = len(b)
    loc = np.stack([-b[:, 1], -b[:, 2], b[:, 0]], -1)
    dims = np.stack([b[:, 3], b[:, 5], b[:, 4]], -1)       # (l, h, w)
    ry = -b[:, 6] - np.pi / 2
    h2d = np.asarray(frame.get("bbox_height", np.full(n, 60.0)))
    anno = dict(
        name=np.asarray(frame["names"]),
        truncated=np.asarray(frame.get("truncated", np.zeros(n)),
                             np.float64),
        occluded=np.asarray(frame.get("occluded", np.zeros(n, np.int64))),
        alpha=np.full(n, -10.0),
        bbox=np.stack([np.zeros(n), np.zeros(n), np.full(n, 10.0), h2d],
                      -1),
        dimensions=dims,
        location=loc,
        rotation_y=ry,
    )
    if with_score:
        anno["score"] = np.asarray(frame["scores"], np.float64)
    return anno


def _ref_ap11(ref, gt_frames, dt_frames, cls_name, cls_idx, metric,
              min_overlap, difficulty):
    """Drive the extracted primitives through eval_class's loop
    (``eval.py:450-576``) for one class/difficulty; returns AP11 in
    [0, 100] like ``get_mAP``."""
    gt_annos = [_to_camera_anno(f, False) for f in gt_frames]
    dt_annos = [_to_camera_anno(f, True) for f in dt_frames]

    def cam_boxes(a):
        return np.concatenate(
            [a["location"], a["dimensions"],
             a["rotation_y"][:, None]], 1)

    overlaps = []
    for g, d in zip(gt_annos, dt_annos):
        if metric == 2:
            ov = ref["d3_box_overlap"](cam_boxes(d), cam_boxes(g))
        else:
            db = np.concatenate([d["location"][:, [0, 2]],
                                 d["dimensions"][:, [0, 2]],
                                 d["rotation_y"][:, None]], 1)
            gb = np.concatenate([g["location"][:, [0, 2]],
                                 g["dimensions"][:, [0, 2]],
                                 g["rotation_y"][:, None]], 1)
            ov = ref["bev_box_overlap"](db, gb)
        overlaps.append(ov)

    cleaned, total_valid_gt, thresholdss = [], 0, []
    datas = []
    for g, d in zip(gt_annos, dt_annos):
        num_valid, ig_gt, ig_dt, dc = ref["clean_data"](g, d, cls_idx,
                                                        difficulty)
        total_valid_gt += num_valid
        cleaned.append((np.array(ig_gt, np.int64), np.array(ig_dt, np.int64),
                        np.zeros((0, 4)) if not dc else np.stack(dc)))
        gt_datas = np.concatenate([g["bbox"], g["alpha"][:, None]], 1)
        dt_datas = np.concatenate(
            [d["bbox"], d["alpha"][:, None], d["score"][:, None]], 1)
        datas.append((gt_datas, dt_datas))
    for ov, (ig_gt, ig_dt, dc), (gd, dd) in zip(overlaps, cleaned, datas):
        *_, th = ref["compute_statistics_jit"](
            ov, gd, dd, ig_gt, ig_dt, dc, metric, min_overlap=min_overlap,
            thresh=0.0, compute_fp=False)
        thresholdss += list(th)
    thresholds = ref["get_thresholds"](np.array(thresholdss),
                                       max(total_valid_gt, 1))
    prec = np.zeros(41)
    for t, thr in enumerate(thresholds):
        tp = fp = 0
        for ov, (ig_gt, ig_dt, dc), (gd, dd) in zip(overlaps, cleaned,
                                                    datas):
            tpi, fpi, *_ = ref["compute_statistics_jit"](
                ov, gd, dd, ig_gt, ig_dt, dc, metric,
                min_overlap=min_overlap, thresh=thr, compute_fp=True)
            tp += tpi
            fp += fpi
        prec[t] = tp / max(tp + fp, 1)
    for i in range(41):
        prec[i] = prec[i:].max()
    return prec[0::4].sum() / 11 * 100


def _random_scenes(seed, n_frames=6):
    """Randomized scenes with controlled IoU separation from thresholds."""
    rng = np.random.default_rng(seed)
    gt_frames, dt_frames = [], []
    name_pool = ["Car", "Pedestrian", "Cyclist", "Van", "DontCare",
                 "Person_sitting"]
    dims_by = {"Car": (4.5, 1.9, 1.6), "Van": (5.0, 2.0, 2.1),
               "Pedestrian": (0.8, 0.7, 1.8), "Person_sitting":
               (0.8, 0.7, 1.3), "Cyclist": (1.8, 0.6, 1.7),
               "DontCare": (2.0, 2.0, 1.5)}
    for fi in range(n_frames):
        n = int(rng.integers(4, 12))
        names, boxes, trunc, occ, h2d = [], [], [], [], []
        for _ in range(n):
            nm = name_pool[rng.integers(0, len(name_pool))]
            l, w, h = dims_by[nm]
            # keep centers >= 12 m apart so cross-object IoUs are 0
            boxes.append([rng.uniform(-40, 40) // 12 * 12 +
                          12 * len(boxes), rng.uniform(-40, 40),
                          rng.uniform(-2, 0), l, w, h,
                          rng.uniform(-np.pi, np.pi)])
            names.append(nm)
            trunc.append(float(rng.uniform(0, 0.6)))
            occ.append(int(rng.integers(0, 4)))
            h2d.append(float(rng.uniform(20, 60)))
        gt = dict(boxes=np.array(boxes, np.float64), names=np.array(names),
                  truncated=np.array(trunc), occluded=np.array(occ),
                  bbox_height=np.array(h2d))
        p_boxes, p_names, p_scores, p_h = [], [], [], []
        for b, nm in zip(boxes, names):
            r = rng.uniform()
            if r < 0.55:        # near-copy: IoU ~0.85-0.95
                bb = list(b)
                bb[0] += rng.uniform(-0.1, 0.1)
                bb[1] += rng.uniform(-0.1, 0.1)
                p_boxes.append(bb)
                p_names.append(nm if nm not in ("DontCare",) else "Car")
                p_scores.append(float(rng.uniform(0.3, 1.0)))
                p_h.append(float(rng.uniform(20, 60)))
                if rng.uniform() < 0.25:   # duplicate on the same GT
                    bb2 = list(b)
                    bb2[0] -= rng.uniform(-0.08, 0.08)
                    p_boxes.append(bb2)
                    p_names.append(p_names[-1])
                    p_scores.append(float(rng.uniform(0.3, 1.0)))
                    p_h.append(float(rng.uniform(20, 60)))
            elif r < 0.7:       # distant shift: IoU ~0.1-0.3
                bb = list(b)
                bb[0] += b[3] * 0.9
                p_boxes.append(bb)
                p_names.append(nm if nm != "DontCare" else "Car")
                p_scores.append(float(rng.uniform(0.3, 1.0)))
                p_h.append(float(rng.uniform(20, 60)))
        for _ in range(int(rng.integers(0, 4))):   # far false positives
            p_boxes.append([rng.uniform(50, 70), rng.uniform(50, 70),
                            rng.uniform(-2, 0), 4.0, 1.8, 1.5,
                            rng.uniform(-np.pi, np.pi)])
            p_names.append(["Car", "Pedestrian", "Cyclist"][
                rng.integers(0, 3)])
            p_scores.append(float(rng.uniform(0.3, 1.0)))
            p_h.append(float(rng.uniform(20, 60)))
        dt = dict(boxes=np.array(p_boxes, np.float64).reshape(-1, 7),
                  names=np.array(p_names), scores=np.array(p_scores),
                  bbox_height=np.array(p_h))
        gt_frames.append(gt)
        dt_frames.append(dt)
    return gt_frames, dt_frames


@pytest.mark.parametrize("metric,ref_metric", [("3d", 2), ("bev", 1)])
def test_ap11_matches_reference(ref, metric, ref_metric):
    gt_frames, dt_frames = _random_scenes(seed=0)
    ours = evaluate_kitti_ap11(dt_frames, gt_frames, metric=metric)
    for cls_idx, cls in enumerate(("Car", "Pedestrian", "Cyclist")):
        min_ov = {"Car": 0.7}.get(cls, 0.5)
        for d, dname in enumerate(("easy", "moderate", "hard")):
            want = _ref_ap11(ref, gt_frames, dt_frames, cls, cls_idx,
                             ref_metric, min_ov, d)
            got = ours[f"AP11_{metric}_{cls}_{dname}"] * 100
            assert got == pytest.approx(want, abs=2e-4), (
                cls, dname, got, want)


def test_d3_overlap_matches_reference_geometry(ref):
    """Our f32 rotated-IoU + z-overlap vs the extracted reference
    d3_box_overlap on random boxes (frame conversion included)."""
    from geomae_tpu.eval.kitti_eval import _iou3d
    rng = np.random.default_rng(1)
    n, m = 12, 9
    def rand_boxes(k):
        b = np.zeros((k, 7))
        b[:, 0] = rng.uniform(-20, 20, k)
        b[:, 1] = rng.uniform(-20, 20, k)
        b[:, 2] = rng.uniform(-2, 0, k)
        b[:, 3] = rng.uniform(1.5, 5.0, k)
        b[:, 4] = rng.uniform(1.0, 2.5, k)
        b[:, 5] = rng.uniform(1.0, 2.0, k)
        b[:, 6] = rng.uniform(-np.pi, np.pi, k)
        return b
    a, b = rand_boxes(n), rand_boxes(m)
    # a few overlapping pairs
    b[:4] = a[:4]
    b[:4, 0] += rng.uniform(-1, 1, 4)
    b[:4, 6] += rng.uniform(-0.3, 0.3, 4)
    fa = dict(boxes=a, names=np.array(["Car"] * n))
    fb = dict(boxes=b, names=np.array(["Car"] * m))
    ca, cb = _to_camera_anno(fa, False), _to_camera_anno(fb, False)
    def cam(a_):
        return np.concatenate([a_["location"], a_["dimensions"],
                               a_["rotation_y"][:, None]], 1)
    want = ref["d3_box_overlap"](cam(ca), cam(cb))
    got = _iou3d(a, b)
    np.testing.assert_allclose(got, want, atol=2e-5)
