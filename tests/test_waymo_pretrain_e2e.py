"""Waymo pretrain slice end-to-end (VERDICT r1 #10 / BASELINE config 5):
synthetic Waymo-schema infos (6-channel bins, ego poses, sweeps) through
``tools/train.py pretrain --preset waymo`` on the 8-device CPU mesh."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_waymo_tree(root, n_frames=16, n_pts=3000):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    infos = []
    poses = {}
    for i in range(n_frames + 3):
        # slowly-moving ego: sweeps need real pose compensation
        t = np.array([0.5 * i, 0.1 * i, 0.0])
        th = 0.02 * i
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        poses[i] = pose
        pts = np.zeros((n_pts, 6), np.float32)
        pts[:, 0] = rng.uniform(-10, 10, n_pts)
        pts[:, 1] = rng.uniform(-10, 10, n_pts)
        pts[:, 2] = rng.uniform(-1.5, 2.0, n_pts)
        pts[:, 3] = rng.uniform(0, 1, n_pts)        # intensity
        pts[:, 4] = rng.uniform(0, 1, n_pts)        # elongation
        pts.tofile(os.path.join(root, "velodyne", f"{i:03d}.bin"))
    for i in range(3, n_frames + 3):
        sweeps = [dict(velodyne_path=f"velodyne/{i - 1 - j:03d}.bin",
                       pose=poses[i - 1 - j],
                       timestamp=(i - 1 - j) * 1e5) for j in range(3)]
        infos.append(dict(
            point_cloud=dict(velodyne_path=f"velodyne/{i:03d}.bin"),
            pose=poses[i], timestamp=i * 1e5, sweeps=sweeps))
    with open(os.path.join(root, "waymo_infos_train.pkl"), "wb") as f:
        pickle.dump(infos, f)


@pytest.mark.slow
def test_waymo_pretrain_e2e_on_mesh(tmp_path):
    root = str(tmp_path / "waymo")
    _make_waymo_tree(root)
    work = str(tmp_path / "run")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "pretrain", "--preset", "waymo", "--tiny", "--platform", "cpu",
         "--data-root", root, "--ann-file", "waymo_infos_train.pkl",
         "--batch-size", "8", "--total-steps", "2", "--num-workers", "2",
         "--work-dir", work],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(work, "train.log")).read()
    assert "training done at step 2" in log
    # the trainer built its mesh over all 8 virtual devices
    import re
    m = re.search(r"env n_devices: (\d+)", log)
    if m:
        assert int(m.group(1)) == 8
