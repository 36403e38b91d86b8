"""Synthetic LiDAR scenes + in-memory info fixtures for tests and bench.

Replaces the reference's checked-in ``tests/data`` golden files (absent in
the mount; SURVEY.md §4) with generated fixtures: clustered point clouds
with ground plane, plus box annotations consistent with the clusters.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def synthetic_scene(rng: np.random.Generator, pc_range, n_points: int,
                    n_objects: int = 12):
    """Returns (points [N,5], boxes [M,9], labels [M])."""
    lo = np.array([pc_range[0], pc_range[1], -2.0])
    hi = np.array([pc_range[3], pc_range[4], 0.5])
    boxes = []
    labels = []
    chunks = []
    per_obj = n_points // (n_objects * 2)
    for _ in range(n_objects):
        ctr = rng.uniform(lo, hi)
        dims = rng.uniform([1.5, 1.5, 1.0], [5.0, 2.5, 2.5])
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        local = rng.uniform(-0.5, 0.5, (per_obj, 3)) * dims
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        chunks.append(local @ R.T + ctr)
        boxes.append([*ctr, *dims, yaw, 0.0, 0.0])
        labels.append(rng.integers(0, 10))
    n_ground = n_points - per_obj * n_objects
    ground = np.stack([
        rng.uniform(pc_range[0], pc_range[3], n_ground),
        rng.uniform(pc_range[1], pc_range[4], n_ground),
        rng.normal(-1.8, 0.05, n_ground)], -1)
    xyz = np.concatenate(chunks + [ground]).astype(np.float32)
    eps = 1e-3
    xyz = np.clip(xyz, [pc_range[0], pc_range[1], pc_range[2]],
                  [pc_range[3] - eps, pc_range[4] - eps, pc_range[5] - eps])
    extra = np.stack([rng.uniform(0, 1, n_points),
                      rng.uniform(0, 0.45, n_points)], -1).astype(np.float32)
    pts = np.concatenate([xyz, extra], -1)
    return pts, np.asarray(boxes, np.float32), np.asarray(labels, np.int32)


def write_synthetic_infos(tmpdir: str, n_frames: int = 3,
                          n_points: int = 4000,
                          n_sweeps: int = 2) -> str:
    """Write .bin files + an info pkl in the nuScenes schema; returns the
    pkl path (for dataset tests)."""
    import os
    import pickle

    rng = np.random.default_rng(0)
    infos: List[Dict] = []
    os.makedirs(f"{tmpdir}/sweeps", exist_ok=True)
    for i in range(n_frames):
        pts, boxes, labels = synthetic_scene(
            rng, (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), n_points)
        raw = np.concatenate([pts[:, :4],
                              np.zeros((len(pts), 1), np.float32)], -1)
        path = f"{tmpdir}/frame_{i}.bin"
        raw.astype(np.float32).tofile(path)
        sweeps = []
        for j in range(n_sweeps):
            spts, _, _ = synthetic_scene(
                rng, (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), n_points // 2)
            sraw = np.concatenate([spts[:, :4],
                                   np.zeros((len(spts), 1), np.float32)], -1)
            spath = f"{tmpdir}/sweeps/frame_{i}_{j}.bin"
            sraw.astype(np.float32).tofile(spath)
            sweeps.append(dict(
                data_path=spath,
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3),
                timestamp=(1_000_000 * i - 100_000 * (j + 1)),
            ))
        infos.append(dict(
            lidar_path=path, token=f"tok{i}", timestamp=1_000_000 * i,
            sweeps=sweeps, gt_boxes=boxes[:, :7],
            gt_velocity=boxes[:, 7:9],
            gt_names=np.array(["car"] * len(boxes)),
            valid_flag=np.ones(len(boxes), bool),
            num_lidar_pts=np.full(len(boxes), 10),
        ))
    pkl_path = f"{tmpdir}/infos.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version="synthetic")), f)
    return pkl_path
