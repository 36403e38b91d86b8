"""Waymo converter: KITTI-format tree -> info pkl -> WaymoDataset round-trip.

Covers the pure (devkit-free) half of the conversion pipeline against the
reference semantics (``tools/data_converter/kitti_converter.py:149`` +
``kitti_data_utils.get_waymo_image_info:266`` + ``waymo_converter.py``
label/calib formatting):

* label math: vehicle-frame waymo box -> KITTI camera-frame line ->
  parsed annos -> recovered LiDAR box (the save_label / get_label_anno /
  dataset-decode chain);
* calib text round-trip (format_calib / parse_calib);
* info build: velodyne paths, per-frame pose, timestamp from the bin's
  last channel, prev-id sweep walk with poses;
* multi-sweep merge: a static world point lands at the same key-frame
  coordinates from every sweep after ego compensation;
* the WaymoDatasetComplement load-interval complement selection.
"""
import os
import pickle

import numpy as np
import pytest

from geomae_tpu.config import CapsConfig, DataConfig, VoxelConfig
from geomae_tpu.data import waymo_converter as wc
from geomae_tpu.data.waymo import WaymoDataset, _annos_to_lidar_boxes


def _pose(tx, ty, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = tx, ty
    return T


def _front_cam_extrinsic():
    """A nontrivial cam->vehicle extrinsic (front camera ~1.5 m up,
    slightly yawed)."""
    T = _pose(1.2, -0.1, 0.05)
    T[2, 3] = 1.5
    return T


def _write_frame(root, split, fid, points_vehicle, pose, labels_lidar=()):
    sd = os.path.join(root, split)
    for sub in ("velodyne", "calib", "pose", "label_all"):
        os.makedirs(os.path.join(sd, sub), exist_ok=True)
    points_vehicle.astype(np.float32).tofile(
        os.path.join(sd, "velodyne", f"{fid}.bin"))
    np.savetxt(os.path.join(sd, "pose", f"{fid}.txt"), pose)
    T = wc.velo_to_front_cam(_front_cam_extrinsic())
    calibs = [np.hstack([np.diag([2000.0, 2000.0, 1.0]),
                         np.zeros((3, 1))])] * 5
    with open(os.path.join(sd, "calib", f"{fid}.txt"), "w") as f:
        f.write(wc.format_calib(calibs, [T] * 5))
    lines = [wc.waymo_label_to_kitti_line(
        "Car", (b[0], b[1], b[2] + b[5] / 2, b[3], b[4], b[5], b[6]), T)
        for b in labels_lidar]
    with open(os.path.join(sd, "label_all", f"{fid}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def test_label_roundtrip_lidar_box():
    """waymo label -> KITTI line -> annos -> LiDAR box == original."""
    T = wc.velo_to_front_cam(_front_cam_extrinsic())
    # (x, y, z_bottom, l, w, h, yaw) in the lidar/vehicle frame
    box = np.array([12.34, -5.6, 0.42, 4.5, 1.9, 1.6, 0.7])
    line = wc.waymo_label_to_kitti_line(
        "Car", (box[0], box[1], box[2] + box[5] / 2,
                box[3], box[4], box[5], box[6]), T, camera_id="2")
    annos = wc.parse_label(line)
    assert annos["name"][0] == "Car"
    assert annos["camera_id"][0] == 2.0
    calib = dict(R0_rect=np.eye(4), Tr_velo_to_cam=T)
    rec = _annos_to_lidar_boxes(annos, calib)[0]
    # labels round to 2 decimals (reference waymo_converter.py:325-332)
    np.testing.assert_allclose(rec, box, atol=0.02)


def test_calib_roundtrip():
    T = wc.velo_to_front_cam(_front_cam_extrinsic())
    P = np.hstack([np.diag([1000.0, 1100.0, 1.0]), np.zeros((3, 1))])
    text = wc.format_calib([P] * 5, [T] * 5)
    calib = wc.parse_calib(text)
    # %e keeps 7 significant digits (reference waymo_converter.py writes
    # f'{i:e}' the same way)
    np.testing.assert_allclose(calib["Tr_velo_to_cam"], T,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(calib["P2"][:3], P, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(calib["R0_rect"][:3, :3], np.eye(3))


@pytest.fixture()
def kitti_tree(tmp_path):
    """3-frame segment with known ego motion and one static world point."""
    root = str(tmp_path)
    world_pt = np.array([20.0, 7.0, 1.0])
    poses = [_pose(0.0, 0.0, 0.0), _pose(2.0, 0.5, 0.05),
             _pose(4.0, 1.0, 0.10)]
    box = np.array([10.0, 2.0, 0.0, 4.0, 1.8, 1.5, 0.3])
    for i, pose in enumerate(poses):
        inv = np.linalg.inv(pose)
        local = inv[:3, :3] @ world_pt + inv[:3, 3]
        n = 50
        pts = np.zeros((n, 6), np.float32)
        pts[:, :3] = np.random.default_rng(i).uniform(-30, 30, (n, 3))
        pts[0, :3] = local
        pts[:, 3] = 0.5                       # intensity
        pts[:, 4] = 0.1                       # elongation
        pts[:, 5] = 1_000_000 * (i + 1)       # timestamp micros
        _write_frame(root, "training", f"{i:07d}", pts, pose,
                     labels_lidar=[box] if i == 2 else ())
    return root, poses, world_pt, box


def test_info_file_and_dataset_roundtrip(kitti_tree):
    root, poses, world_pt, box = kitti_tree
    wc.create_waymo_info_file(root, max_sweeps=2)
    with open(os.path.join(root, "waymo_infos_train.pkl"), "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    key = infos[2]
    assert key["point_cloud"]["num_features"] == 6
    assert key["timestamp"] == 3_000_000
    assert len(key["sweeps"]) == 2
    assert key["sweeps"][0]["velodyne_path"].endswith("0000001.bin")
    np.testing.assert_allclose(key["pose"], poses[2], atol=1e-9)
    assert "annos" in key and key["annos"]["name"][0] == "Car"
    assert key["annos"]["num_points_in_gt"][0] >= 0
    assert "annos" not in infos[0] or len(infos[0]["annos"]["name"]) == 0

    caps = CapsConfig(max_points=512, max_voxels=64, max_visible=32)
    cfg = DataConfig(data_root=root, ann_file="waymo_infos_train.pkl",
                     sweeps_num=2, load_dim=6, use_dim=5)
    voxel = VoxelConfig(point_cloud_range=(-75.0, -75.0, -4.0,
                                           75.0, 75.0, 6.0),
                        voxel_size=(0.32, 0.32, 10.0))
    ds = WaymoDataset(cfg, voxel, caps, test_mode=True)
    assert len(ds) == 3

    # ego-compensated merge: the static world point must appear at the
    # key frame's local coordinates from the key frame AND both sweeps
    info = ds.infos[2]
    pts = ds._points(info, np.random.default_rng(0))
    inv_key = np.linalg.inv(poses[2])
    expect = inv_key[:3, :3] @ world_pt + inv_key[:3, 3]
    d = np.linalg.norm(pts[:, :3] - expect, axis=1)
    assert np.sum(d < 1e-4) == 3, "world point must align across 3 frames"
    # time-lag channel: key frame 0, sweeps (3e6-ts)/1e6 seconds
    lags = np.unique(np.round(pts[:, 4], 6))
    np.testing.assert_allclose(sorted(lags), [0.0, 1.0, 2.0])

    # annotations decode back to the original lidar box
    b9, labels = ds.get_ann(2)
    assert labels.tolist() == [0]
    np.testing.assert_allclose(b9[0, :7], box, atol=0.02)


def test_complement_selection():
    infos = [dict(i=i) for i in range(10)]
    comp = wc.complement_infos(infos, load_interval=5)
    kept = [x["i"] for x in comp]
    assert kept == [1, 2, 3, 4, 6, 7, 8, 9]


def test_kitti_info_file_roundtrip(tmp_path):
    """KITTI tree (6-digit ids, label_2, 4-ch bins) -> infos ->
    KittiDataset decode recovers the lidar box."""
    from geomae_tpu.data import kitti_converter as kc
    from geomae_tpu.data.waymo import KittiDataset

    root = str(tmp_path)
    sd = os.path.join(root, "training")
    for sub in ("velodyne", "calib", "label_2"):
        os.makedirs(os.path.join(sd, sub), exist_ok=True)
    T = wc.velo_to_front_cam(_front_cam_extrinsic())
    box = np.array([15.0, -3.0, 0.1, 3.9, 1.7, 1.5, -0.4])
    # points clustered inside the box so num_points_in_gt > 0
    pts = np.zeros((40, 4), np.float32)
    pts[:, :3] = box[:3] + [0.0, 0.0, 0.5]
    pts[:, 3] = 0.3
    pts.tofile(os.path.join(sd, "velodyne", "000000.bin"))
    P = np.hstack([np.diag([700.0, 700.0, 1.0]), np.zeros((3, 1))])
    lines = [f"P{i}: " + " ".join(f"{v:e}" for v in P.reshape(12))
             for i in range(4)]
    lines.append("R0_rect: " + " ".join(
        f"{v:e}" for v in np.eye(3).reshape(9)))
    lines.append("Tr_velo_to_cam: " + " ".join(
        f"{v:e}" for v in T[:3].reshape(12)))
    lines.append("Tr_imu_to_velo: " + " ".join(
        f"{v:e}" for v in np.eye(4)[:3].reshape(12)))
    with open(os.path.join(sd, "calib", "000000.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    line = wc.waymo_label_to_kitti_line(
        "Car", (box[0], box[1], box[2] + box[5] / 2,
                box[3], box[4], box[5], box[6]), T)
    with open(os.path.join(sd, "label_2", "000000.txt"), "w") as f:
        f.write(line.rsplit(" ", 1)[0] + "\n")     # 15-field KITTI label

    kc.create_kitti_info_file(root)
    with open(os.path.join(root, "kitti_infos_train.pkl"), "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    assert infos[0]["point_cloud"]["num_features"] == 4
    assert infos[0]["annos"]["num_points_in_gt"][0] == 40

    caps = CapsConfig(max_points=256, max_voxels=64, max_visible=32)
    cfg = DataConfig(data_root=root, ann_file="kitti_infos_train.pkl",
                     sweeps_num=0)
    voxel = VoxelConfig(point_cloud_range=(-70.0, -70.0, -4.0,
                                           70.0, 70.0, 4.0))
    ds = KittiDataset(cfg, voxel, caps)
    b9, labels = ds.get_ann(0)
    assert labels.tolist() == [0]
    np.testing.assert_allclose(b9[0, :7], box, atol=0.02)
