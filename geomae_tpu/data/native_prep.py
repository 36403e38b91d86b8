"""Native-accelerated sample preparation (SSL pretrain path).

Fuses multi-sweep merge + augmentation + range filter + padding into one
C++ pass per sweep (``geomae_tpu/csrc``), writing straight into the padded
output buffer — no intermediate numpy arrays, no per-transform copies.
Falls back to the pure-numpy pipeline when the native library is
unavailable; both paths are driven by the same sampled augmentation
parameters, so they agree point-for-point (up to float rounding and point
order, which downstream sorting canonicalizes anyway).
"""
from __future__ import annotations

import ctypes
from typing import Dict, Optional

import numpy as np

from ..config import CapsConfig, DataConfig, VoxelConfig
from ..csrc import get_lib, prep_sweep_native
from .pointcloud import load_points_bin, _abspath


def sample_aug_params(cfg: DataConfig, rng: np.random.Generator,
                      train: bool) -> Dict:
    if not train:
        return dict(rot=0.0, scale=1.0, flip_y=False, flip_x=False)
    return dict(
        rot=float(rng.uniform(*cfg.rot_range)),
        scale=float(rng.uniform(*cfg.scale_range)),
        flip_y=bool(rng.random() < cfg.flip_ratio_horizontal),
        flip_x=bool(rng.random() < cfg.flip_ratio_vertical),
    )


def prepare_ssl_sample(info: Dict, cfg: DataConfig, voxel: VoxelConfig,
                       caps: CapsConfig, rng: np.random.Generator,
                       train: bool = True) -> Optional[Dict]:
    """Native path; returns None when the library isn't available."""
    lib = get_lib()
    if lib is None:
        return None
    aug = sample_aug_params(cfg, rng, train)
    pcr = np.asarray(voxel.point_cloud_range, np.float32)
    out = np.zeros((caps.max_points, cfg.use_dim), np.float32)
    cursor = ctypes.c_int64(0)

    def run(pts, R, t, lag):
        prep_sweep_native(
            lib, np.ascontiguousarray(pts[:, :cfg.use_dim]), out, cursor,
            R, t, lag, cfg.remove_close_radius,
            aug["rot"], aug["scale"], aug["flip_y"], aug["flip_x"], pcr)

    key = load_points_bin(_abspath(info["lidar_path"], cfg.data_root),
                          cfg.load_dim, cfg.use_dim)
    run(key, None, None, 0.0)
    ts = info["timestamp"] / 1e6
    sweeps = info.get("sweeps", [])[: cfg.sweeps_num]
    for sw in sweeps:
        pts = load_points_bin(_abspath(sw["data_path"], cfg.data_root),
                              cfg.load_dim, cfg.use_dim)
        R = np.ascontiguousarray(
            np.asarray(sw["sensor2lidar_rotation"], np.float32))
        t = np.ascontiguousarray(
            np.asarray(sw["sensor2lidar_translation"], np.float32))
        run(pts, R, t, float(ts - sw["timestamp"] / 1e6))

    n = cursor.value
    if train and cfg.shuffle_points and n > 1:
        lib.shuffle_rows(out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)), n, out.shape[1],
            int(rng.integers(1, 2**63)))
    valid = np.zeros(caps.max_points, bool)
    valid[:n] = True
    return dict(points=out, point_valid=valid)


def build_scene_host(points: np.ndarray, n_valid: int, voxel: VoxelConfig,
                     v_cap: int) -> Optional[Dict]:
    """Host-side canonical scene build (C++ radix sort) — the loader-side
    equivalent of ``ops.voxelize.build_scene``.  Returns dict of arrays
    matching the :class:`geomae_tpu.ops.voxelize.Scene` layout, or None
    when the native core is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    P, D = points.shape
    r = voxel.point_cloud_range
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    ny, nx = voxel.grid_size
    vx, vy, vz = voxel.voxel_size
    out_pts = np.zeros_like(points)
    slot_low = np.zeros(P, np.int32)
    slot_med = np.zeros(P, np.int32)
    slot_sort = np.zeros(P, np.int32)
    p2v = np.zeros(P, np.int32)
    coords = np.zeros((v_cap, 2), np.int32)
    tvalid = np.zeros(v_cap, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    nv = lib.build_scene(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_valid, D,
        np.float32(r[0]), np.float32(r[1]), np.float32(r[2]),
        np.float32(vx / rx), np.float32(vy / ry), np.float32(vz / rz),
        nx, ny, rx, ry, rz, mx, my, mz, P, v_cap,
        out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        slot_low.ctypes.data_as(i32p), slot_med.ctypes.data_as(i32p),
        slot_sort.ctypes.data_as(i32p),
        p2v.ctypes.data_as(i32p), coords.ctypes.data_as(i32p),
        tvalid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    valid = np.zeros(P, bool)
    valid[:n_valid] = True
    return dict(points=out_pts, point_valid=valid,
                slot_low=slot_low, slot_med=slot_med, slot_sort=slot_sort,
                p2v=p2v, coords=coords, table_valid=tvalid.astype(bool),
                num_voxels=np.int32(min(nv, 2**31 - 1)))
