"""Aligned 3D anchor generation.

Rebuilds ``AlignedAnchor3DRangeGenerator``
(``/root/reference/mmdet3d/core/anchor/anchor_3d_generator.py:213``): anchor
centers sit at cell centers of the feature map ("aligned": range divided
into ``featmap_size`` cells, center at (i + 0.5) * step), one (size x
rotation) anchor pair per cell per anchor type, with custom velocity values
appended (code_size 9 for nuScenes).

The GeoMAE fine-tune config uses 7 per-class (range, size) pairs x 2
rotations on a single 200x200 level (``configs/pre_sst/...6x_1e-5.py:
134-160``).
"""
from __future__ import annotations

import numpy as np

from ..config import AnchorHeadConfig


def grid_anchors(cfg: AnchorHeadConfig, featmap_size) -> np.ndarray:
    """All anchors for one feature map level.

    Returns float32 [ny * nx * num_types * num_rots, 9] as
    (x, y, z, w, l, h, yaw, vx, vy), ordered (y, x, type, rot) row-major —
    matching the reference's reshape order (anchors viewed [ny, nx, ...]
    after ``torch.meshgrid`` indexing).
    """
    ny, nx = featmap_size
    rows = []
    for rng, size in zip(cfg.anchor_ranges, cfg.anchor_sizes):
        x_centers = np.linspace(rng[0], rng[3], nx, endpoint=False,
                                dtype=np.float32)
        y_centers = np.linspace(rng[1], rng[4], ny, endpoint=False,
                                dtype=np.float32)
        x_step = (rng[3] - rng[0]) / nx
        y_step = (rng[4] - rng[1]) / ny
        x_centers = x_centers + x_step / 2
        y_centers = y_centers + y_step / 2
        z = rng[2]
        yy, xx = np.meshgrid(y_centers, x_centers, indexing="ij")
        per_cell = []
        for rot in cfg.rotations:
            a = np.stack([
                xx, yy, np.full_like(xx, z),
                np.full_like(xx, size[0]), np.full_like(xx, size[1]),
                np.full_like(xx, size[2]), np.full_like(xx, rot),
                np.zeros_like(xx), np.zeros_like(xx),
            ], axis=-1)
            per_cell.append(a)
        rows.append(np.stack(per_cell, axis=2))      # [ny, nx, R, 9]
    # [ny, nx, T, R, 9] -> flat
    anchors = np.stack(rows, axis=2)
    return anchors.reshape(-1, 9).astype(np.float32)


def num_anchors_per_cell(cfg: AnchorHeadConfig) -> int:
    return len(cfg.anchor_sizes) * len(cfg.rotations)
