"""Fixed-capacity dynamic voxelization.

TPU-native replacement for the reference CUDA voxel layer
(``/root/reference/mmdet3d/ops/voxel/src/voxelization_cuda.cu`` via
``mmdet3d/ops/voxel/voxelize.py:40-43``) and the unique+scatter pillar table
construction of ``scatter_v2`` (``mmdet3d/ops/sst/sst_ops.py:8-39``).

Design (all static shapes):

* Points are ``[P, 3]`` (+mask).  Coordinates are floored once at the finest
  (sub-voxel "low") resolution; pillar / med coords derive by integer
  division — self-consistent at fp boundaries, unlike the reference which
  floors each resolution independently (SURVEY.md §8.1).
* The pillar table is built by a single sort of the per-point linear cell
  keys: first-occurrence flags -> prefix-sum ranks -> fixed ``v_cap`` rows,
  canonically ordered by ascending (y, x) key.  The reference instead uses
  unordered ``torch.unique`` (row order implementation-defined, SURVEY.md
  §8.2).
* Out-of-range points are CLAMPED to the grid border, matching this fork's
  kernels (``voxelization_cpu.cpp:22-31``) — though the host pipeline range-
  filters first, so this only matters at fp boundary cases.

Everything is per-sample; batch via ``jax.vmap``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import VoxelConfig

INT32_MAX = jnp.iinfo(jnp.int32).max


class VoxelTable(NamedTuple):
    """Fixed-capacity pillar table (per sample).

    Attributes:
      coords:      int32 [V, 2] — (y, x) pillar coords; 0 where invalid.
      valid:       bool  [V] — row holds a real pillar.
      num_voxels:  int32 [] — number of real pillars (may exceed V if
                   capacity overflowed; excess points are dropped).
      point2voxel: int32 [P] — row index per point; == V for points that are
                   invalid or whose pillar overflowed capacity.
      low_coords:  int32 [P, 3] — per-point (z, y, x) at the finest
                   sub-voxel resolution (already clamped to the grid).
    """

    coords: jnp.ndarray
    valid: jnp.ndarray
    num_voxels: jnp.ndarray
    point2voxel: jnp.ndarray
    low_coords: jnp.ndarray


def low_voxel_coords(points_xyz: jnp.ndarray, cfg: VoxelConfig) -> jnp.ndarray:
    """Per-point integer coords (z, y, x) at the finest sub-voxel grid."""
    r = cfg.point_cloud_range
    vx, vy, vz = cfg.voxel_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    ny, nx = cfg.grid_size
    sizes = jnp.array([vz / rz, vy / ry, vx / rx], dtype=jnp.float32)
    origin = jnp.array([r[2], r[1], r[0]], dtype=jnp.float32)
    zyx = points_xyz[:, ::-1].astype(jnp.float32)
    c = jnp.floor((zyx - origin) / sizes).astype(jnp.int32)
    # clamp to grid (reference fork clamps rather than drops)
    hi = jnp.array([1 * rz - 1, ny * ry - 1, nx * rx - 1], dtype=jnp.int32)
    return jnp.clip(c, 0, hi)


def voxelize(points_xyz: jnp.ndarray, point_valid: jnp.ndarray,
             cfg: VoxelConfig, v_cap: int) -> VoxelTable:
    """Build the pillar table for one sample.

    Args:
      points_xyz: [P, 3] float — x, y, z in meters (range-filtered, padded).
      point_valid: [P] bool.
      v_cap: static pillar capacity.
    """
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    low = low_voxel_coords(points_xyz, cfg)          # [P, 3] (z, y, x)
    py = low[:, 1] // ry
    px = low[:, 2] // rx
    key = py * nx + px                               # [0, ny*nx)
    key = jnp.where(point_valid, key, INT32_MAX)

    order = jnp.argsort(key)                         # invalid sort last
    sk = key[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & (sk != INT32_MAX)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1   # voxel row per sorted pos
    num_voxels = first.sum().astype(jnp.int32)

    # rank may exceed capacity -> trash
    in_cap = (rank >= 0) & (rank < v_cap) & (sk != INT32_MAX)
    rank_safe = jnp.where(in_cap, rank, v_cap)

    # voxel row -> key (canonical ascending order); scatter first occurrences
    row_keys = jnp.full((v_cap + 1,), INT32_MAX, jnp.int32)
    row_keys = row_keys.at[jnp.where(first & in_cap, rank_safe, v_cap)].set(
        sk, mode="drop")
    row_keys = row_keys[:v_cap]
    valid = row_keys != INT32_MAX
    safe_keys = jnp.where(valid, row_keys, 0)
    coords = jnp.stack([safe_keys // nx, safe_keys % nx], axis=-1)

    # per-point voxel row in original point order
    p2v = jnp.zeros(key.shape, jnp.int32).at[order].set(rank_safe)

    return VoxelTable(coords=coords, valid=valid, num_voxels=num_voxels,
                      point2voxel=p2v, low_coords=low)


def voxelize_batch(points_xyz: jnp.ndarray, point_valid: jnp.ndarray,
                   cfg: VoxelConfig, v_cap: int) -> VoxelTable:
    """Batched voxelization: [B, P, 3] -> VoxelTable with leading B dim."""
    return jax.vmap(lambda p, m: voxelize(p, m, cfg, v_cap))(
        points_xyz, point_valid)


def sub_voxel_slots(low_coords: jnp.ndarray, cfg: VoxelConfig):
    """Per-point sub-voxel slot indices inside the owning pillar.

    Returns ``(slot_low, slot_med)`` int32 [P] with
    ``slot = (z % rz) * ry * rx + (y % ry) * rx + (x % rx)`` exactly like the
    reference's target layout hash (``..._ssl.py:699-716``), except coords at
    the med level derive from the low level by //2 (ratios are (8,4,4) vs
    (4,2,2), an exact factor of 2 in each axis).
    """
    lz, ly, lx = low_coords[:, 0], low_coords[:, 1], low_coords[:, 2]
    rz, ry, rx = cfg.sub_voxel_ratio_low
    mz, my, mx = cfg.sub_voxel_ratio_med
    slot_low = (lz % rz) * (ry * rx) + (ly % ry) * rx + (lx % rx)
    # med integer coords = low // (rz/mz, ry/my, rx/mx)
    fz, fy, fx = rz // mz, ry // my, rx // mx
    cz, cy, cx = lz // fz, ly // fy, lx // fx
    slot_med = (cz % mz) * (my * mx) + (cy % my) * mx + (cx % mx)
    return slot_low.astype(jnp.int32), slot_med.astype(jnp.int32)


def hard_voxelize(points: jnp.ndarray, point_valid: jnp.ndarray,
                  table: VoxelTable, max_points: int):
    """Gather points into a dense per-voxel buffer (hard voxelization).

    Replaces the CUDA ``hard_voxelize`` (``mmdet3d/ops/voxel/src/
    voxelization.h:7-136``) given an existing :class:`VoxelTable`: each
    voxel keeps its first ``max_points`` points (by sorted order —
    point order is shuffled upstream, matching the reference's arbitrary
    intra-voxel order).

    Returns:
      voxels: [V, max_points, D] (zeros padded),
      num_points: int32 [V] (clamped to max_points).
    """
    P, D = points.shape
    v_cap = table.valid.shape[0]
    p2v = table.point2voxel
    # rank of each point within its voxel: order by (voxel, position)
    key = jnp.where(point_valid, p2v, v_cap)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_start = jnp.where(first, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank_sorted = pos - seg_start
    rank = jnp.zeros(P, jnp.int32).at[order].set(rank_sorted)

    ok = point_valid & (p2v < v_cap) & (rank < max_points)
    slot = jnp.where(ok, p2v * max_points + rank, v_cap * max_points)
    voxels = jnp.zeros((v_cap * max_points + 1, D), points.dtype)
    voxels = voxels.at[slot].set(points, mode="drop")
    voxels = voxels[:-1].reshape(v_cap, max_points, D)
    counts = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.where(ok, p2v, v_cap),
        num_segments=v_cap + 1)[:v_cap]
    return voxels, jnp.minimum(counts, max_points)


def dense_hash(coords: jnp.ndarray, valid: jnp.ndarray, ny: int, nx: int,
               v_cap: int) -> jnp.ndarray:
    """Dense (y, x) -> pillar-row lookup table for one sample.

    int32 [ny * nx]; empty cells hold ``v_cap`` (trash row), so a gather
    through this table composes with :func:`gather_rows`.  Replaces both the
    reference's ``b*grid`` hash tables (``..._ssl.py:691-694``) and the
    spconv ``get_indice_pairs_implicit_gemm`` 3x3 neighbor machinery
    (``..._ssl.py:192-207``) — neighbors become 9 shifted lookups.
    """
    table = jnp.full((ny * nx + 1,), v_cap, jnp.int32)
    key = coords[:, 0] * nx + coords[:, 1]
    key = jnp.where(valid, key, ny * nx)
    rows = jnp.arange(coords.shape[0], dtype=jnp.int32)
    table = table.at[key].set(jnp.where(valid, rows, v_cap), mode="drop")
    return table[: ny * nx]


def neighbor_rows(coords: jnp.ndarray, valid: jnp.ndarray, ny: int, nx: int,
                  v_cap: int) -> jnp.ndarray:
    """3x3 neighborhood pillar rows, int32 [V, 9]; missing -> ``v_cap``.

    Neighbor order is row-major over (dy, dx) in {-1, 0, 1}², matching a
    [1, 3, 3] subm conv kernel's taps.
    """
    table = dense_hash(coords, valid, ny, nx, v_cap)
    out = []
    y, x = coords[:, 0], coords[:, 1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            ok = valid & (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx)
            k = jnp.clip(yy, 0, ny - 1) * nx + jnp.clip(xx, 0, nx - 1)
            out.append(jnp.where(ok, table[k], v_cap))
    return jnp.stack(out, axis=-1)
