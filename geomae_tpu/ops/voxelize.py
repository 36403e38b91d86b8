"""Fixed-capacity dynamic voxelization via one canonical sort.

TPU-native replacement for the reference CUDA voxel layer
(``/root/reference/mmdet3d/ops/voxel/src/voxelization_cuda.cu`` via
``mmdet3d/ops/voxel/voxelize.py:40-43``) and the unique+scatter pillar table
construction of ``scatter_v2`` (``mmdet3d/ops/sst/sst_ops.py:8-39``).

Performance-critical design: XLA lowers every *unsorted* ``segment_sum`` on
TPU to an internal sort, so this module sorts the points ONCE by
``pillar_key * num_slots_low + slot_low`` and returns the whole scene in
that order.  Afterwards

* per-point pillar ids are ascending -> every downstream segment reduction
  (VFE means/maxes, sub-voxel centroid sums) runs with
  ``indices_are_sorted=True`` (a fast segmented scan, no sort);
* low-resolution sub-voxel slots are contiguous within a pillar, and the
  med/top centroid sums derive from the low sums by pure reshape-reductions
  (the med slot coordinates are the low ones //2).

Coordinates are floored once at the finest ("low") resolution and coarser
levels derive by integer division — self-consistent at fp boundaries,
unlike the reference which floors each resolution independently
(SURVEY.md §8.1).  Out-of-range points are CLAMPED to the grid border,
matching this fork's kernels (``voxelization_cpu.cpp:22-31``).  Pillar rows
are canonically ordered by ascending (y, x); the reference's row order is
implementation-defined (``torch.unique(sorted=False)``, SURVEY.md §8.2).

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
                   capacity overflowed; excess pillars' points are dropped).
      point2voxel: int32 [P] — ASCENDING row index per (sorted) point; == V
                   for invalid points / overflowed pillars (always a suffix).
    """

    coords: jnp.ndarray
    valid: jnp.ndarray
    num_voxels: jnp.ndarray
    point2voxel: jnp.ndarray


class Scene(NamedTuple):
    """A sample's points in canonical (pillar, low-slot) sorted order.

    Attributes:
      points:   [P, D] — original point features, reordered.
      valid:    bool [P] — real points (a prefix in sorted order).
      table:    VoxelTable.
      slot_low: int32 [P] — sub-voxel slot within the pillar at the low
                resolution, ``(z%rz)*ry*rx + (y%ry)*rx + (x%rx)``
                (reference target-layout hash, ``..._ssl.py:699-716``).
      slot_med: int32 [P] — same at the med resolution.
      slot_sort: int32 [P] — med-major bijective relabeling of slot_low;
                the canonical order sorts by (pillar, slot_sort), making
                low/med/pillar segments contiguous.
    """

    points: jnp.ndarray
    valid: jnp.ndarray
    table: VoxelTable
    slot_low: jnp.ndarray
    slot_med: jnp.ndarray
    slot_sort: jnp.ndarray


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
    hi = jnp.array([1 * rz - 1, ny * ry - 1, nx * rx - 1], dtype=jnp.int32)
    return jnp.clip(c, 0, hi)


def sub_voxel_slots(low_coords: jnp.ndarray, cfg: VoxelConfig):
    """(slot_low, slot_med, slot_sort) int32 [P] from low integer coords.

    ``slot_low``/``slot_med`` follow the reference's row-major layout hash
    (``..._ssl.py:699-716``).  ``slot_sort`` is a bijective reordering of
    ``slot_low`` with the med-slot bits in the high positions, so that a
    sort by (pillar, slot_sort) leaves low-, med- AND pillar-level segments
    all contiguous — which lets every centroid reduction run as a
    point-space segmented scan.
    """
    lz, ly, lx = low_coords[:, 0], low_coords[:, 1], low_coords[:, 2]
    rz, ry, rx = cfg.sub_voxel_ratio_low
    mz, my, mx = cfg.sub_voxel_ratio_med
    slot_low = (lz % rz) * (ry * rx) + (ly % ry) * rx + (lx % rx)
    fz, fy, fx = rz // mz, ry // my, rx // mx
    cz, cy, cx = lz // fz, ly // fy, lx // fx
    slot_med = (cz % mz) * (my * mx) + (cy % my) * mx + (cx % mx)
    intra = ((lz % rz) % fz) * (fy * fx) + ((ly % ry) % fy) * fx \
        + ((lx % rx) % fx)
    slot_sort = slot_med * (fz * fy * fx) + intra
    return (slot_low.astype(jnp.int32), slot_med.astype(jnp.int32),
            slot_sort.astype(jnp.int32))


def build_scene(points: jnp.ndarray, point_valid: jnp.ndarray,
                cfg: VoxelConfig, v_cap: int) -> Scene:
    """Sort points into canonical order and build the pillar table.

    Args:
      points: [P, D] float — x, y, z first (range-filtered, padded).
      point_valid: [P] bool.
      v_cap: static pillar capacity.
    """
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    s_low = rz * ry * rx
    low = low_voxel_coords(points[:, :3], cfg)
    py = low[:, 1] // ry
    px = low[:, 2] // rx
    slot_low, slot_med, slot_sort = sub_voxel_slots(low, cfg)
    pillar_key = py * nx + px
    key = pillar_key * s_low + slot_sort
    key = jnp.where(point_valid, key, INT32_MAX)

    # THE one sort: sort_key_val emits the sorted keys as a sort OUTPUT,
    # so no separate key[order] gather
    key_s, order = jax.lax.sort_key_val(
        key, jnp.arange(key.shape[0], dtype=jnp.int32))
    valid_s = key_s != INT32_MAX
    pk_s = jnp.where(valid_s, key_s // s_low, INT32_MAX)
    points_s = points[order]                      # one row gather
    # slots recomputed elementwise from the sorted points: cheaper than
    # three scalar gathers through the permutation (TPU scalar gathers run
    # at ~100M/s; elementwise VPU work is effectively free)
    low_s = low_voxel_coords(points_s[:, :3], cfg)
    slot_low_s, slot_med_s, slot_sort_s = sub_voxel_slots(low_s, cfg)

    first = jnp.concatenate(
        [jnp.ones((1,), bool), pk_s[1:] != pk_s[:-1]]) & valid_s
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_voxels = first.sum().astype(jnp.int32)
    in_cap = valid_s & (rank >= 0) & (rank < v_cap)
    p2v = jnp.where(in_cap, rank, v_cap)

    # row -> pillar key: the first-occurrence keys ARE the ascending
    # unique pillar keys, so a VALUE-ONLY sort of the masked key array
    # compacts them into the row prefix.  Cheaper than both a
    # searchsorted(method='sort') ([P+V] sort + payload) and a Pallas
    # per-point segment reduce (measured +18 ms at [4, 262k] on v5e);
    # ranks are dense, so row validity is just ``row < num_voxels``.
    key_rows = jax.lax.sort(jnp.where(first, pk_s, INT32_MAX))
    if key_rows.shape[0] < v_cap:       # tiny scenes: P < pillar capacity
        key_rows = jnp.pad(key_rows, (0, v_cap - key_rows.shape[0]),
                           constant_values=INT32_MAX)
    else:
        key_rows = key_rows[:v_cap]
    tvalid = jnp.arange(v_cap, dtype=jnp.int32) < num_voxels
    safe = jnp.where(tvalid, key_rows, 0)
    coords = jnp.stack([safe // nx, safe % nx], axis=-1)

    table = VoxelTable(coords=coords, valid=tvalid, num_voxels=num_voxels,
                       point2voxel=p2v)
    return Scene(points=points_s, valid=valid_s, table=table,
                 slot_low=slot_low_s, slot_med=slot_med_s,
                 slot_sort=slot_sort_s)


def build_scene_batch(points: jnp.ndarray, point_valid: jnp.ndarray,
                      cfg: VoxelConfig, v_cap: int) -> Scene:
    """[B, P, D] -> Scene with leading batch dim."""
    return jax.vmap(lambda p, m: build_scene(p, m, cfg, v_cap))(
        points, point_valid)


def scene_from_arrays(batch) -> Scene:
    """Rebuild a Scene from loader-precomputed arrays (host-side voxelize;
    see ``data.native_prep.build_scene_host``)."""
    table = VoxelTable(coords=batch["coords"], valid=batch["table_valid"],
                       num_voxels=batch["num_voxels"],
                       point2voxel=batch["p2v"])
    return Scene(points=batch["points"], valid=batch["point_valid"],
                 table=table, slot_low=batch["slot_low"],
                 slot_med=batch["slot_med"], slot_sort=batch["slot_sort"])


def hard_voxelize(scene: Scene, max_points: int):
    """Dense per-voxel point buffers from a sorted scene.

    Replaces the CUDA ``hard_voxelize`` (``mmdet3d/ops/voxel/src/
    voxelization.h:7-136``).  Because points are pillar-sorted, the rank of
    a point within its voxel is position - segment start (no extra sort).

    Returns (voxels [V, max_points, D] zero-padded, num_points int32 [V]).
    """
    P, D = scene.points.shape
    v_cap = scene.table.valid.shape[0]
    p2v = scene.table.point2voxel
    pos = jnp.arange(P, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), p2v[1:] != p2v[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0))
    rank = pos - seg_start

    ok = scene.valid & (p2v < v_cap) & (rank < max_points)
    slot = jnp.where(ok, p2v * max_points + rank, v_cap * max_points)
    voxels = jnp.zeros((v_cap * max_points + 1, D), scene.points.dtype)
    voxels = voxels.at[slot].set(scene.points, mode="drop")
    voxels = voxels[:-1].reshape(v_cap, max_points, D)
    counts = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.where(ok, p2v, v_cap),
        num_segments=v_cap + 1, indices_are_sorted=True)[:v_cap]
    return voxels, jnp.minimum(counts, max_points)


def lookup_rows(coords: jnp.ndarray, valid: jnp.ndarray, ny: int, nx: int,
                query_keys: jnp.ndarray,
                query_ok: jnp.ndarray) -> jnp.ndarray:
    """Pillar-row lookup by linear (y, x) key via binary search.

    Pillar rows are canonically key-sorted, so membership is a sorted
    search (one cheap sort via ``method='sort'``) — replacing both the
    reference's dense ``b*grid`` hash tables (``..._ssl.py:691-694``) and
    an XLA scatter (which lowers ~50x slower than a sort on TPU).
    Returns int32 rows shaped like ``query_keys``; misses -> ``v_cap``.
    """
    v_cap = coords.shape[0]
    key = jnp.where(valid, coords[:, 0] * nx + coords[:, 1], INT32_MAX)
    q = query_keys.reshape(-1)
    pos = jnp.searchsorted(key, q, side="left", method="sort")
    pos = jnp.minimum(pos, v_cap - 1).astype(jnp.int32)
    hit = (key[pos] == q) & query_ok.reshape(-1)
    return jnp.where(hit, pos, v_cap).reshape(query_keys.shape)


def neighbor_rows(coords: jnp.ndarray, valid: jnp.ndarray, ny: int, nx: int,
                  v_cap: int) -> jnp.ndarray:
    """3x3 neighborhood pillar rows, int32 [V, 9]; missing -> ``v_cap``.

    Neighbor order is row-major over (dy, dx) in {-1, 0, 1}², matching a
    [1, 3, 3] subm conv kernel's taps (the spconv
    ``get_indice_pairs_implicit_gemm`` replacement, ``..._ssl.py:192-207``).
    """
    y, x = coords[:, 0], coords[:, 1]
    keys, oks = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            ok = valid & (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx)
            keys.append(jnp.clip(yy, 0, ny - 1) * nx
                        + jnp.clip(xx, 0, nx - 1))
            oks.append(ok)
    return lookup_rows(coords, valid, ny, nx,
                       jnp.stack(keys, -1), jnp.stack(oks, -1))
