"""Property tests for fixed-capacity voxelization vs numpy brute force."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import VoxelConfig
from geomae_tpu.ops import voxelize as vox


def tiny_cfg():
    return VoxelConfig(
        point_cloud_range=(-5.12, -5.12, -5.0, 5.12, 5.12, 3.0),
        voxel_size=(0.256, 0.256, 8.0))


def random_points(rng, n, cfg):
    r = cfg.point_cloud_range
    pts = rng.uniform(low=[r[0], r[1], r[2]], high=[r[3], r[4], r[5]],
                      size=(n, 3)).astype(np.float32)
    # keep away from exact borders to dodge fp-boundary flooring ambiguity
    return np.clip(pts, [r[0], r[1], r[2]],
                   [r[3] - 1e-3, r[4] - 1e-3, r[5] - 1e-3])


def np_low_coords(pts, cfg):
    r = cfg.point_cloud_range
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    sizes = np.array([cfg.voxel_size[2] / rz, cfg.voxel_size[1] / ry,
                      cfg.voxel_size[0] / rx])
    origin = np.array([r[2], r[1], r[0]])
    low = np.floor((pts[:, ::-1] - origin) / sizes).astype(np.int64)
    return np.clip(low, 0, [rz - 1, ny * ry - 1, nx * rx - 1])


def test_build_scene_matches_bruteforce(rng):
    cfg = tiny_cfg()
    P, V = 512, 1664  # capacity > 40*40 grid cells, so nothing overflows
    pts3 = random_points(rng, P, cfg)
    pts = np.concatenate([pts3, rng.random((P, 2)).astype(np.float32)], -1)
    valid = rng.random(P) > 0.1
    sc = vox.build_scene(jnp.asarray(pts), jnp.asarray(valid), cfg, V)

    low = np_low_coords(pts3, cfg)
    rz, ry, rx = cfg.sub_voxel_ratio_low
    py, px = low[:, 1] // ry, low[:, 2] // rx
    keys = sorted(set((int(a), int(b)) for a, b, v in zip(py, px, valid)
                      if v))
    n = int(sc.table.num_voxels)
    assert n == len(keys)
    got = [tuple(map(int, c)) for c in np.asarray(sc.table.coords)[:n]]
    assert got == keys                      # canonical ascending order
    assert bool(np.all(np.asarray(sc.table.valid)[:n]))
    assert not np.any(np.asarray(sc.table.valid)[n:])

    # the scene is a permutation of the valid points + padding
    spts = np.asarray(sc.points)
    sval = np.asarray(sc.valid)
    assert sval.sum() == valid.sum()
    orig = {tuple(row) for row in pts[valid]}
    assert {tuple(row) for row in spts[sval]} == orig

    # p2v ascending, rows consistent with each point's pillar
    p2v = np.asarray(sc.table.point2voxel)
    assert np.all(np.diff(p2v) >= 0)
    coords = np.asarray(sc.table.coords)
    slow = np_low_coords(spts[:, :3], cfg)
    for i in np.where(sval)[0]:
        v = p2v[i]
        assert v < V
        assert coords[v, 0] == slow[i, 1] // ry
        assert coords[v, 1] == slow[i, 2] // rx
    assert np.all(p2v[~sval] == V)

    # slots match the reference layout hash
    mz, my, mx = cfg.sub_voxel_ratio_med
    want_sl = ((slow[:, 0] % rz) * (ry * rx) + (slow[:, 1] % ry) * rx
               + (slow[:, 2] % rx))
    np.testing.assert_array_equal(np.asarray(sc.slot_low)[sval],
                                  want_sl[sval])
    cz, cy, cx = slow[:, 0] // 2, slow[:, 1] // 2, slow[:, 2] // 2
    want_sm = (cz % mz) * (my * mx) + (cy % my) * mx + (cx % mx)
    np.testing.assert_array_equal(np.asarray(sc.slot_med)[sval],
                                  want_sm[sval])

    # within a pillar, slot_sort ascending (sorted by pillar+slot_sort key)
    # and slot_sort is med-major: slot_med = slot_sort // 8 for (8,4,4)/(4,2,2)
    ssort = np.asarray(sc.slot_sort)
    smed = np.asarray(sc.slot_med)
    for v in range(n):
        s = ssort[(p2v == v) & sval]
        assert np.all(np.diff(s) >= 0)
    np.testing.assert_array_equal(smed[sval], ssort[sval] // 8)


def test_capacity_overflow(rng):
    cfg = tiny_cfg()
    P = 512
    pts = np.concatenate([random_points(rng, P, cfg),
                          np.zeros((P, 2), np.float32)], -1)
    v_cap = 8
    sc = vox.build_scene(jnp.asarray(pts), jnp.ones(P, bool), cfg, v_cap)
    p2v = np.asarray(sc.table.point2voxel)
    assert np.asarray(sc.table.valid).sum() == v_cap
    assert np.all(p2v <= v_cap) and np.any(p2v == v_cap)
    assert np.all(np.diff(p2v) >= 0)


def test_neighbor_rows(rng):
    cfg = tiny_cfg()
    ny, nx = cfg.grid_size
    pts = np.concatenate([random_points(rng, 400, cfg),
                          np.zeros((400, 2), np.float32)], -1)
    V = 512
    sc = vox.build_scene(jnp.asarray(pts), jnp.ones(400, bool), cfg, V)
    t = sc.table
    nbr = np.asarray(vox.neighbor_rows(t.coords, t.valid, ny, nx, V))
    coords = np.asarray(t.coords)
    valid = np.asarray(t.valid)
    lut = {(int(y), int(x)): i for i, (y, x) in enumerate(coords) if valid[i]}
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            for i in range(V):
                if not valid[i]:
                    assert nbr[i, k] == V
                    continue
                key = (coords[i, 0] + dy, coords[i, 1] + dx)
                want = lut.get(key, V)
                if not (0 <= key[0] < ny and 0 <= key[1] < nx):
                    want = V
                assert nbr[i, k] == want
            k += 1
    assert np.all(nbr[valid, 4] == np.arange(V)[valid])


def test_build_scene_fewer_points_than_capacity(rng):
    """Regression: the value-sort row-key compaction must pad, not truncate,
    when P < v_cap (every tiny/CPU config; round-3 snapshot bug)."""
    cfg = tiny_cfg()
    P, V = 64, 1664                        # far fewer points than capacity
    pts3 = random_points(rng, P, cfg)
    pts = np.concatenate([pts3, np.zeros((P, 2), np.float32)], -1)
    valid = rng.random(P) > 0.2
    sc = vox.build_scene(jnp.asarray(pts), jnp.asarray(valid), cfg, V)

    low = np_low_coords(pts3, cfg)
    rz, ry, rx = cfg.sub_voxel_ratio_low
    py, px = low[:, 1] // ry, low[:, 2] // rx
    keys = sorted(set((int(a), int(b)) for a, b, v in zip(py, px, valid)
                      if v))
    n = int(sc.table.num_voxels)
    assert n == len(keys)
    assert sc.table.coords.shape == (V, 2)
    assert sc.table.valid.shape == (V,)
    got = [tuple(map(int, c)) for c in np.asarray(sc.table.coords)[:n]]
    assert got == keys
    assert not np.any(np.asarray(sc.table.valid)[n:])
    np.testing.assert_array_equal(np.asarray(sc.table.coords)[n:], 0)
