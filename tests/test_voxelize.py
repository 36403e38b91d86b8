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


def np_pillars(pts, valid, cfg):
    """Brute-force pillar assignment through the low grid (oracle)."""
    r = cfg.point_cloud_range
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    sizes = np.array([cfg.voxel_size[2] / rz, cfg.voxel_size[1] / ry,
                      cfg.voxel_size[0] / rx])
    origin = np.array([r[2], r[1], r[0]])
    low = np.floor((pts[:, ::-1] - origin) / sizes).astype(np.int64)
    low = np.clip(low, 0, [rz - 1, ny * ry - 1, nx * rx - 1])
    py, px = low[:, 1] // ry, low[:, 2] // rx
    keys = sorted(set((int(a), int(b)) for a, b, v in zip(py, px, valid) if v))
    return keys, py, px, low


def test_voxelize_matches_bruteforce(rng):
    cfg = tiny_cfg()
    P, V = 512, 1664  # capacity > 40*40 grid cells, so nothing overflows
    pts = random_points(rng, P, cfg)
    valid = rng.random(P) > 0.1
    t = vox.voxelize(jnp.asarray(pts), jnp.asarray(valid), cfg, V)

    keys, py, px, low = np_pillars(pts, valid, cfg)
    n = int(t.num_voxels)
    assert n == len(keys)
    got = [tuple(map(int, c)) for c in np.asarray(t.coords)[:n]]
    assert got == keys                      # canonical ascending order
    assert bool(np.all(np.asarray(t.valid)[:n]))
    assert not np.any(np.asarray(t.valid)[n:])
    # per-point mapping: row's coords match the point's pillar
    p2v = np.asarray(t.point2voxel)
    coords = np.asarray(t.coords)
    for i in range(P):
        if valid[i]:
            assert p2v[i] < V
            assert coords[p2v[i], 0] == py[i] and coords[p2v[i], 1] == px[i]
        else:
            assert p2v[i] == V
    np.testing.assert_array_equal(np.asarray(t.low_coords), low)


def test_voxelize_capacity_overflow(rng):
    cfg = tiny_cfg()
    P = 512
    pts = random_points(rng, P, cfg)
    valid = np.ones(P, bool)
    v_cap = 8  # force overflow
    t = vox.voxelize(jnp.asarray(pts), jnp.asarray(valid), cfg, v_cap)
    p2v = np.asarray(t.point2voxel)
    assert np.asarray(t.valid).sum() == v_cap
    # overflowed points route to trash
    assert np.all((p2v <= v_cap)) and np.any(p2v == v_cap)


def test_sub_voxel_slots_in_range(rng):
    cfg = tiny_cfg()
    pts = random_points(rng, 256, cfg)
    t = vox.voxelize(jnp.asarray(pts), jnp.ones(256, bool), cfg, 128)
    sl, sm = vox.sub_voxel_slots(t.low_coords, cfg)
    assert int(jnp.max(sl)) < cfg.num_slots_low and int(jnp.min(sl)) >= 0
    assert int(jnp.max(sm)) < cfg.num_slots_med and int(jnp.min(sm)) >= 0
    # consistency: low slot and med slot agree on which med cell a low
    # sub-voxel falls into (factor-2 subdivision in every axis)
    rz, ry, rx = cfg.sub_voxel_ratio_low
    mz, my, mx = cfg.sub_voxel_ratio_med
    sl_np, sm_np = np.asarray(sl), np.asarray(sm)
    z, rem = sl_np // (ry * rx), sl_np % (ry * rx)
    y, x = rem // rx, rem % rx
    med = (z // 2) * (my * mx) + (y // 2) * mx + (x // 2)
    np.testing.assert_array_equal(med, sm_np)


def test_neighbor_rows(rng):
    cfg = tiny_cfg()
    ny, nx = cfg.grid_size
    pts = random_points(rng, 400, cfg)
    V = 256
    t = vox.voxelize(jnp.asarray(pts), jnp.ones(400, bool), cfg, V)
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
    # center tap is self
    assert np.all(nbr[valid, 4] == np.arange(V)[valid])
