"""GeoMAE model: shapes, target semantics, loss finiteness, grad flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_pretrain_config
from geomae_tpu.models import mae
from geomae_tpu.ops.voxelize import build_scene_batch
from geomae_tpu.train.pretrain import dummy_batch, forward, init_state


@pytest.fixture(scope="module")
def cfg():
    return tiny_pretrain_config()


@pytest.fixture(scope="module")
def setup(cfg):
    batch = dummy_batch(cfg, batch_size=2, seed=3)
    scene = build_scene_batch(batch["points"], batch["point_valid"],
                              cfg.voxel, cfg.caps.max_voxels)
    return batch, scene


def test_sample_mask_ratio(cfg, setup):
    _, scene = setup
    keep = mae.sample_mask(jax.random.PRNGKey(0), scene.table.valid,
                           cfg.mae.random_mask_ratio)
    keep = np.asarray(keep)
    valid = np.asarray(scene.table.valid)
    assert not np.any(keep & ~valid)
    for b in range(keep.shape[0]):
        L = valid[b].sum()
        want = int(L * (1 - cfg.mae.random_mask_ratio))
        assert keep[b].sum() == want


def test_targets_centroid_oracle(cfg, setup):
    """Low/med/top centroid targets match per-slot means in local frames."""
    _, scene = setup
    tg = mae.compute_targets_batch(scene, cfg)
    b = 0
    pts = np.asarray(scene.points)[b, :, :3]
    pv = np.asarray(scene.valid)[b]
    p2v = np.asarray(scene.table.point2voxel)[b]
    sl = np.asarray(scene.slot_low)[b]
    sm = np.asarray(scene.slot_med)[b]
    coords = np.asarray(scene.table.coords)[b]
    voxel = cfg.voxel
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mzr, myr, mxr = voxel.sub_voxel_ratio_med
    vx, vy, vz = voxel.voxel_size
    r = voxel.point_cloud_range
    V = coords.shape[0]

    got_c = np.asarray(tg.centroid_low)[b]
    got_o = np.asarray(tg.occ_low)[b]
    got_cm = np.asarray(tg.centroid_med)[b]
    got_om = np.asarray(tg.occ_med)[b]
    got_ct = np.asarray(tg.centroid_top)[b]

    rs = np.random.default_rng(0)
    checked = 0
    for i in rs.choice(len(pts), 400, replace=False):
        if not pv[i] or p2v[i] >= V:
            continue
        v, s = p2v[i], sl[i]
        sel = pv & (p2v == v) & (sl == s)
        assert got_o[v, s]
        cent = pts[sel][:, ::-1].mean(0)  # (z, y, x)
        size = np.array([vz / rz, vy / ry, vx / rx])
        origin = np.array([r[2], r[1], r[0]])
        coor = np.array([s // (ry * rx),
                         coords[v, 0] * ry + (s // rx) % ry,
                         coords[v, 1] * rx + s % rx])
        want = (cent - (coor * size + origin)) / size
        np.testing.assert_allclose(got_c[v, s], want, rtol=3e-3, atol=3e-3)
        assert np.all(want >= -1e-3) and np.all(want <= 1 + 1e-3)

        # med slot of the same point
        m = sm[i]
        selm = pv & (p2v == v) & (sm == m)
        assert got_om[v, m]
        centm = pts[selm][:, ::-1].mean(0)
        sizem = np.array([vz / mzr, vy / myr, vx / mxr])
        coorm = np.array([m // (myr * mxr),
                          coords[v, 0] * myr + (m // mxr) % myr,
                          coords[v, 1] * mxr + m % mxr])
        wantm = (centm - (coorm * sizem + origin)) / sizem
        np.testing.assert_allclose(got_cm[v, m], wantm, rtol=3e-3, atol=3e-3)

        # top centroid
        selt = pv & (p2v == v)
        centt = pts[selt][:, ::-1].mean(0)
        sizet = np.array([vz, vy, vx])
        coort = np.array([0, coords[v, 0], coords[v, 1]])
        wantt = (centt - (coort * sizet + origin)) / sizet
        np.testing.assert_allclose(got_ct[v], wantt, rtol=3e-3, atol=3e-3)
        checked += 1
    assert checked > 50


def test_targets_normal_planar(cfg):
    """Points on a flat plane -> normals along z."""
    P = cfg.caps.max_points
    rng = np.random.default_rng(1)
    r = cfg.voxel.point_cloud_range
    xy = rng.uniform(r[0] + 1, r[3] - 1, (P, 2)).astype(np.float32)
    z = np.full(P, -1.0, np.float32)
    pts = np.stack([xy[:, 0], xy[:, 1], z], -1)[None]
    valid = np.ones((1, P), bool)
    scene = build_scene_batch(jnp.asarray(pts), jnp.asarray(valid),
                              cfg.voxel, cfg.caps.max_voxels)
    tg = mae.compute_targets_batch(scene, cfg)
    nrm = np.asarray(tg.normal)[0]
    v = np.asarray(scene.table.valid)[0]
    # normal of a flat z-plane in (z, y, x) coords is (1, 0, 0)
    cos = np.abs(nrm[v, 0])
    assert np.mean(cos > 0.99) > 0.95


def test_forward_and_loss(cfg):
    state, _ = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    batch = dummy_batch(cfg, batch_size=2, seed=5)
    losses, _ = forward(cfg, {"params": state.params,
                              "batch_stats": state.batch_stats},
                        batch, jax.random.PRNGKey(1), train=True)
    for k, val in losses.items():
        assert np.isfinite(float(val)), (k, val)
    assert float(losses["loss"]) > 0


def test_grad_flow(cfg):
    state, tx = init_state(cfg, batch_size=1, rng=jax.random.PRNGKey(0))
    batch = dummy_batch(cfg, batch_size=1, seed=7)

    def loss_fn(params):
        losses, _ = forward(cfg, {"params": params,
                                  "batch_stats": state.batch_stats},
                            batch, jax.random.PRNGKey(2), train=True)
        return losses["loss"]

    grads = jax.grad(loss_fn)(state.params)
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9  # nearly all params touched
