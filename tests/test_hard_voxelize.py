import jax
import jax.numpy as jnp
import numpy as np

from geomae_tpu.ops import voxelize as vox
from tests.test_voxelize import random_points, tiny_cfg


def test_hard_voxelize_matches_table(rng):
    cfg = tiny_cfg()
    P, V, T = 400, 512, 4
    pts5 = np.concatenate([random_points(rng, P, cfg),
                           rng.normal(size=(P, 2)).astype(np.float32)], -1)
    valid = rng.random(P) > 0.1
    sc = vox.build_scene(jnp.asarray(pts5), jnp.asarray(valid), cfg, V)
    voxels, n = vox.hard_voxelize(sc, T)
    voxels, n = np.asarray(voxels), np.asarray(n)
    p2v = np.asarray(sc.table.point2voxel)
    spts = np.asarray(sc.points)
    sval = np.asarray(sc.valid)
    for v in range(V):
        sel = sval & (p2v == v)
        cnt = sel.sum()
        assert n[v] == min(cnt, T)
        got_rows = voxels[v][:n[v]]
        want_rows = spts[sel]
        for row in got_rows:
            assert np.any(np.all(np.isclose(want_rows, row, atol=1e-6),
                                 axis=1))
        assert np.all(voxels[v][n[v]:] == 0)


def test_simple_vfes(rng):
    from geomae_tpu.models.pillar_encoders import (dynamic_simple_vfe,
                                                   hard_simple_vfe)
    cfg = tiny_cfg()
    P, V = 300, 512
    pts = np.concatenate([random_points(rng, P, cfg),
                          rng.random((P, 1)).astype(np.float32)], -1)
    valid = np.ones(P, bool)
    sc_b = vox.build_scene_batch(jnp.asarray(pts[None]),
                                 jnp.asarray(valid[None]), cfg, V)
    mean = np.asarray(dynamic_simple_vfe(sc_b))[0]
    p2v = np.asarray(sc_b.table.point2voxel)[0]
    spts = np.asarray(sc_b.points)[0]
    for v in range(int(sc_b.table.num_voxels[0])):
        np.testing.assert_allclose(mean[v], spts[p2v == v].mean(0),
                                   rtol=1e-4, atol=1e-4)

    sc = jax.tree_util.tree_map(lambda x: x[0], sc_b)
    voxels, n = vox.hard_voxelize(sc, 8)
    hm = np.asarray(hard_simple_vfe(voxels, n, num_features=4))
    v0 = int(np.argmax(np.asarray(n)))
    np.testing.assert_allclose(
        hm[v0], np.asarray(voxels)[v0][:int(n[v0])].mean(0), rtol=1e-5)


def test_hard_vfe_oracle(rng):
    """HardVFE vs a numpy oracle on one tiny scene: decorations, masked
    BN statistics over real points only, max including transformed
    zero-pad rows (reference voxel_encoder.py:575 masks input only)."""
    from geomae_tpu.config import VFEConfig
    from geomae_tpu.models.pillar_encoders import HardVFE

    cfg = tiny_cfg()
    vcfg = VFEConfig(feat_channels=(8,), with_cluster_center=True,
                     with_voxel_center=True, with_distance=True)
    P, V, T = 200, 64, 8
    pts = np.concatenate([random_points(rng, P, cfg),
                          rng.random((P, 1)).astype(np.float32)], -1)
    valid = np.ones(P, bool)
    sc_b = vox.build_scene_batch(jnp.asarray(pts[None]),
                                 jnp.asarray(valid[None]), cfg, V)
    sc = jax.tree_util.tree_map(lambda x: x[0], sc_b)
    voxels, n = vox.hard_voxelize(sc, T)
    voxels = np.asarray(voxels)[None]
    n = np.asarray(n)[None]
    coords = np.asarray(sc_b.table.coords)

    model = HardVFE(vcfg, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                        jnp.asarray(n), jnp.asarray(coords), train=False)
    out = np.asarray(model.apply(params, jnp.asarray(voxels),
                                 jnp.asarray(n), jnp.asarray(coords),
                                 train=True, mutable=["batch_stats"])[0])

    # numpy oracle
    vx, vy, vz = cfg.voxel_size
    r = cfg.point_cloud_range
    mask = np.arange(T)[None, None] < n[..., None]
    xyz = voxels[..., :3]
    mean = xyz.sum(-2, keepdims=True) / np.maximum(n, 1)[..., None, None]
    ctr = np.stack([
        voxels[..., 0] - (coords[..., 1:2] * vx + vx / 2 + r[0]),
        voxels[..., 1] - (coords[..., 0:1] * vy + vy / 2 + r[1]),
        voxels[..., 2] - (vz / 2 + r[2])], -1)
    dist = np.linalg.norm(xyz, axis=-1, keepdims=True)
    x = np.concatenate([voxels, xyz - mean, ctr, dist], -1)
    x = np.where(mask[..., None], x, 0.0)
    k = np.asarray(params["params"]["vfe_0_linear"]["kernel"])
    h = x @ k
    m = mask[..., None].astype(np.float64)
    cnt = m.sum()
    mu = (h * m).sum((0, 1, 2)) / cnt
    var = ((h * m) * h).sum((0, 1, 2)) / cnt - mu ** 2
    hn = (h - mu) / np.sqrt(var + vcfg.bn_eps)
    want = np.maximum(hn, 0.0).max(-2)
    np.testing.assert_allclose(out, want, rtol=2e-3, atol=2e-3)
