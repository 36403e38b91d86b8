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
