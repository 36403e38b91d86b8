"""Host (C++) scene build vs the device (JAX) build_scene."""
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import VoxelConfig
from geomae_tpu.csrc import get_lib
from geomae_tpu.data.native_prep import build_scene_host
from geomae_tpu.ops import voxelize as vox
from tests.test_voxelize import random_points, tiny_cfg

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native core unavailable")


def test_host_scene_matches_device(rng):
    cfg = tiny_cfg()
    P, V = 1024, 1664
    n = 700
    pts = np.zeros((P, 5), np.float32)
    pts[:n, :3] = random_points(rng, n, cfg)
    pts[:n, 3:] = rng.random((n, 2)).astype(np.float32)

    host = build_scene_host(pts, n, cfg, V)
    dev = vox.build_scene(jnp.asarray(pts),
                          jnp.asarray(np.arange(P) < n), cfg, V)

    assert host["num_voxels"] == int(dev.table.num_voxels)
    nv = host["num_voxels"]
    np.testing.assert_array_equal(host["coords"][:nv],
                                  np.asarray(dev.table.coords)[:nv])
    np.testing.assert_array_equal(host["table_valid"],
                                  np.asarray(dev.table.valid))
    np.testing.assert_array_equal(host["p2v"], np.asarray(dev.table.point2voxel))
    np.testing.assert_array_equal(host["point_valid"], np.asarray(dev.valid))
    # same key per sorted position: pillar+slot identical; point rows may be
    # permuted within equal keys (both sorts are valid orders)
    key_h = host["p2v"].astype(np.int64) * 128 + host["slot_low"]
    key_d = (np.asarray(dev.table.point2voxel).astype(np.int64) * 128
             + np.asarray(dev.slot_low))
    np.testing.assert_array_equal(key_h[:n], key_d[:n])
    np.testing.assert_array_equal(host["slot_med"][:n],
                                  np.asarray(dev.slot_med)[:n])
    # point SETS per key equal
    ph = host["points"][:n]
    pd = np.asarray(dev.points)[:n]
    order_h = np.lexsort((ph[:, 1], ph[:, 0], key_h[:n]))
    order_d = np.lexsort((pd[:, 1], pd[:, 0], key_d[:n]))
    np.testing.assert_allclose(ph[order_h], pd[order_d], atol=1e-6)


@pytest.mark.slow
def test_host_scene_runs_through_forward(rng):
    """Scene arrays from the host path drive the pretrain forward."""
    import jax

    from geomae_tpu.config import tiny_pretrain_config
    from geomae_tpu.train.pretrain import forward, init_state

    cfg = tiny_pretrain_config()
    state, _ = init_state(cfg, batch_size=1, rng=jax.random.PRNGKey(0))
    P = cfg.caps.max_points
    n = P // 2
    pts = np.zeros((P, 5), np.float32)
    pts[:n, :3] = random_points(rng, n, cfg.voxel)
    host = build_scene_host(pts, n, cfg.voxel, cfg.caps.max_voxels)
    batch = {k: jnp.asarray(v)[None] for k, v in host.items()}
    losses, _ = forward(cfg, {"params": state.params,
                              "batch_stats": state.batch_stats},
                        batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(losses["loss"]))
