"""The channel-major VFE path must match the row-major path: same params,
same outputs, same grads (interpret mode on CPU, bf16 compute like the
TPU configuration that selects it)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import geomae_tpu.models.vfe as vfe_mod
from geomae_tpu.config import geomae_pretrain_nus
from geomae_tpu.models.vfe import DynamicScatterVFE
from geomae_tpu.ops.voxelize import build_scene_batch


def small_scene(rng, cfg, B=2, P=512):
    r = cfg.voxel.point_cloud_range
    pts = rng.uniform([r[0], r[1], r[2], 0, 0],
                      [r[3] - 1e-3, r[4] - 1e-3, r[5] - 1e-3, 1, 0.45],
                      (B, P, 5)).astype(np.float32)
    valid = np.ones((B, P), bool)
    valid[:, -40:] = False
    return build_scene_batch(jnp.asarray(pts), jnp.asarray(valid),
                             cfg.voxel, 256)


@pytest.mark.slow
def test_vfe_transposed_matches_rowmajor(rng, monkeypatch):
    cfg = geomae_pretrain_nus()
    scene = small_scene(rng, cfg)
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.bfloat16)
    variables = vfe.init(jax.random.PRNGKey(0), scene, train=False)

    ref = vfe.apply(variables, scene, train=False)  # row-major scan path

    monkeypatch.setattr(vfe_mod, "_use_transposed", lambda P, d: True)
    # chunk contract needs P % 512 == 0: P = 512 here
    with pltpu.force_tpu_interpret_mode():
        got = vfe.apply(variables, scene, train=False)

    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)  # bf16 reassociation


@pytest.mark.slow
def test_vfe_transposed_train_grads(rng, monkeypatch):
    cfg = geomae_pretrain_nus()
    scene = small_scene(rng, cfg)
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.bfloat16)
    variables = vfe.init(jax.random.PRNGKey(0), scene, train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def loss(p, transposed):
        monkeypatch.setattr(vfe_mod, "_use_transposed",
                            lambda P, d: transposed)
        out, _ = vfe.apply({"params": p, "batch_stats": bstats}, scene,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    gref = jax.grad(loss)(params, False)
    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss)(params, True)

    flat_r = jax.tree_util.tree_leaves_with_path(gref)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(gt))
    for path, r in flat_r:
        t = flat_t[path]
        rn = np.asarray(r, np.float32)
        tn = np.asarray(t, np.float32)
        scale = max(np.abs(rn).max(), 1e-3)
        np.testing.assert_allclose(tn / scale, rn / scale, atol=5e-2,
                                   err_msg=str(path))