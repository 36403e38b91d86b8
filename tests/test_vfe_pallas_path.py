"""VFE with the Pallas segment-reduce path (interpret mode) must match the
scan-based CPU path exactly (same reduction tree up to fp noise)."""
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
def test_vfe_pallas_matches_scan(rng, monkeypatch):
    cfg = geomae_pretrain_nus()
    scene = small_scene(rng, cfg)
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.float32)
    variables = vfe.init(jax.random.PRNGKey(0), scene, train=False)

    ref = vfe.apply(variables, scene, train=False)

    monkeypatch.setattr(vfe_mod, "_use_pallas", lambda P: True)
    # interpret mode computes exact f32, so the bf16-only max gate
    # (real-MXU truncation) is lifted to keep the pallas path covered
    monkeypatch.setattr(vfe_mod, "_pallas_max_dtype_ok", lambda d: True)
    with pltpu.force_tpu_interpret_mode():
        got = vfe.apply(variables, scene, train=False)

    # fp32 reassociation noise: the kernel sums via scan+matmul, the scan
    # path via cumsum diffs; coordinate sums are O(50)*O(20 points)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_vfe_pallas_train_stats_and_grad(rng, monkeypatch):
    """Forward (train-mode BN) + grads through the custom VJP stay finite
    and match the scan path."""
    cfg = geomae_pretrain_nus()
    scene = small_scene(rng, cfg)
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.float32)
    variables = vfe.init(jax.random.PRNGKey(0), scene, train=False)
    params = variables["params"]
    bstats = variables["batch_stats"]

    def loss(p, pallas):
        if pallas:
            monkeypatch.setattr(vfe_mod, "_use_pallas", lambda P: True)
            monkeypatch.setattr(vfe_mod, "_pallas_max_dtype_ok",
                                lambda d: True)
        else:
            monkeypatch.setattr(vfe_mod, "_use_pallas", lambda P: False)
        out, _ = vfe.apply({"params": p, "batch_stats": bstats}, scene,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2) / out.size

    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    with pltpu.force_tpu_interpret_mode():
        l_got, g_got = jax.value_and_grad(loss)(params, True)

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-4)

    def cmp(a, b):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4)

    jax.tree_util.tree_map(cmp, g_ref, g_got)
