"""CenterHead: gaussian targets, loss, decode, end-to-end tiny train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_finetune_center_config
from geomae_tpu.models import center_head as CH
from geomae_tpu.train import finetune as FT


@pytest.fixture(scope="module")
def cfg():
    return tiny_finetune_center_config()


def test_gaussian_targets(cfg):
    c = cfg.center_head
    H = W = 10
    G = 8
    boxes = np.zeros((G, 9), np.float32)
    # one car-sized box centered mid-grid; grid cell = voxel*factor = 1 m
    boxes[0] = [0.5, 0.5, -1.5, 2.0, 4.0, 1.5, 0.3, 1.0, 0.5]
    labels = np.zeros(G, np.int32)
    mask = np.zeros(G, bool)
    mask[0] = True
    tg = CH.compute_center_targets(jnp.asarray(boxes), jnp.asarray(labels),
                                   jnp.asarray(mask), c, cfg.voxel, (H, W))
    hm = np.asarray(tg.heatmap)
    # center pixel: x = (0.5 + 5)/1 = 5.5 -> ix 5 (range -5..5, cell 1 m)
    assert hm.shape == (c.num_classes, H, W)
    assert hm[0, 5, 5] == 1.0
    assert hm[0].max() == 1.0 and hm[1:].max() == 0.0
    # gaussian decays monotonically from the center
    assert hm[0, 5, 6] < 1.0 and hm[0, 5, 6] > hm[0, 5, 7] >= 0.0
    # anno: fractional offset + gravity z + log dims + sin/cos + vel
    a = np.asarray(tg.anno)[0]
    np.testing.assert_allclose(a[0], 0.5, atol=1e-5)
    np.testing.assert_allclose(a[2], -1.5 + 0.75, atol=1e-5)
    np.testing.assert_allclose(a[3:6], np.log([2, 4, 1.5]), atol=1e-5)
    np.testing.assert_allclose(a[6], np.sin(0.3), atol=1e-6)
    np.testing.assert_allclose(a[8:10], [1.0, 0.5], atol=1e-6)
    assert int(tg.inds[0]) == 5 * W + 5
    assert bool(tg.mask[0]) and not bool(tg.mask[1])


@pytest.mark.slow
def test_center_train_step_and_decode(cfg):
    state, tx = FT.init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    step = jax.jit(FT.make_train_step(cfg, tx))
    batch = FT.dummy_batch(cfg, batch_size=2, seed=3)
    first = None
    for _ in range(4):
        state, losses = step(state, batch)
        if first is None:
            first = float(losses["loss"])
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["loss"]) < first
    assert any(k.endswith("loss_heatmap") for k in losses)

    det = jax.jit(FT.make_predict_fn(cfg))(state, batch)
    assert det.boxes.shape[-1] == 9
    v = np.asarray(det.valid)
    if v.any():
        lb = np.asarray(det.labels)[v]
        assert np.all((lb >= 0) & (lb < cfg.center_head.num_classes))


def test_per_task_nms_thresholds(cfg):
    """Tuple nms_thr (the waymo variant's use_mul_nms) decodes fine and a
    0-threshold task suppresses all but one box per cluster."""
    from geomae_tpu.config import replace

    n_tasks = len(cfg.center_head.tasks)
    ch = replace(cfg.center_head, nms_thr=(0.0,) * n_tasks)
    cfg2 = replace(cfg, center_head=ch)
    state, _ = FT.init_state(cfg2, batch_size=1, rng=jax.random.PRNGKey(0))
    batch = FT.dummy_batch(cfg2, batch_size=1, seed=5)
    det0 = jax.jit(FT.make_predict_fn(cfg))(state, batch)
    det = jax.jit(FT.make_predict_fn(cfg2))(state, batch)
    assert det.boxes.shape == det0.boxes.shape
    # threshold 0 is strictly more suppressive than the default
    assert int(np.asarray(det.valid).sum()) <= int(
        np.asarray(det0.valid).sum())
