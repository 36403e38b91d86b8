"""Detection fine-tune: assignment, loss, train step, predict, weight import."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_finetune_config, tiny_pretrain_config
from geomae_tpu.models import anchor_head as AH
from geomae_tpu.models.anchors import grid_anchors, num_anchors_per_cell
from geomae_tpu.train import finetune as FT


@pytest.fixture(scope="module")
def cfg():
    return tiny_finetune_config()


def test_grid_anchors_layout(cfg):
    a = grid_anchors(cfg.head, (20, 20))
    A = num_anchors_per_cell(cfg.head)
    assert a.shape == (20 * 20 * A, 9)
    a = a.reshape(20, 20, len(cfg.head.anchor_sizes), 2, 9)
    # first cell center: range_min + step/2
    step = (4.8 - (-4.8)) / 20
    assert abs(a[0, 0, 0, 0, 0] - (-4.8 + step / 2)) < 1e-5
    assert abs(a[0, 0, 0, 0, 1] - (-4.8 + step / 2)) < 1e-5
    # x varies along axis 1, y along axis 0
    assert abs(a[0, 1, 0, 0, 0] - a[0, 0, 0, 0, 0] - step) < 1e-5
    assert abs(a[1, 0, 0, 0, 1] - a[0, 0, 0, 0, 1] - step) < 1e-5
    # rotations + sizes
    assert abs(a[0, 0, 0, 1, 6] - 1.57) < 1e-6
    np.testing.assert_allclose(a[0, 0, 2, 0, 3:6],
                               cfg.head.anchor_sizes[2], rtol=1e-6)


def test_assignment_semantics(cfg):
    """Hand-built scene: one anchor right on a GT -> pos; far -> neg."""
    anchors = jnp.asarray(grid_anchors(cfg.head, (20, 20)))
    # GT exactly matching the car anchor at some cell
    gt = np.zeros((4, 9), np.float32)
    gt[0] = [-2.16, -2.16, -1.8, *cfg.head.anchor_sizes[0], 0.0, 0, 0]
    labels = np.array([0, -1, -1, -1], np.int32)
    mask = np.array([True, False, False, False])
    tg = AH.assign_targets(anchors, jnp.asarray(gt), jnp.asarray(labels),
                           jnp.asarray(mask), cfg.head)
    n_pos = int(tg.num_pos)
    assert n_pos >= 1
    pos = np.asarray(tg.bbox_weights) > 0
    # positives carry the GT label (car = 0)
    assert np.all(np.asarray(tg.labels)[pos] == 0)
    # their regression targets should be small (anchor ~= gt)
    best = np.asarray(tg.bbox_targets)[pos]
    assert np.abs(best).max() < 1.5
    # plenty of negatives with weight 1, and bg label
    neg = (np.asarray(tg.label_weights) > 0) & ~pos
    assert neg.sum() > 1000
    assert np.all(np.asarray(tg.labels)[neg] == cfg.head.num_classes)


@pytest.mark.slow
def test_finetune_train_step_and_predict(cfg):
    state, tx = FT.init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    step = jax.jit(FT.make_train_step(cfg, tx))
    batch = FT.dummy_batch(cfg, batch_size=2, seed=3)
    first = None
    for _ in range(5):
        state, losses = step(state, batch)
        if first is None:
            first = float(losses["loss"])
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["loss"]) < first
    for k in ("loss_cls", "loss_bbox", "loss_dir"):
        assert np.isfinite(float(losses[k]))

    pred = jax.jit(FT.make_predict_fn(cfg))(state, batch)
    assert pred.boxes.shape == (2, cfg.head.max_num, 9)
    assert pred.scores.shape == (2, cfg.head.max_num)
    v = np.asarray(pred.valid)
    s = np.asarray(pred.scores)
    assert np.all(s[v] > cfg.head.score_thr)
    lb = np.asarray(pred.labels)
    assert np.all((lb[v] >= 0) & (lb[v] < cfg.head.num_classes))


def test_pretrain_weight_import(cfg):
    from geomae_tpu.train.pretrain import init_state as pre_init
    pcfg = tiny_pretrain_config()
    pstate, _ = pre_init(pcfg, batch_size=1, rng=jax.random.PRNGKey(0))
    state, _ = FT.init_state(cfg, batch_size=1, rng=jax.random.PRNGKey(1),
                             pretrain_params=pstate.params)
    # encoder stacked block kernels must equal the pretrain ones
    a = state.params["encoder"]["blocks"]["block"]["encoder_0"]["win_attn"]["q_proj"]["kernel"]
    b = pstate.params["encoder"]["blocks"]["block"]["encoder_0"]["win_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # vfe too
    a = state.params["voxel_encoder"]["vfe_0"]["linear"]["kernel"]
    b = pstate.params["voxel_encoder"]["vfe_0"]["linear"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("encoder", ["pillar", "simple"])
def test_voxelnet_hard_detector_forward(cfg, encoder):
    """VoxelNet wrapper (hard voxelization composition): forward shapes,
    finite outputs, and gradients flow through the encoder."""
    from geomae_tpu.models.detector import VoxelNet, extract_scene

    batch = FT.dummy_batch(cfg, batch_size=2, seed=7)
    scene = extract_scene(cfg, batch["points"], batch["point_valid"])
    model = VoxelNet(cfg, encoder=encoder, max_points_per_voxel=16)
    params = model.init(jax.random.PRNGKey(0), scene, train=False)

    outs, _ = model.apply(params, scene, train=True,
                          mutable=["batch_stats"])
    ny, nx = cfg.voxel.grid_size
    from geomae_tpu.models.anchors import num_anchors_per_cell
    A = num_anchors_per_cell(cfg.head)
    fy = outs.cls.shape[1]
    assert outs.cls.shape == (2, fy, fy, A * cfg.head.num_classes)
    assert outs.reg.shape[-1] == A * 9
    assert np.isfinite(np.asarray(outs.cls, np.float32)).all()

    if encoder == "pillar":
        def loss(p):
            o = model.apply(p, scene, train=False)
            return jnp.sum(o.cls.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(params)
        gk = g["params"]["voxel_encoder"]["pfn_0_linear"]["kernel"]
        assert float(jnp.abs(gk).sum()) > 0.0
