"""Smaller zoo components: circle NMS, focal masking, losses, pillar nets."""
import jax
import jax.numpy as jnp
import numpy as np

from geomae_tpu.config import tiny_pretrain_config
from geomae_tpu.models import losses
from geomae_tpu.models.mae import sample_focal_mask
from geomae_tpu.ops.rotated_iou import circle_nms
from geomae_tpu.ops.voxelize import build_scene_batch


def test_circle_nms():
    centers = jnp.asarray([[0., 0], [0.5, 0], [5, 5], [5.2, 5]])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(circle_nms(centers, scores, jnp.ones(4, bool),
                                 min_radius=1.0, max_out=10))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_focal_mask(rng):
    cfg = tiny_pretrain_config()
    P = cfg.caps.max_points
    r = cfg.voxel.point_cloud_range
    pts = rng.uniform([r[0], r[1], -2], [r[3], r[4], 0],
                      (P, 3)).astype(np.float32)[None]
    valid = np.ones((1, P), bool)
    scene = build_scene_batch(jnp.asarray(pts), jnp.asarray(valid),
                              cfg.voxel, 2048)  # > 40*40 cells: no overflow
    # one big GT box covering the first quadrant
    boxes = np.zeros((1, 4, 9), np.float32)
    boxes[0, 0] = [2.5, 2.5, -2, 5, 5, 4, 0, 0, 0]
    gmask = np.zeros((1, 4), bool)
    gmask[0, 0] = True
    keep = sample_focal_mask(jax.random.PRNGKey(0), scene.table,
                             jnp.asarray(boxes), jnp.asarray(gmask),
                             cfg.voxel, mask_ratio=0.7)
    keep = np.asarray(keep)[0]
    coords = np.asarray(scene.table.coords)[0]
    tvalid = np.asarray(scene.table.valid)[0]
    vx = cfg.voxel.voxel_size[0]
    cx = coords[:, 1] * vx + r[0]
    cy = coords[:, 0] * vx + r[1]
    fg = (cx >= 0) & (cx <= 5) & (cy >= 0) & (cy <= 5) & tvalid
    bg = tvalid & ~fg
    # background always kept; foreground ~30% kept
    assert keep[bg].all()
    frac = keep[fg].mean()
    assert 0.2 < frac < 0.4


def test_chamfer_and_iou_losses(rng):
    a = rng.normal(size=(20, 3)).astype(np.float32)
    s2d, d2s = losses.chamfer_distance(jnp.asarray(a), jnp.asarray(a))
    assert float(s2d) < 1e-10 and float(d2s) < 1e-10
    box = jnp.asarray([[0, 0, 0, 2, 2, 2.]])
    assert abs(float(losses.axis_aligned_iou_loss(box, box)[0])) < 1e-6
    box2 = jnp.asarray([[1, 0, 0, 3, 2, 2.]])
    v = float(losses.axis_aligned_iou_loss(box, box2)[0])
    assert 0 < v < 1


def test_focal_loss_matches_reference_formula(rng):
    logits = rng.normal(size=(10, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 10)  # 3 = background
    got = np.asarray(losses.sigmoid_focal_loss(jnp.asarray(logits),
                                               jnp.asarray(labels), 3))
    p = 1 / (1 + np.exp(-logits))
    onehot = np.eye(4)[labels][:, :3]
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    ce = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p))
    want = (alpha_t * (1 - pt) ** 2 * ce).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_box_mode_round_trips():
    """Every src->dst->src with default mats is the identity, and sizes
    stay positive/permutation-consistent (reference box_3d_mode.py)."""
    from geomae_tpu.core.box_modes import Box3DMode, convert
    rng = np.random.default_rng(3)
    boxes = np.concatenate([
        rng.normal(0, 10, (20, 3)),
        rng.uniform(0.5, 4.0, (20, 3)),
        rng.uniform(-np.pi, np.pi, (20, 1)),
        rng.normal(0, 2, (20, 2)),          # velocity passthrough
    ], -1)
    modes = [Box3DMode.LIDAR, Box3DMode.CAM, Box3DMode.DEPTH]
    for a in modes:
        for b in modes:
            if a == b:
                continue
            back = convert(convert(boxes, a, b), b, a)
            np.testing.assert_allclose(back, boxes, atol=1e-12)
    # explicit known mapping: lidar (x front, y left) -> depth
    # (x right, y front): depth_x = -lidar_y, depth_y = lidar_x
    ld = convert(boxes, Box3DMode.LIDAR, Box3DMode.DEPTH)
    np.testing.assert_allclose(ld[:, 0], -boxes[:, 1])
    np.testing.assert_allclose(ld[:, 1], boxes[:, 0])
    np.testing.assert_allclose(ld[:, 3], boxes[:, 4])  # dx' = dy
    # rt_mat with translation applies to centers only
    rt = np.eye(4); rt[:3, 3] = [1.0, 2.0, 3.0]
    shifted = convert(boxes, Box3DMode.LIDAR, Box3DMode.CAM, rt_mat=rt)
    np.testing.assert_allclose(shifted[:, :3], boxes[:, :3] + [1, 2, 3])


def test_fast_layer_norm_matches_autodiff():
    """fast_layer_norm forward == flax nn.LayerNorm; custom VJP == autodiff."""
    import flax.linen as nn

    from geomae_tpu.models.norm import fast_layer_norm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 64, 128)).astype(np.float32)) * 3 + 1
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

    ref_mod = nn.LayerNorm(epsilon=1e-5)
    ref = ref_mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = fast_layer_norm(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    dy = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def f_ref(x_, s_, b_):
        return jnp.sum(ref_mod.apply({"params": {"scale": s_, "bias": b_}},
                                     x_) * dy)

    def f_got(x_, s_, b_):
        return jnp.sum(fast_layer_norm(x_, s_, b_, 1e-5) * dy)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    g_got = jax.grad(f_got, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_sst_stack_pair_equals_two_stacks():
    """SSTStackPair (branch axis on batch, grouped params) == running two
    independent SSTStacks whose params are the per-branch slices."""
    import jax.numpy as jnp

    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.models.sst import (SSTStack, SSTStackPair,
                                       prepare_shift_data)
    from geomae_tpu.ops.windows import make_layouts, positional_embedding, \
        window_ids

    rng = np.random.default_rng(0)
    sst = SSTConfig(d_model=32, nhead=4, dim_feedforward=64,
                    attention_impl="einsum")
    voxel = VoxelConfig(point_cloud_range=(-5.12, -5.12, -5.0,
                                           5.12, 5.12, 3.0))
    B, V, C = 2, 128, 32
    ny, nx = voxel.grid_size
    keys = np.stack([rng.choice(ny * nx, V, replace=False)
                     for _ in range(B)])
    coords = jnp.asarray(np.stack([keys // nx, keys % nx], -1)
                         .astype(np.int32))
    valid = jnp.asarray(np.ones((B, V), bool))
    lays = make_layouts(coords, valid, sst, voxel)
    pos = [positional_embedding(
        jax.vmap(lambda c, m, ss=s: window_ids(c, m, ss, sst, voxel)[1])(
            coords, valid), sst) for s in sst.shifts]
    data = prepare_shift_data(lays, pos, valid)
    x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))

    pair = SSTStackPair(sst, num_blocks=2, groups=2)
    vars_ = pair.init(jax.random.PRNGKey(1), x, data)
    out = pair.apply(vars_, x, data)          # [2, B, V, C]

    # slice branch g out of every grouped leaf -> plain-stack params
    def slice_branch(tree, g):
        import flax.traverse_util as tu
        flat = tu.flatten_dict(tree)
        out_t = {}
        for path, leaf in flat.items():
            out_t[path] = leaf[:, g]          # [n_blocks, G, ...] -> [n, ...]
        return tu.unflatten_dict(out_t)

    single = SSTStack(sst, num_blocks=2)
    for g in range(2):
        p = slice_branch(vars_["params"], g)
        ref = single.apply({"params": p}, x, data)
        np.testing.assert_allclose(np.asarray(out[g]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
