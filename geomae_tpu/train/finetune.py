"""Detection fine-tune: init (with pretrain weight import) + train/predict.

Counterpart of the reference fine-tune run (SURVEY.md §3.2): cyclic-20e
AdamW with cyclic momentum, grad clip 35, CBGS data, encoder initialized
from the GeoMAE pretrain checkpoint (weights-only ``load_from``).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..config import FinetuneConfig
from ..models.anchor_head import head_loss, predict
from ..models.anchors import grid_anchors
from ..models.detector import DynamicVoxelNet, extract_scene
from .optim import make_optimizer
from .state import TrainState


def head_featmap_size(cfg: FinetuneConfig) -> Tuple[int, int]:
    ny, nx = cfg.voxel.grid_size
    s = cfg.second.layer_strides[0]          # FPN upsamples back to stage-0
    return ny // s, nx // s


def dummy_batch(cfg: FinetuneConfig, batch_size: int, seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    from ..data.synthetic import synthetic_scene
    from ..data.transforms import pad_boxes, pad_points

    P = cfg.caps.max_points
    pts_l, pv_l, gb_l, gl_l, gm_l = [], [], [], [], []
    for _ in range(batch_size):
        pts, boxes, labels = synthetic_scene(
            rng, cfg.voxel.point_cloud_range, min(P, 8192))
        p, v = pad_points(pts, P)
        b, l, m = pad_boxes(boxes, labels, cfg.max_gt_boxes)
        pts_l.append(p); pv_l.append(v)
        gb_l.append(b); gl_l.append(l); gm_l.append(m)
    return dict(points=jnp.asarray(np.stack(pts_l)),
                point_valid=jnp.asarray(np.stack(pv_l)),
                gt_boxes=jnp.asarray(np.stack(gb_l)),
                gt_labels=jnp.asarray(np.stack(gl_l)),
                gt_mask=jnp.asarray(np.stack(gm_l)))


def init_state(cfg: FinetuneConfig, batch_size: int, rng: jax.Array,
               pretrain_params=None) -> Tuple[TrainState, object]:
    model = DynamicVoxelNet(cfg)
    batch = dummy_batch(cfg, batch_size)
    scene = jax.jit(lambda p, v: extract_scene(cfg, p, v))(
        batch["points"], batch["point_valid"])
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, scene)
    params = variables["params"]
    if pretrain_params is not None:
        params = load_pretrained(params, pretrain_params)
    tx = make_optimizer(cfg.optim)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params)), tx


def load_pretrained(params, pretrain_params):
    """Weights-only import of matching sub-trees (``load_from`` semantics):
    the GeoMAE ``voxel_encoder`` and ``encoder`` blocks share names with the
    detector, so any leaf with an identically-shaped counterpart copies."""
    flat_d = flax.traverse_util.flatten_dict(params)
    flat_p = flax.traverse_util.flatten_dict(pretrain_params)
    n = 0
    for k, v in flat_p.items():
        if k in flat_d and flat_d[k].shape == v.shape:
            flat_d[k] = v
            n += 1
    assert n > 0, "no pretrained weights matched the detector"
    from ..utils.logging import get_root_logger
    get_root_logger().info(
        "imported %d/%d pretrained leaves into the detector", n, len(flat_d))
    return flax.traverse_util.unflatten_dict(flat_d)


def make_train_step(cfg: FinetuneConfig, tx):
    model = DynamicVoxelNet(cfg)
    anchors = jnp.asarray(grid_anchors(cfg.head, head_featmap_size(cfg)))

    def loss_fn(params, batch_stats, batch):
        scene = extract_scene(cfg, batch["points"], batch["point_valid"])
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            scene, train=True, mutable=["batch_stats"])
        if cfg.head_type == "center":
            from ..models.center_head import center_head_loss
            losses = center_head_loss(out, batch["gt_boxes"],
                                      batch["gt_labels"], batch["gt_mask"],
                                      cfg.center_head, cfg.voxel)
        else:
            losses = head_loss(out, anchors, batch["gt_boxes"],
                               batch["gt_labels"], batch["gt_mask"], cfg.head)
        losses["loss"] = sum(losses.values())
        return losses["loss"], (losses, mut["batch_stats"])

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        new_state = state.apply_gradients(grads, tx, new_stats)
        return new_state, losses

    return train_step


def make_predict_fn(cfg: FinetuneConfig, wnms: bool = False):
    """Jittable prediction fn; with ``wnms`` the decode runs on device and
    the weighted-NMS merge on host (reference wnms_cpu branch) — the
    returned fn jits its device half itself, so do NOT wrap it in jit."""
    model = DynamicVoxelNet(cfg)
    anchors = jnp.asarray(grid_anchors(cfg.head, head_featmap_size(cfg)))

    def head_out(state: TrainState, batch):
        scene = extract_scene(cfg, batch["points"], batch["point_valid"])
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            scene, train=False)

    if wnms:
        if cfg.head_type == "center":
            raise ValueError("wnms applies to the anchor head only")
        from ..models.anchor_head import decode_pre_nms, predict_wnms

        decode = jax.jit(
            lambda s, b: decode_pre_nms(head_out(s, b), anchors, cfg.head))

        def predict_fn(state: TrainState, batch):
            return predict_wnms(*decode(state, batch), cfg.head)

        return predict_fn

    def predict_fn(state: TrainState, batch):
        out = head_out(state, batch)
        if cfg.head_type == "center":
            from ..models.center_head import center_head_decode
            return center_head_decode(out, cfg.center_head, cfg.voxel)
        return predict(out, anchors, cfg.head)

    return predict_fn
