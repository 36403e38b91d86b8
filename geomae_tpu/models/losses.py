"""Detection losses (mmdet-semantics, masked static-shape versions).

Replaces the reference's ``build_loss`` usages: FocalLoss (sigmoid, gamma 2,
alpha 0.25), SmoothL1Loss (beta 1/9), CrossEntropyLoss for the direction
classifier (``configs/_base_/models/sst_base_nus.py:36-44``).  All functions
return elementwise losses; callers apply weights and divide by avg_factor,
matching mmdet's ``weight_reduce_loss`` convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, labels, num_classes: int,
                       gamma: float = 2.0, alpha: float = 0.25):
    """Per-anchor focal loss, summed over classes.

    labels in [0, num_classes] where num_classes = background (all-zero
    one-hot target, mmdet convention).
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, onehot)
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return jnp.sum(alpha_t * ((1 - p_t) ** gamma) * ce, axis=-1)


def _bce_with_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred, target, beta: float = 1.0 / 9.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def softmax_ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


# --- auxiliary losses of the reference zoo (models/losses/) ---------------


def chamfer_distance(src, dst, src_valid=None, dst_valid=None):
    """Symmetric L2 chamfer distance between padded point sets.

    Reference ``mmdet3d/models/losses/chamfer_distance.py`` semantics with
    masks instead of ragged tensors.  src [N, D], dst [M, D].
    Returns (loss_src->dst mean, loss_dst->src mean).
    """
    d2 = jnp.sum((src[:, None] - dst[None]) ** 2, -1)
    big = jnp.asarray(1e9, d2.dtype)
    if dst_valid is not None:
        d2 = jnp.where(dst_valid[None, :], d2, big)
    s2d = jnp.min(d2, axis=1)
    if src_valid is not None:
        d2s = jnp.where(src_valid[:, None], d2, big)
    else:
        d2s = d2
    dst2src = jnp.min(d2s, axis=0)

    def _mean(x, m):
        if m is None:
            return x.mean()
        return jnp.sum(jnp.where(m, x, 0)) / jnp.maximum(m.sum(), 1)

    return _mean(s2d, src_valid), _mean(dst2src, dst_valid)


def axis_aligned_iou_loss(pred, target):
    """1 - IoU of axis-aligned 3D boxes [..., 6] (x1y1z1x2y2z2)
    (reference ``models/losses/axis_aligned_iou_loss.py``)."""
    lt = jnp.maximum(pred[..., :3], target[..., :3])
    rb = jnp.minimum(pred[..., 3:], target[..., 3:])
    whd = jnp.clip(rb - lt, 0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]

    def vol(b):
        d = jnp.clip(b[..., 3:] - b[..., :3], 0)
        return d[..., 0] * d[..., 1] * d[..., 2]

    union = vol(pred) + vol(target) - inter
    return 1.0 - inter / jnp.maximum(union, 1e-8)
