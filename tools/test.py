#!/usr/bin/env python
"""Eval CLI — the ``tools/test.py`` counterpart
(``/root/reference/tools/test.py``): load a checkpoint, run inference over
the val set, compute nuScenes metrics (built-in numpy protocol) and/or dump
a devkit-compatible results JSON.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from geomae_tpu import config as C  # noqa: E402
from geomae_tpu.data.nuscenes import NUS_CLASSES, NuScenesDetDataset  # noqa: E402
from geomae_tpu.eval.nuscenes_eval import evaluate, format_results_json  # noqa: E402
from geomae_tpu.train import finetune as FT  # noqa: E402
from geomae_tpu.train.checkpoint import CheckpointManager  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="geomae-tpu eval")
    p.add_argument("--work-dir", required=True,
                   help="train work dir holding ckpt/")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default="nuscenes_infos_val.pkl")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--out", default=None, help="results JSON path")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--wnms", action="store_true",
                   help="weighted NMS (score-weighted box voting) instead "
                        "of hard NMS at test time (reference wnms_cpu)")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   metavar="KEY=VAL",
                   help="dotted-path config overrides (mmcv --cfg-options)")
    p.add_argument("--dataset", default="nuscenes",
                   choices=["nuscenes", "kitti", "waymo"],
                   help="dataset family; kitti scores with the KITTI "
                        "AP_R40 protocol, waymo with the Waymo AP/APH "
                        "protocol (eval/waymo_eval.py)")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = C.tiny_finetune_config() if args.tiny else C.geomae_finetune_nus()
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)
    cfg = C.replace(cfg, data=C.replace(cfg.data, data_root=args.data_root,
                                        ann_file=args.ann_file))

    if args.dataset == "nuscenes":
        ds = NuScenesDetDataset(cfg.data, cfg.voxel, cfg.caps,
                                cfg.max_gt_boxes, test_mode=True)
    else:
        from geomae_tpu.data.waymo import KittiDataset, WaymoDataset
        cls = KittiDataset if args.dataset == "kitti" else WaymoDataset
        ds = cls(cfg.data, cfg.voxel, cfg.caps, cfg.max_gt_boxes,
                 test_mode=True)
    n = len(ds) if args.max_frames is None else min(args.max_frames, len(ds))

    state, _ = FT.init_state(cfg, args.batch_size, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(args.work_dir, "ckpt"))
    state = ckpt.restore(state)
    predict = (FT.make_predict_fn(cfg, wnms=True) if args.wnms
               else jax.jit(FT.make_predict_fn(cfg)))

    # multi-process eval: each process strides over its share of frames and
    # results are all-gathered afterwards (the reference's multi_gpu_test +
    # collect_results contract, ``mmdet3d/apis/test.py:10``)
    from geomae_tpu.parallel.distributed import gather_results

    rank, world = jax.process_index(), jax.process_count()
    my_frames = list(range(rank, n, world))
    rows = []                                    # (token, pred, gt) triples
    bs = args.batch_size
    for start in range(0, len(my_frames), bs):
        idxs = my_frames[start:start + bs]
        n_real = len(idxs)
        while len(idxs) < bs:
            idxs.append(idxs[-1])
        samples = [ds.__getitem__(i, seed=0) for i in idxs]
        batch = {k: np.stack([s[k] for s in samples])
                 for k in ("points", "point_valid")}
        det = predict(state, batch)
        for j, i in enumerate(idxs[:n_real]):
            v = np.asarray(det.valid[j])
            pred = dict(boxes=np.asarray(det.boxes[j])[v],
                        scores=np.asarray(det.scores[j])[v],
                        labels=np.asarray(det.labels[j])[v])
            b, l = ds.get_ann(i)
            rows.append((ds.infos[i].get("token", str(i)), pred,
                         dict(boxes=b, labels=l)))
    rows = gather_results(rows)
    tokens = [r[0] for r in rows]
    preds = [r[1] for r in rows]
    gts = [r[2] for r in rows]

    if args.out:
        payload = format_results_json(tokens, preds, NUS_CLASSES)
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f)
        print(f"wrote {args.out}")
    if args.eval:
        if args.dataset == "nuscenes":
            metrics = evaluate(preds, gts, NUS_CLASSES)
        else:
            from geomae_tpu.data.waymo import WAYMO_CLASSES
            to_names = lambda f: dict(
                f, names=np.asarray([WAYMO_CLASSES[int(l)]
                                     for l in f["labels"]]))
            if args.dataset == "waymo":
                # Waymo AP/APH protocol (eval/waymo_eval.py); infos without
                # per-GT point counts score everything as LEVEL_1
                from geomae_tpu.eval.waymo_eval import evaluate_waymo
                metrics = evaluate_waymo([to_names(p) for p in preds],
                                         [to_names(g) for g in gts],
                                         classes=WAYMO_CLASSES)
            else:
                from geomae_tpu.eval.kitti_eval import evaluate_kitti
                metrics = evaluate_kitti([to_names(p) for p in preds],
                                         [to_names(g) for g in gts])
        print(json.dumps({k: round(v, 4) for k, v in metrics.items()},
                         indent=2))


if __name__ == "__main__":
    main()
