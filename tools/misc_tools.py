#!/usr/bin/env python
"""Misc utilities — counterparts of ``tools/misc/print_config.py``,
``tools/misc/browse_dataset.py`` (textual), ``tools/model_converters/
publish_model.py`` and ``tools/analysis_tools/analyze_logs.py``.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomae_tpu import config as C  # noqa: E402


def print_config(args):
    cfg = {"pretrain": C.geomae_pretrain_nus,
           "finetune": C.geomae_finetune_nus,
           "tiny_pretrain": C.tiny_pretrain_config,
           "tiny_finetune": C.tiny_finetune_config}[args.config]()
    pprint.pprint(dataclasses.asdict(cfg))


def publish_model(args):
    """Strip optimizer state: full TrainState ckpt -> weights-only export."""
    import jax

    from geomae_tpu.train.checkpoint import (CheckpointManager, save_weights)
    from geomae_tpu.train import finetune as FT
    from geomae_tpu.train import pretrain as PT

    if args.task == "pretrain":
        cfg = C.geomae_pretrain_nus() if not args.tiny \
            else C.tiny_pretrain_config()
        state, _ = PT.init_state(cfg, 1, jax.random.PRNGKey(0))
    else:
        cfg = C.geomae_finetune_nus() if not args.tiny \
            else C.tiny_finetune_config()
        state, _ = FT.init_state(cfg, 1, jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt_dir).restore(state)
    save_weights(args.out, state.params, state.batch_stats)
    print(f"published weights-only checkpoint -> {args.out}")


def analyze_logs(args):
    """Average iter time / plot-less loss summary from metrics.jsonl."""
    rows = [json.loads(l) for l in open(args.log)]
    if not rows:
        print("empty log")
        return
    keys = [k for k in rows[-1] if k.startswith("loss")]
    n = len(rows)
    it = sum(r.get("iter_time", 0) for r in rows) / n
    print(f"{n} log points, mean iter_time {it:.4f}s")
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        print(f"  {k}: first {vals[0]:.4f} last {vals[-1]:.4f} "
              f"min {min(vals):.4f}")


def browse_dataset(args):
    import numpy as np

    from geomae_tpu.data.nuscenes import NuScenesSSLDataset
    cfg = C.geomae_pretrain_nus()
    cfg = C.replace(cfg, data=C.replace(cfg.data, data_root=args.data_root,
                                        ann_file=args.ann_file))
    ds = NuScenesSSLDataset(cfg.data, cfg.voxel, cfg.caps)
    for i in range(min(args.n, len(ds))):
        s = ds.__getitem__(i, seed=0)
        pts = s["points"][s["point_valid"]]
        print(f"frame {i}: {len(pts)} pts, x[{pts[:,0].min():.1f},"
              f"{pts[:,0].max():.1f}] z[{pts[:,2].min():.1f},"
              f"{pts[:,2].max():.1f}] sweeps dt max {pts[:,4].max():.2f}s")


def visualize_results(args):
    """Run inference on N frames and dump .obj/.png visualizations (the
    reference ``tools/misc/visualize_results.py`` + ``show_result`` role;
    synthetic scenes when no dataset is given)."""
    import numpy as np

    import jax

    from geomae_tpu.apis import Detector3D
    from geomae_tpu.core.visualize import show_result

    cfg = C.tiny_finetune_config() if args.tiny else C.geomae_finetune_nus()
    det = Detector3D(cfg, args.ckpt_dir)
    rng = np.random.default_rng(0)
    r = cfg.voxel.point_cloud_range
    for i in range(args.n):
        P = cfg.caps.max_points
        pts = rng.uniform([r[0], r[1], r[2], 0, 0],
                          [r[3], r[4], r[5], 1, 0.4],
                          (P, 5)).astype(np.float32)
        out = det(pts)
        sel = out["scores"] >= args.score_thr
        written = show_result(pts[:, :3], None, out["boxes"][sel],
                              args.out_dir, f"frame{i:04d}",
                              scores=out["scores"][sel])
        print(f"frame{i:04d}: {int(sel.sum())} boxes -> "
              + ", ".join(written.values()))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("print_config")
    pc.add_argument("config", choices=["pretrain", "finetune",
                                       "tiny_pretrain", "tiny_finetune"])
    pm = sub.add_parser("publish_model")
    pm.add_argument("--ckpt-dir", required=True)
    pm.add_argument("--out", required=True)
    pm.add_argument("--task", choices=["pretrain", "finetune"],
                    default="pretrain")
    pm.add_argument("--tiny", action="store_true")
    al = sub.add_parser("analyze_logs")
    al.add_argument("--log", required=True)
    bd = sub.add_parser("browse_dataset")
    bd.add_argument("--data-root", default="data/nuscenes")
    bd.add_argument("--ann-file", default="nuscenes_ssl_infos_train.pkl")
    bd.add_argument("-n", type=int, default=5)
    vr = sub.add_parser("visualize_results")
    vr.add_argument("--ckpt-dir", default=None)
    vr.add_argument("--out-dir", default="viz")
    vr.add_argument("--tiny", action="store_true")
    vr.add_argument("--score-thr", type=float, default=0.3)
    vr.add_argument("-n", type=int, default=2)
    args = p.parse_args()
    dict(print_config=print_config, publish_model=publish_model,
         analyze_logs=analyze_logs, browse_dataset=browse_dataset,
         visualize_results=visualize_results)[args.cmd](args)


if __name__ == "__main__":
    main()
