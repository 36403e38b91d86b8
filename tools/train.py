#!/usr/bin/env python
"""Train CLI — the ``tools/train.py`` counterpart
(``/root/reference/tools/train.py:97-228``).

Examples:
  # GeoMAE pretrain on nuScenes SSL infos
  python tools/train.py pretrain --data-root data/nuscenes \
      --ann-file nuscenes_ssl_infos_train.pkl --work-dir work_dirs/pretrain

  # detection fine-tune from a pretrain checkpoint
  python tools/train.py finetune --data-root data/nuscenes \
      --ann-file nuscenes_infos_train.pkl --load-from work_dirs/pretrain/ckpt \
      --work-dir work_dirs/finetune

  # smoke-run on synthetic data (no dataset needed)
  python tools/train.py pretrain --synthetic --total-steps 20 --tiny
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from geomae_tpu import config as C  # noqa: E402
from geomae_tpu.data.loader import PrefetchLoader  # noqa: E402
from geomae_tpu.train.trainer import Trainer  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="geomae-tpu trainer")
    p.add_argument("task", choices=["pretrain", "finetune"])
    p.add_argument("--preset", default="nus",
                   choices=["nus", "waymo", "nus_centerhead"],
                   help="config family (dataset geometry + model variant)")
    p.add_argument("--work-dir", default="work_dirs/run")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch (default: 4 * n_devices)")
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--load-from", default=None,
                   help="weights-only init (fine-tune from pretrain ckpt)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated scenes (smoke tests)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CPU-friendly)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--cbgs", action="store_true", default=None)
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run the eval hook every N steps (0 = end only; "
                        "the reference's evaluation=dict(interval=...))")
    p.add_argument("--eval-frames", type=int, default=8,
                   help="frames per eval-hook pass")
    p.add_argument("--platform", default=None,
                   help="force jax platform (e.g. cpu); note JAX_PLATFORMS "
                        "env can be overridden by site TPU plugins")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   metavar="KEY=VAL",
                   help="dotted-path config overrides, e.g. "
                        "optim.lr=3e-5 sst.d_model=256 "
                        "voxel.voxel_size=0.2,0.2,8 (the reference's "
                        "mmcv --cfg-options, tools/train.py:62-71)")
    return p.parse_args()


class _SyntheticSSL:
    def __init__(self, cfg, n=64):
        self.cfg, self.n = cfg, n

    def __len__(self):
        return self.n

    def __getitem__(self, idx, seed=None):
        from geomae_tpu.data.synthetic import synthetic_scene
        from geomae_tpu.data.transforms import pad_points
        rng = np.random.default_rng((seed or 0) + idx)
        pts, _, _ = synthetic_scene(rng, self.cfg.voxel.point_cloud_range,
                                    min(self.cfg.caps.max_points, 16384))
        p, v = pad_points(pts, self.cfg.caps.max_points)
        return dict(points=p, point_valid=v)


class _SyntheticDet(_SyntheticSSL):
    def __getitem__(self, idx, seed=None):
        from geomae_tpu.data.synthetic import synthetic_scene
        from geomae_tpu.data.transforms import pad_boxes, pad_points
        rng = np.random.default_rng((seed or 0) + idx)
        pts, boxes, labels = synthetic_scene(
            rng, self.cfg.voxel.point_cloud_range,
            min(self.cfg.caps.max_points, 16384))
        p, v = pad_points(pts, self.cfg.caps.max_points)
        b, l, m = pad_boxes(boxes, labels, self.cfg.max_gt_boxes)
        return dict(points=p, point_valid=v, gt_boxes=b, gt_labels=l,
                    gt_mask=m)


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    n_dev = len(jax.devices())
    if args.task == "pretrain":
        if args.preset == "waymo":
            cfg = C.tiny_pretrain_waymo_config() if args.tiny \
                else C.geomae_pretrain_waymo()
        else:
            cfg = C.tiny_pretrain_config() if args.tiny \
                else C.geomae_pretrain_nus()
    else:
        if args.preset == "nus_centerhead":
            cfg = C.tiny_finetune_center_config() if args.tiny \
                else C.geomae_finetune_nus_centerhead()
        else:
            cfg = C.tiny_finetune_config() if args.tiny \
                else C.geomae_finetune_nus()
    if args.ann_file or args.data_root:
        cfg = C.replace(cfg, data=C.replace(
            cfg.data, data_root=args.data_root,
            ann_file=args.ann_file or cfg.data.ann_file))
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)

    batch = args.batch_size or cfg.data.batch_size * n_dev

    # dataset
    if args.synthetic:
        ds = (_SyntheticSSL if args.task == "pretrain" else _SyntheticDet)(cfg)
    elif args.task == "pretrain":
        if args.preset == "waymo":
            from geomae_tpu.data.waymo import WaymoSSLDataset
            ds = WaymoSSLDataset(cfg.data, cfg.voxel, cfg.caps,
                                 load_dims=cfg.data.load_dim,
                                 use_dims=cfg.data.use_dim)
        else:
            from geomae_tpu.data.nuscenes import NuScenesSSLDataset
            ds = NuScenesSSLDataset(cfg.data, cfg.voxel, cfg.caps)
    elif args.preset == "waymo":
        from geomae_tpu.data.waymo import WaymoDataset
        ds = WaymoDataset(cfg.data, cfg.voxel, cfg.caps, cfg.max_gt_boxes,
                          load_dims=cfg.data.load_dim,
                          use_dims=cfg.data.use_dim)
    else:
        from geomae_tpu.data.nuscenes import CBGSDataset, NuScenesDetDataset
        ds = NuScenesDetDataset(cfg.data, cfg.voxel, cfg.caps,
                                cfg.max_gt_boxes)
        if args.cbgs or (args.cbgs is None and not args.tiny):
            ds = CBGSDataset(ds)

    steps_per_epoch = max(len(ds) // batch, 1)
    if args.total_steps:
        total = args.total_steps
    else:
        epochs = args.epochs or (72 if args.task == "pretrain" else 20)
        total = steps_per_epoch * epochs
    cfg = C.replace(cfg, optim=C.replace(cfg.optim, total_steps=total))

    loader = PrefetchLoader(ds, batch, num_workers=args.num_workers,
                            seed=args.seed)

    rng = jax.random.PRNGKey(args.seed)
    eval_fn = eval_loader = None
    if args.task == "pretrain":
        from geomae_tpu.train.pretrain import (init_state, make_eval_hook,
                                               make_train_step)
        state, tx = init_state(cfg, batch, rng)
        step = make_train_step(cfg, tx)
        with_rng = True
        if args.eval_interval:
            eval_fn = make_eval_hook(cfg)
            n_eval = max(args.eval_frames // batch, 1)
            eval_loader = [
                {k: np.stack([ds.__getitem__((j * batch + i) % len(ds),
                                             seed=10**6)[k]
                              for i in range(batch)])
                 for k in ("points", "point_valid")}
                for j in range(n_eval)]
    else:
        from geomae_tpu.train.checkpoint import load_weights
        from geomae_tpu.train.finetune import init_state, make_train_step
        pre = None
        if args.load_from:
            pre = load_weights(args.load_from).get("params")
        state, tx = init_state(cfg, batch, rng, pretrain_params=pre)
        step = make_train_step(cfg, tx)
        with_rng = False

    trainer = Trainer(step, state, loader, args.work_dir, total,
                      with_rng=with_rng, seed=args.seed,
                      resume=not args.no_resume,
                      eval_fn=eval_fn, eval_loader=eval_loader,
                      eval_interval=args.eval_interval)
    trainer.run()


if __name__ == "__main__":
    main()
