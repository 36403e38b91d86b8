#!/usr/bin/env python
"""Import a released GeoMAE torch checkpoint into a flax weights export.

Maps the reference's torch state_dict (``/root/reference/README.md:53-57``
Google-Drive checkpoints, mmcv ``{state_dict, optimizer, meta}`` pickles)
onto our parameter trees and writes a weights-only orbax export consumable
by ``tools/train.py --load-from`` / ``geomae_tpu.apis.init_model``.

Usage:
  python tools/import_torch_ckpt.py pretrain  geomae_ckpt.pth out_dir
  python tools/import_torch_ckpt.py finetune  detector_ckpt.pth out_dir \
      [--config nus|nus_centerhead]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["pretrain", "finetune"])
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default="nus",
                    help="preset name (nus | nus_centerhead | waymo | tiny)")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for tree init (cpu is fine)")
    args = ap.parse_args()
    jax.config.update("jax_platforms", args.platform)

    from geomae_tpu import config as cfgs
    from geomae_tpu.train.checkpoint import save_weights
    from geomae_tpu.train.torch_import import (import_torch_weights,
                                               load_torch_state_dict)

    if args.kind == "pretrain":
        from geomae_tpu.train.pretrain import init_state
        cfg = {"nus": cfgs.geomae_pretrain_nus,
               "waymo": cfgs.geomae_pretrain_waymo,
               "tiny": cfgs.tiny_pretrain_config}[args.config]()
    else:
        from geomae_tpu.train.finetune import init_state
        cfg = {"nus": cfgs.geomae_finetune_nus,
               "nus_centerhead": cfgs.geomae_finetune_nus_centerhead,
               "tiny": cfgs.tiny_finetune_config}[args.config]()

    sd = load_torch_state_dict(args.torch_ckpt)
    state, _ = init_state(cfg, 1, jax.random.PRNGKey(0))
    params, stats, report = import_torch_weights(
        state.params, state.batch_stats, sd, args.kind)

    print(f"matched {len(report['matched'])} leaves")
    if report["missing"]:
        print(f"WARNING: {len(report['missing'])} flax leaves unmatched:")
        for k in report["missing"][:20]:
            print("  ", k)
    if report["unconsumed"]:
        print(f"note: {len(report['unconsumed'])} reference keys unused "
              "(aux/optimizer keys are expected here):")
        for k in report["unconsumed"][:20]:
            print("  ", k)

    save_weights(args.out_dir, params, stats)
    print(f"wrote weights-only export -> {args.out_dir}")


if __name__ == "__main__":
    main()
