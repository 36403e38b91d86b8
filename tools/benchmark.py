#!/usr/bin/env python
"""Inference FPS benchmark — ``tools/analysis_tools/benchmark.py``
counterpart (``/root/reference/tools/analysis_tools/benchmark.py:63-91``):
measures detector forward FPS over synthetic or real frames with proper
device synchronization.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from geomae_tpu import config as C  # noqa: E402
from geomae_tpu.train import finetune as FT  # noqa: E402


def bench_host(args):
    """Host input-pipeline throughput: synthetic nuScenes-schema .bin files
    -> multi-sweep merge + augmentation (C++ core) + canonical scene build
    -> PrefetchLoader batches.  The device step at the 2x-A100 north star
    needs >=21 samples/s of host feed (VERDICT r1 #7); this measures it.
    """
    import pickle
    import tempfile

    from geomae_tpu.data.loader import PrefetchLoader
    from geomae_tpu.data.nuscenes import NuScenesSSLDataset

    cfg = C.geomae_pretrain_nus()
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="hostbench_")
    os.makedirs(os.path.join(tmp, "sweeps"), exist_ok=True)
    r = cfg.voxel.point_cloud_range

    def write_bin(path, n):
        pts = np.concatenate([
            rng.uniform([r[0], r[1], -3.0], [r[3], r[4], 1.0],
                        (n, 3)).astype(np.float32),
            rng.uniform(0, 255, (n, 1)).astype(np.float32),
            np.zeros((n, 1), np.float32),
        ], -1)
        pts.astype(np.float32).tofile(os.path.join(tmp, path))

    n_bins = 12
    for i in range(n_bins):
        write_bin(f"sweeps/s{i}.bin", 34000)
    infos = []
    for i in range(args.samples):
        sweeps = [dict(
            data_path=f"sweeps/s{(i + 1 + j) % n_bins}.bin",
            timestamp=(1e6 * (100 - 0.05 * (j + 1))),
            sensor2lidar_rotation=np.eye(3, dtype=np.float32),
            sensor2lidar_translation=np.zeros(3, np.float32),
        ) for j in range(cfg.data.sweeps_num)]
        infos.append(dict(lidar_path=f"sweeps/s{i % n_bins}.bin",
                          timestamp=1e8, sweeps=sweeps, token=str(i)))
    ann = os.path.join(tmp, "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)

    dcfg = C.replace(cfg.data, data_root=tmp, ann_file="infos.pkl")
    for precompute in (False, True):
        ds = NuScenesSSLDataset(dcfg, cfg.voxel, cfg.caps,
                                precompute_scene=precompute)
        loader = PrefetchLoader(ds, args.batch_size,
                                num_workers=args.num_workers, seed=0)
        n_seen = 0
        t0 = time.perf_counter()
        for batch in loader:
            n_seen += args.batch_size
        dt = time.perf_counter() - t0
        label = "prep+scene" if precompute else "prep"
        print(f"host pipeline [{label:10s}] {n_seen / dt:8.1f} samples/s "
              f"({args.num_workers} workers, batch {args.batch_size})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--host", action="store_true",
                   help="benchmark the host input pipeline instead")
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args()
    if args.host:
        bench_host(args)
        return

    cfg = C.tiny_finetune_config() if args.tiny else C.geomae_finetune_nus()
    state, _ = FT.init_state(cfg, args.batch_size, jax.random.PRNGKey(0))
    predict = jax.jit(FT.make_predict_fn(cfg))
    batch = FT.dummy_batch(cfg, args.batch_size, seed=0)
    batch = {k: batch[k] for k in ("points", "point_valid")}

    for _ in range(args.warmup):
        out = predict(state, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.samples):
        out = predict(state, batch)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.samples * args.batch_size / dt
    print(f"Overall fps: {fps:.1f} img / s "
          f"({dt / args.samples * 1000:.1f} ms / batch)")


if __name__ == "__main__":
    main()
