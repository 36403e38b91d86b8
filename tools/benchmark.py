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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

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
