#!/usr/bin/env python
"""Targets-stage attribution via whole-program variant deltas.

Each variant is the FULL compute_targets_batch with one stage skipped
through the trace-time ``models.mae._TGT_SKIP`` knob (wrong outputs —
deltas only).  Every output leaf is barrier-consumed and summed so XLA
cannot DCE the untouched stages (the round-4 lesson: single-leaf probes
measured nothing).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import BATCH, realistic_batch  # noqa: E402
from geomae_tpu.config import CapsConfig, geomae_pretrain_nus, replace  # noqa: E402
from geomae_tpu.models import mae as M  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402

STEPS = 20


def main():
    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, BATCH)
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(
        batch["points"], batch["point_valid"])
    jax.block_until_ready(jax.tree_util.tree_leaves(scene))

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor {floor * 1000:.1f} ms", flush=True)

    def make(skip):
        def fn(sc, salt):
            leaves, treedef = jax.tree_util.tree_flatten(sc)
            leaves = list(jax.lax.optimization_barrier(tuple(leaves)))
            # salt the points so repeated calls cannot be CSE'd/cached
            leaves[0] = leaves[0] + salt
            sc = jax.tree_util.tree_unflatten(treedef, leaves)
            tg = M.compute_targets_batch(sc, cfg)
            outs = jax.lax.optimization_barrier(
                tuple(jax.tree_util.tree_leaves(tg)))
            return sum(o.astype(jnp.float32).sum() for o in outs)

        return jax.jit(fn)

    results = {}
    for skip in (None, "none2", "slotouter", "expand", "stencil", "eig",
                 "norm"):
        M._TGT_SKIP = None if skip in (None, "none2") else skip
        fn = make(skip)
        v = fn(scene, jnp.float32(0.0))         # compile
        float(v)
        t0 = time.perf_counter()
        for k in range(STEPS):
            v = fn(scene, jnp.float32(k) * 1e-9)
        float(v)
        ms = (time.perf_counter() - t0 - floor) / STEPS * 1000
        name = skip or "full"
        results[name] = ms
        print(f"{name:12s} {ms:7.2f} ms", flush=True)
        M._TGT_SKIP = None

    full = results["none2"]
    for k in ("slotouter", "expand", "stencil", "eig", "norm"):
        print(f"{k:12s} delta {full - results[k]:7.2f} ms")


if __name__ == "__main__":
    main()
