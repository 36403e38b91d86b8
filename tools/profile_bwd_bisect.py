#!/usr/bin/env python
"""Backward-pass bisection: where do the ~87 ms of bwd+optimizer go?

Same chained-enqueue methodology as profile_step_bisect.py (full jitted
programs, one value fetch, variant deltas).  Stages are cut with
trace-time ``stop_gradient`` hooks (``models.mae._SG_STAGE``) so each
variant drops exactly one backward region while keeping the forward
identical:

  full  - noopt  = grad clip + AdamW update        (grads barrier-kept)
  full  - sgvfe  = VFE backward
  (full - sgenc) - (full - sgvfe) = encoder backward
  (full - sgdec) - (full - sgenc) = decoder backward
  remaining bwd  = heads + loss backward

Caveat: stop_gradient also lets XLA drop residual stashing upstream, so
each delta includes the stage's activation-save traffic — which is the
honest cost of differentiating it.
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
from geomae_tpu.models.mae import (GeoMAE, compute_targets_batch,  # noqa: E402
                                   pretrain_loss, sample_mask)
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402
from geomae_tpu.train.optim import make_optimizer  # noqa: E402
from geomae_tpu.train.pretrain import init_state  # noqa: E402

STEPS = 20


def _floor():
    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    return (time.perf_counter() - t0) / 8


def _run(name, step, state, args, floor):
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, losses = step(state, *args, k)
    float(jax.tree_util.tree_leaves(losses)[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, k = jax.random.split(key)
        state, losses = step(state, *args, k)
    float(jax.tree_util.tree_leaves(losses)[0])
    ms = (time.perf_counter() - t0 - floor) / STEPS * 1000
    print(f"{name:28s} {ms:7.1f} ms/step", flush=True)
    return ms


def main():
    base = geomae_pretrain_nus()
    base = replace(base, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                         max_visible=8192))
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, base, BATCH)
    floor = _floor()
    print(f"fetch floor {floor * 1000:.1f} ms", flush=True)

    def make_step(cfg, *, sg=None, opt=True):
        # NOTE: jit traces lazily at first call — the caller keeps
        # M._SG_STAGE set through _run's warmup calls
        model = GeoMAE(cfg)
        tx = make_optimizer(cfg.optim)

        def fwd(params, stats, scene, targets, k):
            keep = sample_mask(k, scene.table.valid,
                               cfg.mae.random_mask_ratio)
            preds, mut = model.apply(
                {"params": params, "batch_stats": stats}, scene, keep,
                train=True, mutable=["batch_stats"])
            losses = pretrain_loss(preds, targets, scene, keep, cfg)
            return losses["loss"], (losses, mut["batch_stats"])

        def scene_of(b):
            scene = build_scene_batch(b["points"], b["point_valid"],
                                      cfg.voxel, cfg.caps.max_voxels)
            leaves, treedef = jax.tree_util.tree_flatten(scene)
            return jax.tree_util.tree_unflatten(
                treedef, jax.lax.optimization_barrier(tuple(leaves)))

        def step(state, b, k):
            scene = scene_of(b)
            tg = jax.tree_util.tree_map(
                jax.lax.stop_gradient, compute_targets_batch(scene, cfg))
            g, (losses, ns) = jax.grad(fwd, has_aux=True)(
                state.params, state.batch_stats, scene, tg, k)
            if opt:
                return state.apply_gradients(g, tx, ns), losses
            # keep the backward alive, skip clip+AdamW: fold one grad
            # leaf's first element into a reported loss via a barrier
            leaf = jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
            leaf = jax.lax.optimization_barrier(leaf)
            losses = dict(losses, gleaf=leaf)
            return state.replace(batch_stats=ns), losses

        return jax.jit(step, donate_argnums=(0,)), (batch,)

    results = {}
    variants = [("full", dict()),
                ("noopt", dict(opt=False)),
                ("sgvfe", dict(sg="vfe")),
                ("sgenc", dict(sg="enc")),
                ("sgdec", dict(sg="dec"))]
    for name, kw in variants:
        state, _ = init_state(base, BATCH, jax.random.PRNGKey(0))
        # trace happens inside _run's first call — set the knob around it
        M._SG_STAGE = kw.get("sg")
        step, args = make_step(base, **kw)
        results[name] = _run(name, step, state, args, floor)
        M._SG_STAGE = None

    full = results["full"]
    vfe = full - results["sgvfe"]
    enc = (full - results["sgenc"]) - vfe
    dec = (full - results["sgdec"]) - (full - results["sgenc"])
    print(f"\nclip+AdamW        {full - results['noopt']:7.1f} ms")
    print(f"VFE backward      {vfe:7.1f} ms")
    print(f"encoder backward  {enc:7.1f} ms")
    print(f"decoder backward  {dec:7.1f} ms")
    print(f"(full-sgdec)      {full - results['sgdec']:7.1f} ms "
          "= vfe+enc+dec bwd")


if __name__ == "__main__":
    main()
