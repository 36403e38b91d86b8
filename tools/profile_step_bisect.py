#!/usr/bin/env python
"""Train-step bisection with bench.py's chained-enqueue methodology.

Each variant is a full jitted program run STEPS times back-to-back with ONE
final value fetch (the only true completion barrier through the relay), so
the per-variant numbers carry none of the ±15 ms host-contention noise of
the per-stage value-fetch probes in profile_pretrain.py.  Differences
between variants attribute step time to stages:

  full    - noveox   = voxelize (canonical sort + table build)
  noveox  - notgt    = geometric targets build
  full    - fwdonly  = backward + optimizer
  full    - enc0     = 6 encoder blocks fwd+bwd
  full    - dec0     = 2x2 decoder blocks fwd+bwd
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
from geomae_tpu.models.mae import (GeoMAE, compute_targets_batch,  # noqa: E402
                                   pretrain_loss, sample_mask)
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402
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

    from geomae_tpu.train.optim import make_optimizer

    def make_step(cfg, mode):
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

        if mode == "full":
            def step(state, b, k):
                scene = scene_of(b)
                tg = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, compute_targets_batch(scene, cfg))
                g, (losses, ns) = jax.grad(fwd, has_aux=True)(
                    state.params, state.batch_stats, scene, tg, k)
                return state.apply_gradients(g, tx, ns), losses
            args = (batch,)
        elif mode == "noveox":
            def step(state, scene, k):
                tg = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, compute_targets_batch(scene, cfg))
                g, (losses, ns) = jax.grad(fwd, has_aux=True)(
                    state.params, state.batch_stats, scene, tg, k)
                return state.apply_gradients(g, tx, ns), losses
            args = (jax.jit(scene_of)(batch),)
        elif mode == "notgt":
            def step(state, scene, tg, k):
                g, (losses, ns) = jax.grad(fwd, has_aux=True)(
                    state.params, state.batch_stats, scene, tg, k)
                return state.apply_gradients(g, tx, ns), losses
            sc = jax.jit(scene_of)(batch)
            args = (sc, jax.jit(lambda s: compute_targets_batch(s, cfg))(sc))
        else:  # fwdonly
            def step(state, b, k):
                scene = scene_of(b)
                tg = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, compute_targets_batch(scene, cfg))
                loss, (losses, ns) = fwd(state.params, state.batch_stats,
                                         scene, tg, k)
                return state.replace(batch_stats=ns), losses
            args = (batch,)
        return jax.jit(step, donate_argnums=(0,)), args

    results = {}
    for mode in ("full", "noveox", "notgt", "fwdonly"):
        state, _ = init_state(base, BATCH, jax.random.PRNGKey(0))
        step, args = make_step(base, mode)
        results[mode] = _run(mode, step, state, args, floor)

    for name, mae in (("enc0", replace(base.mae, encoder_blocks=0)),
                      ("dec0", replace(base.mae, decoder_blocks=0))):
        cfg = replace(base, mae=mae)
        state, _ = init_state(cfg, BATCH, jax.random.PRNGKey(0))
        step, args = make_step(cfg, "full")
        results[name] = _run(name, step, state, args, floor)

    print(f"\nvoxelize        {results['full'] - results['noveox']:7.1f} ms")
    print(f"targets         {results['noveox'] - results['notgt']:7.1f} ms")
    print(f"bwd+optimizer   {results['full'] - results['fwdonly']:7.1f} ms")
    print(f"encoder f+b     {results['full'] - results['enc0']:7.1f} ms")
    print(f"decoders f+b    {results['full'] - results['dec0']:7.1f} ms")


if __name__ == "__main__":
    main()
