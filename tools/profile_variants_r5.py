#!/usr/bin/env python
"""Round-5 variant-delta probes: voxelize + targets internals.

Whole-program train-step variants (bench.py chained-enqueue methodology;
per-stage value-fetch probes are DCE-prone and noisy through the relay):

  full      - nosort     = the canonical argsort + row gather
  full      - nokeyrows  = the key_rows value-only compaction sort
  full      - nonormals  = dense-BEV stencil + eig3 (normal/curv targets)
  full      - nonorm     = centroid normalize chain + slot reorder

Mutated variants are semantically WRONG (identity permutation, zero
normals); they exist only to attribute time — same shapes, same dtypes,
same downstream graph.
"""
from __future__ import annotations

import functools
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
from geomae_tpu.ops import voxelize as VX  # noqa: E402
from geomae_tpu.train.optim import make_optimizer  # noqa: E402
from geomae_tpu.train.pretrain import init_state  # noqa: E402

STEPS = 20
INT32_MAX = jnp.iinfo(jnp.int32).max


def _floor():
    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    return (time.perf_counter() - t0) / 8


def build_scene_hack(points, point_valid, cfg, v_cap,
                     skip_sort=False, skip_keyrows=False):
    """build_scene with the probed stage replaced by a same-shape stub."""
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    s_low = rz * ry * rx
    low = VX.low_voxel_coords(points[:, :3], cfg)
    py = low[:, 1] // ry
    px = low[:, 2] // rx
    pillar_key = py * nx + px
    key = pillar_key * s_low + VX.sub_voxel_slots(low, cfg)[2]
    key = jnp.where(point_valid, key, INT32_MAX)

    if skip_sort:
        order = jnp.arange(key.shape[0], dtype=jnp.int32)
        key_s = key
    else:
        order = jnp.argsort(key)
        key_s = key[order]
    valid_s = key_s != INT32_MAX
    pk_s = jnp.where(valid_s, key_s // s_low, INT32_MAX)
    points_s = points[order] if not skip_sort else points
    low_s = VX.low_voxel_coords(points_s[:, :3], cfg)
    slot_low_s, slot_med_s, slot_sort_s = VX.sub_voxel_slots(low_s, cfg)

    first = jnp.concatenate(
        [jnp.ones((1,), bool), pk_s[1:] != pk_s[:-1]]) & valid_s
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_voxels = first.sum().astype(jnp.int32)
    in_cap = valid_s & (rank >= 0) & (rank < v_cap)
    p2v = jnp.where(in_cap, rank, v_cap)

    if skip_keyrows:
        key_rows = jnp.zeros(max(key.shape[0], v_cap), jnp.int32) \
            + pk_s[: max(key.shape[0], v_cap)]
    else:
        key_rows = jax.lax.sort(jnp.where(first, pk_s, INT32_MAX))
    key_rows = key_rows[:v_cap]
    tvalid = jnp.arange(v_cap, dtype=jnp.int32) < num_voxels
    safe = jnp.where(tvalid, key_rows, 0)
    coords = jnp.stack([safe // nx, safe % nx], axis=-1)

    table = VX.VoxelTable(coords=coords, valid=tvalid,
                          num_voxels=num_voxels, point2voxel=p2v)
    return VX.Scene(points=points_s, valid=valid_s, table=table,
                    slot_low=slot_low_s, slot_med=slot_med_s,
                    slot_sort=slot_sort_s)


def main():
    base = geomae_pretrain_nus()
    base = replace(base, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                         max_visible=8192))
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, base, BATCH)
    floor = _floor()
    print(f"fetch floor {floor * 1000:.1f} ms", flush=True)

    real_nc = M.normal_and_curvature
    real_nd = M._normalize_dense

    def make_step(cfg, mode):
        model = M.GeoMAE(cfg)
        tx = make_optimizer(cfg.optim)

        sk = dict(skip_sort=(mode == "nosort"),
                  skip_keyrows=(mode == "nokeyrows"))

        def scene_of(b):
            scene = jax.vmap(lambda p, m: build_scene_hack(
                p, m, cfg.voxel, cfg.caps.max_voxels, **sk))(
                b["points"], b["point_valid"])
            leaves, treedef = jax.tree_util.tree_flatten(scene)
            return jax.tree_util.tree_unflatten(
                treedef, jax.lax.optimization_barrier(tuple(leaves)))

        def step(state, b, k):
            if mode == "nonormals":
                M.normal_and_curvature = lambda cov: (
                    jnp.zeros(cov.shape[:-2] + (3,), jnp.float32),
                    jnp.zeros(cov.shape[:-2] + (3,), jnp.float32))
            if mode == "nonorm":
                M._normalize_dense = \
                    lambda raw, coords, slots, ratio, voxel: raw
            try:
                scene = scene_of(b)
                tg = jax.tree_util.tree_map(
                    jax.lax.stop_gradient,
                    M.compute_targets_batch(scene, cfg))

                def fwd(params, stats, sc, t, kk):
                    keep = M.sample_mask(kk, sc.table.valid,
                                         cfg.mae.random_mask_ratio)
                    preds, mut = model.apply(
                        {"params": params, "batch_stats": stats}, sc, keep,
                        train=True, mutable=["batch_stats"])
                    losses = M.pretrain_loss(preds, t, sc, keep, cfg)
                    return losses["loss"], (losses, mut["batch_stats"])

                g, (losses, ns) = jax.grad(fwd, has_aux=True)(
                    state.params, state.batch_stats, scene, tg, k)
                return state.apply_gradients(g, tx, ns), losses
            finally:
                M.normal_and_curvature = real_nc
                M._normalize_dense = real_nd

        return jax.jit(step, donate_argnums=(0,))

    results = {}
    for mode in ("full", "nosort", "nokeyrows", "nonormals", "nonorm"):
        state, _ = init_state(base, BATCH, jax.random.PRNGKey(0))
        step = make_step(base, mode)
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            key, k = jax.random.split(key)
            state, losses = step(state, batch, k)
        float(jax.tree_util.tree_leaves(losses)[0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            state, losses = step(state, batch, k)
        float(jax.tree_util.tree_leaves(losses)[0])
        ms = (time.perf_counter() - t0 - floor) / STEPS * 1000
        results[mode] = ms
        print(f"{mode:12s} {ms:7.1f} ms/step", flush=True)

    f = results["full"]
    print(f"\ncanonical sort+gather {f - results['nosort']:7.1f} ms")
    print(f"key_rows sort         {f - results['nokeyrows']:7.1f} ms")
    print(f"normals stencil+eig3  {f - results['nonormals']:7.1f} ms")
    print(f"normalize chain       {f - results['nonorm']:7.1f} ms")


if __name__ == "__main__":
    main()
