#!/usr/bin/env python
"""Round-5 variant probes, part 2: split the two big deltas from part 1.

  full2      = new baseline (head-fold + sort_key_val landed)
  nogather   : sorted order computed but points NOT permuted
               -> full2 - nogather = the [262k, 5] row gather
  noscatter  : dense moment grid built by tile+slice instead of scatter
               -> full2 - noscatter = the .at[key].set scatter
  notaps     : center tap only in the stencil
               -> noscatter-adjacent; full2 - notaps = 8 extra taps
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


def build_scene_nogather(points, point_valid, cfg, v_cap):
    """build_scene but the point stream stays UNSORTED (wrong semantics;
    same shapes) — isolates the [P, D] row gather."""
    ny, nx = cfg.grid_size
    rz, ry, rx = cfg.sub_voxel_ratio_low
    s_low = rz * ry * rx
    low = VX.low_voxel_coords(points[:, :3], cfg)
    py = low[:, 1] // ry
    px = low[:, 2] // rx
    pillar_key = py * nx + px
    key = pillar_key * s_low + VX.sub_voxel_slots(low, cfg)[2]
    key = jnp.where(point_valid, key, INT32_MAX)
    key_s, order = jax.lax.sort_key_val(
        key, jnp.arange(key.shape[0], dtype=jnp.int32))
    valid_s = key_s != INT32_MAX
    pk_s = jnp.where(valid_s, key_s // s_low, INT32_MAX)
    points_s = points * (1.0 + 1e-9 * order[0].astype(points.dtype))
    low_s = VX.low_voxel_coords(points_s[:, :3], cfg)
    slot_low_s, slot_med_s, slot_sort_s = VX.sub_voxel_slots(low_s, cfg)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pk_s[1:] != pk_s[:-1]]) & valid_s
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_voxels = first.sum().astype(jnp.int32)
    in_cap = valid_s & (rank >= 0) & (rank < v_cap)
    p2v = jnp.where(in_cap, rank, v_cap)
    key_rows = jax.lax.sort(jnp.where(first, pk_s, INT32_MAX))[:v_cap]
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

    real_sd = M._stencil_dense
    real_sc = M._stencil_covs

    def make_step(cfg, mode):
        model = M.GeoMAE(cfg)
        tx = make_optimizer(cfg.optim)

        def scene_of(b):
            bs = (build_scene_nogather if mode == "nogather"
                  else VX.build_scene)
            scene = jax.vmap(lambda p, m: bs(
                p, m, cfg.voxel, cfg.caps.max_voxels))(
                b["points"], b["point_valid"])
            leaves, treedef = jax.tree_util.tree_flatten(scene)
            return jax.tree_util.tree_unflatten(
                treedef, jax.lax.optimization_barrier(tuple(leaves)))

        def step(state, b, k):
            if mode == "noscatter":
                def fake_dense(feats, key, ny, nx):
                    reps = (ny * nx) // feats.shape[0] + 2
                    return jnp.tile(feats, (reps, 1))[: ny * nx + 1]
                M._stencil_dense = fake_dense
            if mode == "notaps":
                def one_tap(dense, ny, nx):
                    grid = dense[:-1].reshape(ny, nx, 16)
                    return grid[..., 4:13].reshape(ny, nx, 3, 3)
                M._stencil_covs = one_tap
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
                M._stencil_dense = real_sd
                M._stencil_covs = real_sc

        return jax.jit(step, donate_argnums=(0,))

    results = {}
    for mode in ("full2", "nogather", "noscatter", "notaps"):
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

    f = results["full2"]
    print(f"\npoints row gather     {f - results['nogather']:7.1f} ms")
    print(f"stencil dense scatter {f - results['noscatter']:7.1f} ms")
    print(f"8 extra taps          {f - results['notaps']:7.1f} ms")


if __name__ == "__main__":
    main()
