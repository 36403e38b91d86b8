#!/usr/bin/env python
"""Voxelize-internal bisection: the canonical argsort, the row gather,
the key_rows compaction sort, cumsum, and the full build."""
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

from bench import realistic_batch  # noqa: E402
from geomae_tpu.config import CapsConfig, geomae_pretrain_nus, replace  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402


def main():
    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    B = 4
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, B)
    pts, pv = batch["points"], batch["point_valid"]

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor {floor * 1000:.1f} ms", flush=True)

    def bench(name, fn, *args, n=4):
        f = jax.jit(lambda i, *a: jnp.sum(jax.tree_util.tree_leaves(
            fn(i, *a))[0].astype(jnp.float32)))
        float(f(jnp.float32(0), *args))
        float(f(jnp.float32(0.5), *args))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i), *args))
        ms = ((time.perf_counter() - t0) / n - floor) * 1000
        print(f"{name:34s} {ms:8.1f} ms", flush=True)

    bench("full build_scene_batch", lambda i: build_scene_batch(
        pts + i * 1e-5, pv, cfg.voxel, cfg.caps.max_voxels))

    key = jnp.asarray(
        rng.integers(0, 2 ** 21, (B, pts.shape[1])).astype(np.int32))
    bench("argsort [4,262k] i32", lambda i, k: jnp.argsort(
        k + i.astype(jnp.int32)), key)
    bench("value sort [4,262k] i32", lambda i, k: jax.lax.sort(
        k + i.astype(jnp.int32)), key)
    order = jnp.asarray(
        np.stack([rng.permutation(pts.shape[1]) for _ in range(B)])
        .astype(np.int32))
    bench("points row-gather [262k,5]",
          lambda i, o: jnp.take_along_axis(pts + i * 1e-5, o[..., None],
                                           axis=1), order)
    bench("cumsum [4,262k] i32", lambda i, k: jnp.cumsum(
        (k + i.astype(jnp.int32)) & 1, axis=1), key)
    # sorted-unique scatter alternative for the key_rows compaction
    rank = jnp.asarray(np.sort(
        rng.integers(0, 20480, (B, pts.shape[1]))).astype(np.int32))

    def scat(i, k, r):
        return jax.vmap(lambda kk, rr: jnp.zeros(
            (20481,), jnp.int32).at[rr].set(
            kk, mode="drop", unique_indices=False,
            indices_are_sorted=True))(k + i.astype(jnp.int32), r)
    bench("sorted scatter-set [262k->20k]", scat, key, rank)


if __name__ == "__main__":
    main()
