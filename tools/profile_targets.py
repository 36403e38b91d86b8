#!/usr/bin/env python
"""Targets-internal wall-time bisection (compute_targets_batch stages).

Stages: centered vals build, slot-outer kernel, table math (centroids +
normalize), dense-BEV stencil covariance + eig3, full targets.  Same
fetch-sync methodology as tools/profile_pretrain.py.
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

from bench import realistic_batch  # noqa: E402
from geomae_tpu.config import CapsConfig, geomae_pretrain_nus, replace  # noqa: E402
from geomae_tpu.models import mae as M  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402


def main():
    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    B = 4
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, B)
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(
        batch["points"], batch["point_valid"])
    eps = 1e-5
    v_cap = scene.table.valid.shape[-1]
    s_low = cfg.voxel.num_slots_low

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

    bench("full targets", lambda i: M.compute_targets_batch(
        scene._replace(points=scene.points + i * eps), cfg))

    bench("centered vals4_t", lambda i: M._centered_vals4_t(
        scene._replace(points=scene.points + i * eps), v_cap))

    from geomae_tpu.ops.pallas_segreduce_t import slot_outer_segment_sum_t
    mu, v4t = jax.jit(lambda s: M._centered_vals4_t(s, v_cap))(scene)
    bench("slot-outer kernel (t)", lambda i, v: slot_outer_segment_sum_t(
        v + i * eps, scene.slot_sort, scene.table.point2voxel, s_low,
        v_cap), v4t)

    sums = jax.jit(lambda v: slot_outer_segment_sum_t(
        v, scene.slot_sort, scene.table.point2voxel, s_low, v_cap))(v4t)
    bench("table math (post-sums)", lambda i, sm: jax.vmap(
        lambda s, m, m2: M.compute_targets(s, cfg, m, m2))(
        scene, sm + i * eps, mu), sums, n=3)

    # stencil + eig3 in isolation
    from geomae_tpu.ops.eig3 import normal_and_curvature
    cov = jnp.asarray(rng.normal(size=(B, v_cap, 3, 3)).astype(np.float32))
    cov = cov + jnp.swapaxes(cov, -1, -2)
    bench("eig3 (normal+curv)", lambda i, c: jax.vmap(
        normal_and_curvature)(c + i * eps), cov)


if __name__ == "__main__":
    main()
