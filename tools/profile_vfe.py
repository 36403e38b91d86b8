#!/usr/bin/env python
"""VFE-internal wall-time bisection on the current device.

Stages: decorations (mean-broadcast + pillar-center), layer0
(Dense 11->64 + BN + ReLU), max-broadcast concat, layer1
(Dense 128->128 + BN + ReLU), final segment-max — plus each pallas
segment kernel in isolation.  Same fetch-sync methodology as
tools/profile_pretrain.py.
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
from geomae_tpu.models import vfe as V  # noqa: E402
from geomae_tpu.models.vfe import DynamicScatterVFE  # noqa: E402
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

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor {floor * 1000:.1f} ms", flush=True)

    def bench(name, fn, *args, n=4):
        # big operands ride as jit ARGUMENTS (closure constants embed in
        # the program and 413 the remote-compile call)
        f = jax.jit(lambda i, *a: jnp.sum(jax.tree_util.tree_leaves(
            fn(i, *a))[0].astype(jnp.float32)))
        float(f(jnp.float32(0), *args))
        float(f(jnp.float32(0.5), *args))   # second warmup (relay artifact)
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i), *args))
        ms = ((time.perf_counter() - t0) / n - floor) * 1000
        print(f"{name:34s} {ms:8.1f} ms", flush=True)

    dt = jnp.dtype(cfg.compute_dtype)
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, dt)
    vvars = jax.jit(lambda k: vfe.init(k, scene, train=False))(
        jax.random.PRNGKey(0))

    p2v = scene.table.point2voxel
    v_cap = scene.table.valid.shape[-1]
    pts, pvalid = scene.points, scene.valid
    xyz = pts[..., :3]

    bench("VFE fwd eval", lambda i: vfe.apply(
        vvars, scene._replace(points=pts + i * eps), train=False))
    bench("VFE fwd train", lambda i: vfe.apply(
        vvars, scene._replace(points=pts + i * eps), train=True,
        mutable=["batch_stats"]))

    bench("mean_bcast 3ch", lambda i: V._mean_bcast_b(
        xyz + i * eps, p2v, v_cap, pvalid))

    x64 = jnp.asarray(rng.normal(size=(B, pts.shape[1], 64)), dt)
    bench("max_bcast 64ch", lambda i, x: V._max_bcast_b(
        x + jnp.asarray(i * eps, dt), p2v, v_cap, pvalid), x64)
    x128 = jnp.asarray(rng.normal(size=(B, pts.shape[1], 128)), dt)
    bench("seg_max 128ch", lambda i, x: V._seg_max_b(
        x + jnp.asarray(i * eps, dt), p2v, v_cap, pvalid,
        scene.table.valid), x128)
    bench("seg_gather 128ch", lambda i, x: V._gather_b(
        x[:, :v_cap] + jnp.asarray(i * eps, dt), p2v), x128)

    # dense + BN at point scale
    from geomae_tpu.models.vfe import DynamicVFELayer
    lay = DynamicVFELayer(128, dtype=dt)
    x11 = jnp.asarray(rng.normal(size=(B, pts.shape[1], 11)), dt)
    lvars = jax.jit(lambda k, x: lay.init(k, x, pvalid, False))(
        jax.random.PRNGKey(1), x128)
    bench("DVFELayer 128->128 eval", lambda i, x: lay.apply(
        lvars, x + jnp.asarray(i * eps, dt), pvalid, False), x128)
    lay64 = DynamicVFELayer(64, dtype=dt)
    lvars11 = jax.jit(lambda k, x: lay64.init(k, x, pvalid, False))(
        jax.random.PRNGKey(1), x11)
    bench("DVFELayer 11->64 eval", lambda i, x: lay64.apply(
        lvars11, x + jnp.asarray(i * eps, dt), pvalid, False), x11)

    # decorations block alone (mean_bcast + voxel-center + concat)
    def deco(i):
        p = pts + i * eps
        pm = V._mean_bcast_b(p[..., :3], p2v, v_cap, pvalid)
        from geomae_tpu.ops.voxelize import low_voxel_coords
        low = jax.vmap(lambda q: low_voxel_coords(q, cfg.voxel))(p[..., :3])
        return jnp.concatenate([p, p[..., :3] - pm,
                                low.astype(jnp.float32)], -1)
    bench("decorations", deco)


if __name__ == "__main__":
    main()
