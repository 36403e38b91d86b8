#!/usr/bin/env python
"""Sub-module wall-time profile: VFE / window layouts / one SST stack pass /
pallas vs einsum attention, as separate small jit programs (fast compiles).
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
from geomae_tpu.models.sst import SSTStack, prepare_shift_data  # noqa: E402
from geomae_tpu.models.vfe import DynamicScatterVFE  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402
from geomae_tpu.ops.windows import make_layouts, positional_embedding, window_ids  # noqa: E402


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

    # float() (value fetch) is the ONLY true completion barrier through the
    # remote relay — block_until_ready returns early there.  The fetch's
    # own round-trip (~30 ms) is measured on a null program and subtracted.
    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8

    def bench(name, fn, n=4):
        f = jax.jit(lambda i: jnp.sum(jax.tree_util.tree_leaves(
            fn(i))[0].astype(jnp.float32)))
        float(f(jnp.float32(0)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i)))
        ms = ((time.perf_counter() - t0) / n - floor) * 1000
        print(f"{name:30s} {ms:8.1f} ms", flush=True)

    # VFE alone
    vfe = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.bfloat16)
    vvars = jax.jit(lambda k: vfe.init(k, scene, train=False))(
        jax.random.PRNGKey(0))
    bench("VFE fwd", lambda i: vfe.apply(
        vvars, scene._replace(points=scene.points + i * eps), train=False))

    # layouts + pos embeds (decoder-size table)
    def mk_layout(i):
        coords = scene.table.coords + (i * 0).astype(jnp.int32)
        lays = make_layouts(coords, scene.table.valid, cfg.sst, cfg.voxel)
        pos = [positional_embedding(jax.vmap(
            lambda c, m, ss=s: window_ids(c, m, ss, cfg.sst, cfg.voxel)[1])(
            coords, scene.table.valid), cfg.sst) for s in cfg.sst.shifts]
        return [lays[0].perm, pos[0]]
    bench("layouts+pos (20k)", mk_layout)

    # one 2-block stack over 20480 tokens (decoder-like), pallas vs einsum
    V = cfg.caps.max_voxels
    x = jnp.asarray(rng.normal(size=(B, V, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    lays = make_layouts(scene.table.coords, scene.table.valid, cfg.sst,
                        cfg.voxel)
    pos = [positional_embedding(jax.vmap(
        lambda c, m, ss=s: window_ids(c, m, ss, cfg.sst, cfg.voxel)[1])(
        scene.table.coords, scene.table.valid), cfg.sst)
        for s in cfg.sst.shifts]
    data = prepare_shift_data(lays, pos, scene.table.valid)
    for impl in ("pallas", "einsum"):
        sst_cfg = replace(cfg.sst, attention_impl=impl)
        stack = SSTStack(sst_cfg, 2, jnp.bfloat16, remat=False)
        svars = jax.jit(lambda k: stack.init(k, x, data))(
            jax.random.PRNGKey(0))
        bench(f"2-block stack 20k ({impl})", lambda i, _s=stack, _v=svars:
              _s.apply(_v, x + (i * eps).astype(x.dtype), data))

    # fwd+bwd of the same stack (params + input grads) — the SST long tail
    sst_cfg = replace(cfg.sst, attention_impl="pallas")
    stack = SSTStack(sst_cfg, 2, jnp.bfloat16, remat=False)
    svars = jax.jit(lambda k: stack.init(k, x, data))(jax.random.PRNGKey(0))

    def stack_loss(p, xin):
        return jnp.sum(stack.apply({"params": p}, xin, data)
                       .astype(jnp.float32))

    bench("2-block stack 20k grad", lambda i: jax.grad(
        stack_loss, argnums=(0, 1))(
        svars["params"], x + (i * eps).astype(x.dtype)), n=3)


if __name__ == "__main__":
    main()
