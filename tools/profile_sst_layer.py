#!/usr/bin/env python
"""Decoder-scale SST layer split: qkv attention kernel f/f+b vs fused
post-attention block f/f+b at [2B, 20480, 128]."""
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
from geomae_tpu.models.sst import prepare_shift_data  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402
from geomae_tpu.ops.windows import make_layouts  # noqa: E402


def main():
    cfg = geomae_pretrain_nus()
    layout = os.environ.get("GEOMAE_BAND_LAYOUT")
    if layout:
        from geomae_tpu.config import replace as _rep
        cfg = _rep(cfg, sst=_rep(cfg.sst, band_layout=layout))
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    B = 4
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, B)
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(
        batch["points"], batch["point_valid"])

    lays = make_layouts(scene.table.coords, scene.table.valid, cfg.sst,
                        cfg.voxel)
    data = prepare_shift_data(lays, None, scene.table.valid, cfg.sst,
                              cfg.voxel)
    ld = jax.tree_util.tree_map(
        lambda a: (jnp.concatenate([a, a], 0)
                   if hasattr(a, "ndim") and a.ndim and a.shape[0] == B
                   else a), data["layers"][0])

    G, C, H = 2, cfg.sst.d_model, cfg.sst.nhead
    V = cfg.caps.max_voxels
    if cfg.sst.band_layout == "tilepack":
        V = 2 * V
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (G * B, V, C), jnp.bfloat16)
    pos = ld["pos_sorted"].astype(jnp.bfloat16)
    kw = jax.random.normal(key, (1, C, C), jnp.bfloat16) * 0.05
    kb = jnp.zeros((1, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (1, C, 256), jnp.bfloat16) * 0.05
    b1 = jnp.zeros((1, 256), jnp.bfloat16)
    w2 = jax.random.normal(key, (1, 256, C), jnp.bfloat16) * 0.05
    b2 = jnp.zeros((1, C), jnp.bfloat16)
    sc = jnp.ones((1, C), jnp.float32)
    bi = jnp.zeros((1, C), jnp.float32)

    null = jax.jit(lambda z: z + 1.0)
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
        print(f"{name:36s} {ms:8.1f} ms", flush=True)

    from geomae_tpu.ops.pallas_attention import DEFAULT_PAD
    from geomae_tpu.ops.pallas_attention_qkv import band_attention_qkv
    from geomae_tpu.ops.pallas_ffn import post_attention_block
    if cfg.sst.band_layout == "tilepack":
        DEFAULT_PAD = 0
    nv = jnp.max(jnp.where(ld["win_id"] < 2 ** 24,
                           jnp.arange(V, dtype=jnp.int32)[None] + 1, 0),
                 axis=-1).astype(jnp.int32)
    print("extent/V:", np.asarray(nv) / cfg.caps.max_voxels, flush=True)
    raw = jax.random.normal(key, (G * B, V, C), jnp.bfloat16)

    # chain N calls inside ONE jit program and divide — single-call
    # probes drown in the +/-10 ms relay-floor noise
    N = 16

    def attn1(xx):
        return band_attention_qkv(
            xx, pos, kw, kb, kw, kb, kw, kb, ld["win_id"],
            ld["key_valid_sorted"], H, 256, DEFAULT_PAD, False)

    def blk1(xx):
        return post_attention_block(xx, raw, kw, kb, sc, bi, w1, b1, w2,
                                    b2, sc, bi, 1e-5, 256, False)

    def chain(f, xx):
        for _ in range(N):
            xx = 0.9 * f(xx)
        return xx

    def bench_n(name, fn, *args, n=3):
        f = jax.jit(lambda i, *a: jnp.sum(jax.tree_util.tree_leaves(
            fn(i, *a))[0].astype(jnp.float32)))
        float(f(jnp.float32(0), *args))
        float(f(jnp.float32(0.5), *args))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i), *args))
        ms = ((time.perf_counter() - t0) / n - floor) * 1000 / N
        print(f"{name:36s} {ms:8.2f} ms/call", flush=True)

    for name, f1 in (("qkv attention", attn1), ("post-attn block", blk1)):
        bench_n(f"{name} fwd x{N} [8,20k]",
                lambda i, xx, _f=f1: chain(
                    _f, xx + jnp.asarray(i * 1e-3, jnp.bfloat16)), x)
        bench_n(f"{name} f+b x{N} [8,20k]",
                lambda i, xx, _f=f1: jax.grad(lambda z: jnp.sum(chain(
                    _f, z).astype(jnp.float32)))(
                    xx + jnp.asarray(i * 1e-3, jnp.bfloat16)), x)


if __name__ == "__main__":
    main()
