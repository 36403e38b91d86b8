#!/usr/bin/env python
"""Component-level wall-time profile of the pretrain step on the current
device (the ``jax.profiler``-lite used to attribute step time).

Each stage is timed with inputs perturbed per call (defeats any
executable+args memoization in remote-execution backends) and synchronized
by fetching a scalar reduction of all outputs.
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
from geomae_tpu.models.mae import GeoMAE, compute_targets_batch, sample_mask  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402
from geomae_tpu.train.pretrain import forward, init_state  # noqa: E402


def main():
    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    B = 4
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, B)
    pts, pv = batch["points"], batch["point_valid"]

    def scalarize(out):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    # relay fetch round-trip floor (null program), subtracted per call
    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8

    def bench(name, fn, n=4):
        f = jax.jit(lambda i: scalarize(fn(i)))
        float(f(jnp.float32(0)))
        # second warmup: the FIRST timed call of a freshly-compiled program
        # can measure 10-400x its steady state through the relay
        float(f(jnp.float32(0.5)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i)))
        dt = (time.perf_counter() - t0) / n - floor
        print(f"{name:26s} {dt * 1000:8.1f} ms", flush=True)

    eps = 1e-5
    bench("voxelize", lambda i: build_scene_batch(
        pts + i * eps, pv, cfg.voxel, cfg.caps.max_voxels))
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(pts, pv)
    bench("targets", lambda i: compute_targets_batch(
        scene._replace(points=scene.points + i * eps), cfg))
    keep = sample_mask(jax.random.PRNGKey(0), scene.table.valid, 0.7)
    state, tx = init_state(cfg, B, jax.random.PRNGKey(0))
    model = GeoMAE(cfg)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    bench("model fwd (eval)", lambda i: model.apply(
        vars_, scene._replace(points=scene.points + i * eps), keep,
        train=False))

    def lf(p, i):
        losses, _ = forward(
            cfg, {"params": p, "batch_stats": state.batch_stats},
            dict(points=pts + i * eps, point_valid=pv),
            jax.random.PRNGKey(1), train=True)
        return losses["loss"]

    bench("full fwd+targets", lambda i: lf(state.params, i))
    bench("grad", lambda i: jax.grad(lf)(state.params, i), n=3)

    # full train step (no donation so the same state can repeat) and the
    # optimizer update alone — pins the step-minus-grad gap.  The WHOLE
    # output tuple (incl. new_state) must feed the fetched scalar: keeping
    # only the losses lets XLA dead-code-eliminate the backward+optimizer
    # (measured: 217 ms "step" vs 384 ms grad — the DCE'd probe just
    # re-times the forward).
    from geomae_tpu.train.pretrain import make_train_step
    step_fn = make_train_step(cfg, tx)
    key = jax.random.PRNGKey(2)
    bench("full train step", lambda i: step_fn(
        state, dict(points=pts + i * eps, point_valid=pv), key), n=3)

    def opt_only(i):
        g = jax.tree_util.tree_map(lambda p: p * (1e-6 * i + 1e-6),
                                   state.params)
        upd, _ = tx.update(g, state.opt_state, state.params)
        return upd

    bench("optimizer update", opt_only)

    # stage bisection: vary block counts, measure eval fwd
    from geomae_tpu.config import MAEConfig
    for name, enc, dec in [("fwd enc0 dec0 (VFE+heads)", 0, 0),
                           ("fwd enc6 dec0", 6, 0),
                           ("fwd enc0 dec2", 0, 2)]:
        c2 = replace(cfg, mae=MAEConfig(encoder_blocks=enc,
                                        decoder_blocks=dec))
        st2, _ = init_state(c2, B, jax.random.PRNGKey(0))
        m2 = GeoMAE(c2)
        v2 = {"params": st2.params, "batch_stats": st2.batch_stats}
        bench(name, lambda i, _m=m2, _v=v2: _m.apply(
            _v, scene._replace(points=scene.points + i * eps), keep,
            train=False))


def main_grad():
    """``--grad``: backward-tail bisection.  Times full ``value_and_grad``
    of a params-only model loss at varying (enc, dec) depths — the deltas
    attribute fwd+bwd cost per stack — plus isolated permute / LayerNorm /
    attention chains at decoder scale (the candidates for the non-attention
    backward long tail)."""
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

    def bench(name, fn, n=4):
        f = jax.jit(fn)
        tc = time.perf_counter()
        float(f(jnp.float32(0)))
        comp = time.perf_counter() - tc
        # warmup artifact: first timed call can be 10-400x steady state
        float(f(jnp.float32(0.5)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            float(f(jnp.float32(i)))
        dt = (time.perf_counter() - t0) / n - floor
        print(f"{name:30s} {dt * 1000:8.1f} ms  (compile {comp:.0f}s)",
              flush=True)

    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(pts, pv)
    keep = sample_mask(jax.random.PRNGKey(0), scene.table.valid, 0.7)
    eps = 1e-5

    from geomae_tpu.config import MAEConfig
    for name, enc, dec in [("grad enc0 dec0", 0, 0),
                           ("grad enc12 dec0", 12, 0),
                           ("grad enc0 dec4", 0, 4),
                           ("grad full model", 12, 4)]:
        c2 = replace(cfg, mae=replace(
            cfg.mae, encoder_blocks=enc, decoder_blocks=dec))
        st2, _ = init_state(c2, B, jax.random.PRNGKey(0))
        m2 = GeoMAE(c2)

        def loss(p, i, _m=m2, _bs=st2.batch_stats):
            preds, _ = _m.apply(
                {"params": p, "batch_stats": _bs},
                scene._replace(points=scene.points + i * eps), keep,
                train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(preds))

        bench(name, lambda i, _l=loss, _p=st2.params: sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(jax.grad(_l)(_p, i))), n=3)

    # isolated chains at decoder scale [2B, 20480, 128]
    V, C = cfg.caps.max_voxels, cfg.sst.d_model
    key = jax.random.PRNGKey(1)
    xdec = jax.random.normal(key, (2 * B, V, C), jnp.bfloat16)
    perm = jnp.tile(jnp.argsort(jax.random.uniform(key, (V,)))[None],
                    (2 * B, 1)).astype(jnp.int32)
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)

    from geomae_tpu.models.norm import fast_layer_norm
    from geomae_tpu.models.sst import _permute

    def permute_chain(x):
        for _ in range(8):
            x = _permute(x, perm, inv)
        return jnp.sum(x.astype(jnp.float32))

    bench("8x permute f+b [8,20k,128]", lambda i: sum(
        jnp.sum(g.astype(jnp.float32) ** 2) for g in
        jax.tree_util.tree_leaves(jax.grad(permute_chain)(
            xdec + i.astype(jnp.bfloat16)))), n=3)

    sc = jnp.ones((C,), jnp.float32)
    bi = jnp.zeros((C,), jnp.float32)

    def ln_chain(x):
        for _ in range(8):
            x = fast_layer_norm(x, sc, bi, 1e-5)
        return jnp.sum(x.astype(jnp.float32))

    bench("8x LN f+b [8,20k,128]", lambda i: sum(
        jnp.sum(g.astype(jnp.float32) ** 2) for g in
        jax.tree_util.tree_leaves(jax.grad(ln_chain)(
            xdec + i.astype(jnp.bfloat16)))), n=3)

    def ffn_chain(x):
        w1 = jnp.ones((C, 2 * C), jnp.bfloat16) * 0.01
        w2 = jnp.ones((2 * C, C), jnp.bfloat16) * 0.01
        for _ in range(8):
            x = jax.nn.gelu(x @ w1, approximate=False) @ w2
        return jnp.sum(x.astype(jnp.float32))

    bench("8x FFN f+b [8,20k,128]", lambda i: jnp.sum(
        jax.grad(ffn_chain)(xdec + i.astype(jnp.bfloat16))
        .astype(jnp.float32) ** 2), n=3)


if __name__ == "__main__":
    import sys
    if "--grad" in sys.argv:
        main_grad()
    else:
        main()
