#!/usr/bin/env python
"""VFE stage attribution via whole-program variant deltas (fwd and
fwd+bwd), using the trace-time ``models.vfe._VFE_SKIP`` knob.  Wrong
outputs on skip variants — deltas only."""
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
from geomae_tpu.models import vfe as VF  # noqa: E402
from geomae_tpu.models.vfe import DynamicScatterVFE  # noqa: E402
from geomae_tpu.ops.voxelize import build_scene_batch  # noqa: E402

STEPS = 20


def main():
    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    rng = np.random.default_rng(0)
    batch = realistic_batch(rng, cfg, BATCH)
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(
        batch["points"], batch["point_valid"])
    jax.block_until_ready(jax.tree_util.tree_leaves(scene))

    model = DynamicScatterVFE(cfg.vfe, cfg.voxel, jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), scene, True)
    params, stats = variables["params"], variables["batch_stats"]

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor {floor * 1000:.1f} ms", flush=True)

    def make(grad):
        def loss(p, sc, salt):
            leaves, treedef = jax.tree_util.tree_flatten(sc)
            leaves = list(jax.lax.optimization_barrier(tuple(leaves)))
            leaves[0] = leaves[0] + salt
            sc = jax.tree_util.tree_unflatten(treedef, leaves)
            out, _ = model.apply({"params": p, "batch_stats": stats},
                                 sc, True, mutable=["batch_stats"])
            return out.astype(jnp.float32).sum()

        if grad:
            def fn(p, sc, salt):
                v, g = jax.value_and_grad(loss)(p, sc, salt)
                gs = jax.lax.optimization_barrier(
                    tuple(jax.tree_util.tree_leaves(g)))
                return v + sum(x.astype(jnp.float32).sum() for x in gs)
            return jax.jit(fn)
        return jax.jit(loss)

    for grad in (False, True):
        tag = "f+b" if grad else "fwd"
        results = {}
        for skip in (None, "none2", "mean", "maxb", "final"):
            VF._VFE_SKIP = None if skip in (None, "none2") else skip
            fn = make(grad)
            v = fn(params, scene, jnp.float32(0.0))
            float(v)
            t0 = time.perf_counter()
            for k in range(STEPS):
                v = fn(params, scene, jnp.float32(k) * 1e-9)
            float(v)
            ms = (time.perf_counter() - t0 - floor) / STEPS * 1000
            name = skip or "full"
            results[name] = ms
            print(f"{tag} {name:8s} {ms:7.2f} ms", flush=True)
            VF._VFE_SKIP = None
        full = results["none2"]
        for k in ("mean", "maxb", "final"):
            print(f"{tag} {k:8s} delta {full - results[k]:7.2f} ms")


if __name__ == "__main__":
    main()
