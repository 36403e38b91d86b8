#!/usr/bin/env python
"""Primitive census of the jitted pretrain step (TPU-path graph).

Traces ``make_train_step`` (abstract eval only — no compile, no device)
with the TPU backend detection patched on, then counts jaxpr primitives
and attributes the expensive ones (sort / scatter / gather / cumsum) to
their source lines.  Sorts and scatters are the TPU red flags: XLA lowers
an unsorted scatter to a sort, and ``searchsorted(method='sort')`` hides
one full sort per call.  Counts are pre-DCE — values that nothing
consumes (e.g. the CPU-fallback table build on the TPU path) still
appear; cross-check candidates against consumers before acting.

Usage: python tools/graph_census.py [--all]   (--all: every primitive)
"""
from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# abstract-eval-only analysis: always run on the CPU backend (tracing
# never lowers, so the TPU-path patch below is safe off-device)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax._src.source_info_util as siu  # noqa: E402

TRACKED = ("sort", "scatter", "scatter_add", "gather", "cumsum",
           "pallas_call")


def census(fn, *args):
    jx = jax.make_jaxpr(fn)(*args)
    cnt = collections.Counter()
    locs = collections.defaultdict(collections.Counter)

    def src(eq):
        fr = siu.user_frame(eq.source_info.traceback)
        if fr is None:
            return "?"
        return f"{os.path.basename(fr.file_name)}:{fr.start_line}"

    def walk(jaxpr):
        for eq in jaxpr.eqns:
            cnt[eq.primitive.name] += 1
            if eq.primitive.name in TRACKED:
                locs[eq.primitive.name][src(eq)] += 1
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for w in v:
                        if hasattr(w, "jaxpr"):
                            walk(w.jaxpr)

    walk(jx.jaxpr)
    return cnt, locs


def main():
    from geomae_tpu.config import CapsConfig, replace

    B = 4
    if "--finetune" in sys.argv:
        import jax.numpy as jnp
        from geomae_tpu.config import geomae_finetune_nus
        from geomae_tpu.train import finetune as ft

        cfg = geomae_finetune_nus()
        cfg = replace(cfg, caps=CapsConfig(max_points=262144,
                                           max_voxels=20480,
                                           max_visible=8192))
        state, tx = ft.init_state(cfg, B, jax.random.PRNGKey(0))
        import geomae_tpu.models.sst as sstm
        import geomae_tpu.ops.pallas_segreduce as psr
        sstm._is_tpu_backend = lambda: True
        psr._on_tpu = lambda: True
        from geomae_tpu.train.pretrain import dummy_batch
        batch = dummy_batch(cfg, B)
        G = cfg.max_gt_boxes
        batch.update(
            gt_boxes=jnp.zeros((B, G, 9), jnp.float32),
            gt_labels=jnp.zeros((B, G), jnp.int32),
            gt_mask=jnp.arange(G)[None].repeat(B, 0) < 16)
        step = ft.make_train_step(cfg, tx)
        cnt, locs = census(step, state, batch)
    else:
        cnt, locs = _census_pretrain(B)

    if "--all" in sys.argv:
        for k, v in sorted(cnt.items(), key=lambda t: -t[1]):
            print(f"{k:28s} {v}")
    print("summary:", {k: cnt.get(k, 0) for k in TRACKED})
    for p in TRACKED:
        if not locs[p]:
            continue
        print(f"== {p}")
        for loc, n in locs[p].most_common(20):
            print(f"  {loc:40s} {n}")


def _census_pretrain(B):
    from geomae_tpu.config import CapsConfig, geomae_pretrain_nus, replace
    from geomae_tpu.train.pretrain import (dummy_batch, init_state,
                                           make_train_step)

    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=262144, max_voxels=20480,
                                       max_visible=8192))
    state, tx = init_state(cfg, B, jax.random.PRNGKey(0))

    # patch AFTER init (init executes a jit; tracing alone never lowers)
    import geomae_tpu.models.sst as sstm
    import geomae_tpu.ops.pallas_segreduce as psr
    sstm._is_tpu_backend = lambda: True
    psr._on_tpu = lambda: True

    step = make_train_step(cfg, tx)
    batch = dummy_batch(cfg, B)
    return census(step, state, batch, jax.random.PRNGKey(1))


if __name__ == "__main__":
    main()
