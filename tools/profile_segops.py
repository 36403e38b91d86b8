#!/usr/bin/env python
"""Per-op timing of the production segment kernels at bench shapes,
with a chunk-size A/B (GEOMAE_SEGPROF_CHUNKS="256,512" default).

Methodology: data generated ON DEVICE in one jit (the relay uploads at
~MB/s), chained enqueue with a final value fetch, fetch floor
subtracted, each case measured twice and the SECOND rep kept
(first-measured-program warmup penalty, ARCHITECTURE.md round-3 notes).

Round-5 finding recorded here: casting the one-hot routing dots to bf16
(split3 8+8+8 payload split so every operand stays bf16-representable)
was NEUTRAL per-op (deltas within +/-0.3 ms noise) and a NET LOSS
end-to-end (21.93 -> 20.32 samples/s) — these kernels are grid-overhead/
VPU-bound, not MXU-rate-bound, so the f32 dots stayed.
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

B, P, VCAP = 4, 262144, 20480
STEPS = 30


def main():
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 6)
        ids = jnp.minimum(jnp.arange(P, dtype=jnp.int32) // 13,
                          VCAP - 1)[None].repeat(B, 0)
        slot = jax.random.randint(ks[0], (B, P), 0, 128, jnp.int32)
        x3 = jax.random.normal(ks[1], (B, 3, P), jnp.float32)
        x64 = jax.random.normal(ks[2], (B, 64, P), jnp.bfloat16)
        x128 = jax.random.normal(ks[3], (B, 128, P), jnp.bfloat16)
        v4 = jax.random.normal(ks[4], (B, 4, P), jnp.float32)
        feats = jax.random.normal(ks[5], (B, VCAP, 13), jnp.float32)
        key13 = (jnp.arange(VCAP, dtype=jnp.int32) * 7)[None].repeat(B, 0)
        tab128 = jax.random.normal(ks[0], (B, 128, VCAP), jnp.float32)
        return ids, slot, x3, x64, x128, v4, feats, key13, tab128

    arrs = gen(jax.random.PRNGKey(0))
    float(arrs[2][0, 0, 0])     # completion barrier (fetch a value)
    ids, slot, x3, x64, x128, v4, feats, key13, tab128 = arrs

    from geomae_tpu.ops import pallas_segreduce_t as T
    from geomae_tpu.ops.pallas_segreduce import expand_rows_pallas

    def build(ck):
        """(name, fn(x, salt)->scalar, x) list; arrays ride as jit ARGS
        (closure constants 413 the relay's remote-compile call)."""
        def wrap(f, grad):
            if grad:
                def g(x, s):
                    v, gr = jax.value_and_grad(f)(x, s)
                    return v + gr.astype(jnp.float32).sum()
                return jax.jit(g)
            return jax.jit(f)

        cases = [
            ("mean3 f+b", wrap(lambda x, s: T.segment_broadcast_t(
                x + s, ids, VCAP, "mean", ck).astype(jnp.float32).sum(),
                True), x3),
            ("max64 f+b", wrap(lambda x, s: T.segment_broadcast_t(
                x + s.astype(jnp.bfloat16), ids, VCAP,
                "max", ck).astype(jnp.float32).sum(), True), x64),
            ("red128max f+b", wrap(lambda x, s: jnp.where(
                (m := T.segment_reduce_t(
                    x + s.astype(jnp.bfloat16), ids, VCAP, True, ck)
                 .astype(jnp.float32)) > -1e38, m, 0.0).sum(), True),
                x128),
            ("slot4 fwd", wrap(lambda x, s: T.slot_outer_segment_sum_t(
                x + s, slot, ids, 128, VCAP, ck).sum(), False), v4),
            ("expand13 fwd", wrap(lambda x, s: expand_rows_pallas(
                x + s, key13, 160000, ck).sum(), False), feats),
            ("gather128 fwd", wrap(lambda x, s: T.segment_gather_t(
                x + s, ids, ck).astype(jnp.float32).sum(), False),
                tab128),
        ]
        return cases

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"floor {floor * 1000:.2f} ms", flush=True)

    chunks = [int(c) for c in os.environ.get(
        "GEOMAE_SEGPROF_CHUNKS", "256,512").split(",")]
    results = {}
    for rep in range(2):
        for ck in chunks:
            for name, fn, x in build(ck):
                v = fn(x, jnp.float32(0.0))
                float(v)                       # compile + warm
                t0 = time.perf_counter()
                for k in range(STEPS):
                    v = fn(x, jnp.float32(k) * 1e-9)
                float(v)
                ms = (time.perf_counter() - t0 - floor) / STEPS * 1000
                results[(name, ck, rep)] = ms
                print(f"rep{rep} ck{ck:4d} {name:14s} {ms:7.3f} ms",
                      flush=True)
    print("\n== second-rep by chunk ==")
    names = dict.fromkeys(n for (n, c, r) in results)
    for name in names:
        row = "  ".join(f"ck{c}={results[(name, c, 1)]:7.3f}"
                        for c in chunks)
        print(f"{name:14s} {row}")


if __name__ == "__main__":
    main()
