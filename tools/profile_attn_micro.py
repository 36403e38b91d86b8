#!/usr/bin/env python
"""Component attribution INSIDE the band qkv attention forward kernel.

Replicates ops/pallas_attention_qkv._fwd_kernel at decoder bench scale
([8, 20480, 128], tile 256, pad 192) with surgical ablations, timed by
chained enqueue.  Variant deltas attribute the per-pass cost to: the two
banded DMA streams, q/k/v projections, the score matmul, softmax
(max/exp/normalize), the AV matmul, and the stats writes.  Ablated
variants compute WRONG attention — they exist only to subtract.
"""
from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, V, C, H = 8, 20480, 128, 8
D = C // H
TILE, PAD = 256, 192
WIDTH = TILE + 2 * PAD
REPS = 30
_NEG = -1e9
_EPS = 1e-9


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _kern(nv_ref, winq_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
          x_hbm, p_hbm, aux_hbm, out_ref, stats_ref, xbuf, pbuf, auxbuf,
          sems, *, ablate):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * TILE
    l = b * nt + i
    slot = jax.lax.rem(l, 2)

    def issue(bb, ss, sl):
        pltpu.make_async_copy(x_hbm.at[bb, pl.ds(ss, WIDTH), :],
                              xbuf.at[sl], sems.at[sl, 0]).start()
        if ablate != "nodma_pos":
            pltpu.make_async_copy(p_hbm.at[bb, pl.ds(ss, WIDTH), :],
                                  pbuf.at[sl], sems.at[sl, 1]).start()
        pltpu.make_async_copy(aux_hbm.at[pl.ds(bb, 1), :, pl.ds(ss, WIDTH)],
                              auxbuf.at[sl], sems.at[sl, 2]).start()

    @pl.when(l == 0)
    def _():
        issue(b, start, slot)

    nb = b + (i + 1) // nt
    ni = jax.lax.rem(i + 1, nt)
    next_exists = l + 1 < pl.num_programs(0) * nt

    @pl.when(next_exists)
    def _():
        issue(jnp.minimum(nb, pl.num_programs(0) - 1), ni * TILE, 1 - slot)

    js = (0, 2) if ablate == "nodma_pos" else (0, 1, 2)
    for j in js:
        buf = (xbuf, pbuf, auxbuf)[j]
        pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                              sems.at[slot, j]).wait()
    xb = xbuf[slot]
    dt = xb.dtype
    qk_b = xb if ablate == "nodma_pos" else xb + pbuf[slot]

    if ablate == "noproj":
        kb, vb, qt = qk_b, xb, qk_b[PAD:PAD + TILE]
    else:
        kb = (_dot(qk_b, wk_ref[0], ((1,), (0,))).astype(dt) + bk_ref[0])
        vb = (_dot(xb, wv_ref[0], ((1,), (0,))).astype(dt) + bv_ref[0])
        qt = (_dot(qk_b[PAD:PAD + TILE], wq_ref[0],
                   ((1,), (0,))).astype(dt) + bq_ref[0])

    wink = auxbuf[slot, 0, 0:1, :]
    kvk = auxbuf[slot, 0, 1:2, :]
    winq = winq_ref[0, :, 0:1]
    mask = (winq == wink) & (kvk > 0.5)
    bias = jnp.where(mask, 0.0, _NEG)
    nonempty = jnp.max(bias, axis=-1, keepdims=True) > -1.0
    ones = jnp.ones((WIDTH, 1), jnp.float32)

    qt = qt * (1.0 / D ** 0.5)
    onecol = jnp.ones((WIDTH, 1), jnp.bfloat16)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        if ablate == "noscore":
            s = bias + jnp.sum(qt[:, sl], axis=-1,
                               keepdims=True).astype(jnp.float32)
        else:
            s = _dot(qt[:, sl], kb[:, sl], ((1,), (1,))) + bias
        if ablate == "nosoftmax":
            e = s
            m = s[:, 0:1]
            lsum = s[:, 1:2]
        else:
            if ablate == "nomax":
                m = s[:, 0:1]
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
            e = (s - m) if ablate == "noexp" else jnp.exp(s - m)
            if ablate == "nolsum":
                lsum = e[:, 0:1]
            elif ablate == "lsum_vpu":
                lsum = jnp.sum(e, axis=-1, keepdims=True)
                lsum = jnp.where(nonempty, lsum, 0.0)
            elif ablate == "av_aug":
                lsum = None
            else:
                lsum = _dot(e, ones, ((1,), (0,)))
                lsum = jnp.where(nonempty, lsum, 0.0)
        if ablate == "noav":
            o = e[:, :D] + vb[:D, sl].astype(jnp.float32).sum()
        elif ablate == "av_aug":
            vb_aug = jnp.concatenate([vb[:, sl], onecol], axis=1)
            o_ext = _dot(e.astype(vb.dtype), vb_aug, ((1,), (0,)))
            o = o_ext[:, :D]
            lsum = jnp.where(nonempty, o_ext[:, D:D + 1], 0.0)
        else:
            o = _dot(e.astype(vb.dtype), vb[:, sl], ((1,), (0,)))
        o = jnp.where(nonempty, o / jnp.maximum(lsum, _EPS), 0.0)
        out_ref[0, :, sl] = o.astype(out_ref.dtype)
        if ablate != "nostats":
            stats_ref[0, :, h:h + 1] = m
            stats_ref[0, :, H + h:H + h + 1] = lsum


def make_fn(ablate):
    kern = functools.partial(_kern, ablate=ablate)
    nt = V // TILE
    w = lambda: pl.BlockSpec((1, C, C), lambda b, i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    bias = lambda: pl.BlockSpec((1, 1, C), lambda b, i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, TILE, 1), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            w(), bias(), w(), bias(), w(), bias(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2 * H), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIDTH, C), jnp.bfloat16),
            pltpu.VMEM((2, WIDTH, C), jnp.bfloat16),
            pltpu.VMEM((2, 1, 2, WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    def fn(nv, winq, ws, xp, pp, aux):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((B, V, C), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, V, 2 * H), jnp.float32)),
        )(nv, winq, *ws, xp, pp, aux)

    return fn


def main():
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    Vp = V + 2 * PAD
    xp, pp = f(B, Vp, C), f(B, Vp, C)
    ws = []
    for _ in range(3):
        ws += [f(1, C, C), f(1, 1, C)]
    win = np.repeat(np.arange(V // 96 + 1), 96)[:V].astype(np.float32)
    winq = jnp.asarray(np.broadcast_to(win[None, :, None], (B, V, 1)))
    aux = np.full((B, 2, Vp), 2.0 ** 25, np.float32)
    aux[:, 0, PAD:PAD + V] = win[None]
    aux[:, 1, PAD:PAD + V] = 1.0
    aux = jnp.asarray(aux)
    nv = jnp.full((B,), V, jnp.int32)

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(null(jnp.float32(i)))
    floor = (time.perf_counter() - t0) / 8
    print(f"fetch floor {floor * 1000:.1f} ms", flush=True)

    results = {}
    for ablate in ("full", "full2", "nostats", "noexp", "nosoftmax",
                   "nomax", "nolsum", "lsum_vpu", "av_aug",
                   "noscore", "noav", "noproj", "nodma_pos"):
        fn = jax.jit(make_fn("full" if ablate == "full2" else ablate))
        out, stats = fn(nv, winq, ws, xp, pp, aux)   # compile + warm
        out, stats = fn(nv, winq, ws, xp, pp, aux)
        float(stats[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out, stats = fn(nv, winq, ws, xp, pp, aux)
        float(stats[0, 0, 0])
        ms = (time.perf_counter() - t0 - floor) / REPS * 1000
        results[ablate] = ms
        print(f"{ablate:12s} {ms:7.3f} ms/pass", flush=True)

    full = results["full2"]
    for k in ("nostats", "noexp", "nosoftmax", "nomax", "nolsum",
              "lsum_vpu", "av_aug", "noscore", "noav", "noproj",
              "nodma_pos"):
        print(f"{k:12s} delta {full - results[k]:7.3f} ms")


if __name__ == "__main__":
    main()
