#!/usr/bin/env python
"""Component attribution inside the MERGED attention backward kernel.

Replica of ops/pallas_attention_qkv._bwd_merged_kernel (non-pack path,
G=1) at decoder bench scale, with surgical ablations timed by chained
enqueue.  Ablated variants compute WRONG grads — deltas only.

Components: score recompute (s), dp matmul, p/ds area ops, the three
per-head grad matmuls (dq / dk / dv), the six weight-grad accumulators,
the dx projections, and the banded dkv accumulator read-modify-write.
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
TILE = int(os.environ.get("MB_TILE", "256"))
PAD = 192
WIDTH = TILE + 2 * PAD
REPS = 30
_NEG = -1e9
_EPS = 1e-9
PAD_R = ((PAD + TILE - 1) // TILE) * TILE
WACC = ((PAD_R - PAD + WIDTH + 15) // 16) * 16
ROWS_ACC = ((V - TILE + WACC + 15) // 16) * 16


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _kern(nv_ref, do_ref, st_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
          bv_ref, x_hbm, p_hbm, aux_hbm, dxq_ref, dkv_hbm, dwq_ref,
          dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, xbuf, pbuf,
          auxbuf, acc, wq_acc, bq_acc, wk_acc, bk_acc, wv_acc, bv_acc,
          sems, fsems, dsem, *, ablate):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * TILE
    l = b * nt + i
    slot = jax.lax.rem(l, 2)

    @pl.when((b == 0) & (i == 0))
    def _():
        for a in (wq_acc, bq_acc, wk_acc, bk_acc, wv_acc, bv_acc):
            a[...] = jnp.zeros_like(a)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def issue(bbi, ss, sl):
        pltpu.make_async_copy(x_hbm.at[bbi, pl.ds(ss, WIDTH), :],
                              xbuf.at[sl], sems.at[sl, 0]).start()
        pltpu.make_async_copy(p_hbm.at[bbi, pl.ds(ss, WIDTH), :],
                              pbuf.at[sl], sems.at[sl, 1]).start()
        pltpu.make_async_copy(aux_hbm.at[pl.ds(bbi, 1), :,
                                         pl.ds(ss, WIDTH)],
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

    for j in range(3):
        buf = (xbuf, pbuf, auxbuf)[j]
        pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                              sems.at[slot, j]).wait()
    xb = xbuf[slot]
    dt = xb.dtype
    if ablate == "empty":
        dxq_ref[0] = xb[PAD:PAD + TILE] + do_ref[0]
        return
    qk_b = xb + pbuf[slot]
    kb = (_dot(qk_b, wk_ref[0], ((1,), (0,))).astype(dt) + bk_ref[0])
    vb = (_dot(xb, wv_ref[0], ((1,), (0,))).astype(dt) + bv_ref[0])
    qk_t = qk_b[PAD:PAD + TILE]
    qt = (_dot(qk_t, wq_ref[0], ((1,), (0,))).astype(dt) + bq_ref[0])
    do = do_ref[0]

    wink = auxbuf[slot, 0, 0:1, :]
    kvk = auxbuf[slot, 0, 1:2, :]
    winq = st_ref[0, :, 3 * H:3 * H + 1]
    mask = (winq == wink) & (kvk > 0.5)
    bias = jnp.where(mask, 0.0, _NEG)

    qs = qt * (1.0 / D ** 0.5)
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        m = st_ref[0, :, h:h + 1]
        lrow = st_ref[0, :, H + h:H + h + 1]
        inv_l = jnp.where(lrow > 0, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
        dvo = st_ref[0, :, 2 * H + h:2 * H + h + 1]
        if ablate == "noscore":
            s = bias + m
        else:
            s = _dot(qs[:, sl], kb[:, sl], ((1,), (1,))) + bias
        if ablate == "nop":
            p = s
        else:
            p = jnp.exp(s - m) * inv_l
        if ablate == "nodp":
            dp = p
        else:
            dp = _dot(do[:, sl], vb[:, sl], ((1,), (1,)))
        ds = p if ablate == "nods" else p * (dp - dvo)
        dsc = ds.astype(dt)
        if ablate == "nodq":
            dq_parts.append(dsc[:, :D])
        else:
            dq_parts.append((_dot(dsc, kb[:, sl], ((1,), (0,)))
                             * (1.0 / D ** 0.5)).astype(dt))
        if ablate == "nodv":
            dv_parts.append(dsc[:D].T)
        else:
            dv_parts.append(_dot(p.astype(dt), do[:, sl],
                                 ((0,), (0,))).astype(dt))
        if ablate == "nodk":
            dk_parts.append(dsc[:D].T)
        else:
            dk_parts.append(_dot(dsc, qs[:, sl], ((0,), (0,))).astype(dt))
    dqc = jnp.concatenate(dq_parts, axis=1)
    dkc = jnp.concatenate(dk_parts, axis=1)
    dvc = jnp.concatenate(dv_parts, axis=1)

    dxq_ref[0] = _dot(dqc, wq_ref[0], ((1,), (1,))).astype(dt)
    if ablate != "nowgrads":
        wq_acc[...] += _dot(qk_t, dqc, ((0,), (0,)))
        bq_acc[...] += jnp.sum(dqc.astype(jnp.float32), axis=0,
                               keepdims=True)
        wk_acc[...] += _dot(qk_b, dkc, ((0,), (0,)))
        bk_acc[...] += jnp.sum(dkc.astype(jnp.float32), axis=0,
                               keepdims=True)
        wv_acc[...] += _dot(xb, dvc, ((0,), (0,)))
        bv_acc[...] += jnp.sum(dvc.astype(jnp.float32), axis=0,
                               keepdims=True)

    if ablate != "noacc":
        dxkv = (_dot(dkc, wk_ref[0], ((1,), (1,)))
                + _dot(dvc, wv_ref[0], ((1,), (1,)))).astype(acc.dtype)
        off = PAD_R - PAD
        contrib = jnp.pad(dxkv, ((off, WACC - off - WIDTH), (0, 0)))
        win = acc[pl.ds(start, WACC), :]
        acc[pl.ds(start, WACC), :] = win + contrib

    @pl.when(i == nt - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dkv_hbm.at[b], dsem)
        cp.start()
        cp.wait()

    @pl.when((b == B - 1) & (i == nt - 1))
    def _():
        accs = (wq_acc, bq_acc, wk_acc, bk_acc, wv_acc, bv_acc)
        outs = (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref)
        for j, (a, o) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(a, o.at[0], fsems.at[j]).start()
        for j, (a, o) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(a, o.at[0], fsems.at[j]).wait()


def make_fn(ablate):
    kern = functools.partial(_kern, ablate=ablate)
    nt = V // TILE
    f = jnp.float32
    w = lambda: pl.BlockSpec((1, C, C), lambda b, i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    bias = lambda: pl.BlockSpec((1, 1, C), lambda b, i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    tok = lambda c: pl.BlockSpec((1, TILE, c), lambda b, i, *_: (b, i, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[tok(C), tok(3 * H + 1), w(), bias(), w(), bias(), w(),
                  bias(), anyspec, anyspec, anyspec],
        out_specs=(tok(C), anyspec, anyspec, anyspec, anyspec, anyspec,
                   anyspec, anyspec),
        scratch_shapes=[
            pltpu.VMEM((2, WIDTH, C), jnp.bfloat16),
            pltpu.VMEM((2, WIDTH, C), jnp.bfloat16),
            pltpu.VMEM((2, 1, 2, WIDTH), f),
            pltpu.VMEM((ROWS_ACC, C), jnp.bfloat16),
            pltpu.VMEM((C, C), f), pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, C), f), pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, C), f), pltpu.VMEM((1, C), f),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def fn(nv, do, st, ws, xp, pp, aux):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((B, V, C), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, ROWS_ACC, C), jnp.bfloat16),
                       jax.ShapeDtypeStruct((1, C, C), f),
                       jax.ShapeDtypeStruct((1, 1, C), f),
                       jax.ShapeDtypeStruct((1, C, C), f),
                       jax.ShapeDtypeStruct((1, 1, C), f),
                       jax.ShapeDtypeStruct((1, C, C), f),
                       jax.ShapeDtypeStruct((1, 1, C), f)),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(nv, do, st, *ws, xp, pp, aux)

    return fn


def main():
    rng = np.random.default_rng(0)
    fb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    Vp = V + 2 * PAD
    xp, pp = fb(B, Vp, C), fb(B, Vp, C)
    do = fb(B, V, C)
    ws = []
    for _ in range(3):
        ws += [fb(1, C, C), fb(1, 1, C)]
    win = np.repeat(np.arange(V // 96 + 1), 96)[:V].astype(np.float32)
    st = np.zeros((B, V, 3 * H + 1), np.float32)
    st[:, :, :H] = 2.0                       # m
    st[:, :, H:2 * H] = 30.0                 # lsum
    st[:, :, 2 * H:3 * H] = 0.1              # dvo
    st[:, :, 3 * H] = win[None]
    st = jnp.asarray(st)
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

    print(f"tile {TILE} width {WIDTH}", flush=True)
    variants = ("full", "full2", "noscore", "nop", "nodp", "nods",
                "nodq", "nodv", "nodk", "nowgrads", "noacc", "empty")
    if os.environ.get("MB_ONLY"):
        variants = ("full", "full2", "empty")
    results = {}
    for ablate in variants:
        fn = jax.jit(make_fn("full" if ablate == "full2" else ablate))
        outs = fn(nv, do, st, ws, xp, pp, aux)
        outs = fn(nv, do, st, ws, xp, pp, aux)
        float(outs[0][0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            outs = fn(nv, do, st, ws, xp, pp, aux)
        float(outs[0][0, 0, 0])
        ms = (time.perf_counter() - t0 - floor) / REPS * 1000
        results[ablate] = ms
        print(f"{ablate:12s} {ms:7.3f} ms/pass", flush=True)

    full = results["full2"]
    for k in variants[2:]:
        print(f"{k:12s} delta {full - results[k]:7.3f} ms")


if __name__ == "__main__":
    main()
