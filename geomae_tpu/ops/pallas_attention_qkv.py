"""Band window attention with IN-KERNEL q/k/v projections (Pallas TPU).

Extends ``ops/pallas_attention.py``: instead of projecting q/k/v in XLA
(three [B, V, C] materializations + two padded K/V band copies per layer
pass, and the mirrored dq/dk/dv tensors in backward), these kernels DMA
the raw residual-stream band ``x`` and the positional-embedding band once
and compute

  q = (x + pos) @ Wq + bq        (queries: center slice of the band)
  k = (x + pos) @ Wk + bk        (keys/values: the whole band)
  v =  x        @ Wv + bv

inside VMEM — the projection weights (3 x [C, C] bf16 ~ 98 KB) stay
resident.  The k/v projections are recomputed per overlapping band
(width/tile ~ 2.5x extra MXU work — free, the step is bandwidth-bound),
and the backward kernels recompute them again instead of storing
anything, producing ``dx`` directly (dq@Wq^T per query tile;
dk@Wk^T + dv@Wv^T per key tile) with the weight gradients accumulated in
f32 VMEM scratch and flushed once per parameter group.

``pos`` is the sinusoidal in-window embedding — a constant w.r.t. the
step's parameters — so no pos cotangent exists (the XLA path discards it
too).  Grouped stacks (the batched decoder pair) pass weights [G, C, C]
with tokens group-major, exactly like ``ops/pallas_ffn.py``.

Attention math, masking, band geometry, and the flash-style backward
split are identical to ``ops/pallas_attention.py`` (reference semantics:
``/root/reference/mmdet3d/models/sst/sst_basic_block.py:36-59``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import DEFAULT_PAD, DEFAULT_TILE, _EPS, _NEG, _PAD_WIN


def _band_inputs_x(x, pos, win_id, key_valid, pad):
    B, V, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    pp = jnp.pad(pos.astype(x.dtype), ((0, 0), (pad, pad), (0, 0)))
    win_f = jnp.where(win_id >= 2 ** 24, 2.0 ** 25,
                      win_id.astype(jnp.float32))
    aux = jnp.stack([
        jnp.pad(win_f, ((0, 0), (pad, pad)), constant_values=_PAD_WIN),
        jnp.pad(key_valid.astype(jnp.float32), ((0, 0), (pad, pad))),
    ], axis=1)                                      # [B, 2, Vp] lane-major
    return xp, pp, aux, win_f


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _pack_on() -> bool:
    """Packed-heads experiment (heads ride sublane blocks; full-K score
    matmuls).  Measured SLOWER than the per-head loop on v5e forward
    (5.79 vs 4.71 ms/layer at decoder scale — the loop's padded matmuls
    already run at ~50% MXU and packing only adds mask traffic), and the
    packed backward's [tile,1] stat concats hit a Mosaic concat
    limitation.  Kept opt-in for future hardware; default OFF."""
    import os
    return os.environ.get("GEOMAE_ATTN_PACK", "0") == "1"


def _head_tiled(t, reps):
    """Stack ``reps`` copies of ``t`` along sublanes: [R, ...] -> [reps*R, ...]."""
    return jnp.concatenate([t] * reps, axis=0)


def _head_mask(rows, C, tile, head_dim, h0):
    """[rows, C] bool: row block j (of ``tile`` rows) selects head h0+j's
    ``head_dim`` lane slice.  The packed-head layout's only bookkeeping."""
    rowh = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) // tile + h0
    colh = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 1) // head_dim
    return rowh == colh


def _scale_pow2(head_dim: int) -> bool:
    """True iff 1/sqrt(head_dim) is a power of two (head_dim a power of
    FOUR) — then folding the softmax scale into q is bit-exact in any
    float dtype."""
    lb = head_dim.bit_length() - 1
    return head_dim == (1 << lb) and lb % 2 == 0


def _proj(t, w_ref, b_ref, dt):
    """(t @ W + b) with f32 accumulation, cast to the compute dtype."""
    return (_dot(t, w_ref[0], ((1,), (0,))).astype(dt) + b_ref[0])


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(nv_ref, winq_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, x_hbm, p_hbm, aux_hbm, out_ref, stats_ref,
                xbuf, pbuf, auxbuf, sems, *, tile, pad, width, nheads,
                head_dim, pack):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    def issue(bb, ss, sl):
        pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ss, width), :], xbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            p_hbm.at[bb, pl.ds(ss, width), :], pbuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(bb, 1), :, pl.ds(ss, width)], auxbuf.at[sl],
            sems.at[sl, 2]).start()

    @pl.when((l == 0) & cur_valid)
    def _():
        issue(b, start, slot)

    nb = b + (i + 1) // nt
    ni = jax.lax.rem(i + 1, nt)
    next_exists = l + 1 < pl.num_programs(0) * nt
    next_valid = next_exists & (ni * tile < nv_ref[
        jnp.minimum(nb, pl.num_programs(0) - 1)])

    @pl.when(next_valid)
    def _():
        issue(nb, ni * tile, 1 - slot)

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(cur_valid)
    def _():
        for j in range(3):
            buf = (xbuf, pbuf, auxbuf)[j]
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, j]).wait()
        xb = xbuf[slot]                              # [width, C]
        dt = xb.dtype
        qk_b = xb + pbuf[slot]
        kb = _proj(qk_b, wk_ref, bk_ref, dt)         # [width, C]
        vb = _proj(xb, wv_ref, bv_ref, dt)
        qt = _proj(qk_b[pad:pad + tile], wq_ref, bq_ref, dt)   # [tile, C]

        wink = auxbuf[slot, 0, 0:1, :]               # [1, width]
        kvk = auxbuf[slot, 0, 1:2, :]
        winq = winq_ref[0, :, 0:1]                   # [tile, 1]
        mask = (winq == wink) & (kvk > 0.5)
        bias = jnp.where(mask, 0.0, _NEG)
        nonempty = jnp.max(bias, axis=-1, keepdims=True) > -1.0
        ones = jnp.ones((width, 1), jnp.float32)

        scale = 1.0 / (head_dim ** 0.5)
        if pack:
            # PACKED HEADS: heads ride SUBLANE blocks — q is tiled H times
            # along rows and masked to its head's lane slice, so the score
            # matmul contracts the full C=128 lanes ONCE for all heads
            # ([H*tile, width]); per-head lane slicing (a Mosaic relayout
            # per [.., 16] slice) and the 16->128 K-padding of H separate
            # matmuls both disappear.  Softmax is purely row-wise; head
            # structure only reappears as cheap sublane-block selects.
            C = nheads * head_dim
            qp = jnp.where(_head_mask(nheads * tile, C, tile, head_dim, 0),
                           _head_tiled(qt, nheads), 0)
            s = _dot(qp, kb, ((1,), (1,))) * scale \
                + _head_tiled(bias, nheads)          # [H*tile, width] f32
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            lsum = _dot(e, ones, ((1,), (0,)))
            ne_t = _head_tiled(nonempty, nheads)
            lsum = jnp.where(ne_t, lsum, 0.0)
            inv = jnp.where(ne_t, 1.0 / jnp.maximum(lsum, _EPS), 0.0)
            op = _dot((e * inv).astype(vb.dtype), vb, ((1,), (0,)))
            colh = (jax.lax.broadcasted_iota(jnp.int32, (tile, C), 1)
                    // head_dim)
            o = jnp.zeros((tile, C), jnp.float32)
            for h in range(nheads):
                o = o + jnp.where(colh == h,
                                  op[h * tile:(h + 1) * tile], 0.0)
            out_ref[0] = o.astype(out_ref.dtype)
            for h in range(nheads):
                stats_ref[0, :, h:h + 1] = m[h * tile:(h + 1) * tile]
                stats_ref[0, :, nheads + h:nheads + h + 1] = \
                    lsum[h * tile:(h + 1) * tile]
        else:
            # fold the softmax scale into the q tile: one [tile, C] mul
            # replaces a [tile, width] f32 mul PER HEAD.  Bit-exact when
            # head_dim is a power of four (scale = 2^-k commutes with
            # rounding); otherwise keep the score-side mul.
            fold = _scale_pow2(head_dim)
            if fold:
                qt = qt * scale
            for h in range(nheads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                s = _dot(qt[:, sl], kb[:, sl], ((1,), (1,)))
                s = (s + bias) if fold else (s * scale + bias)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                # VPU lane-sum beats the MXU ones-matmul (whose [tile, 1]
                # output pads N to 128 lanes — it costs a full AV):
                # measured -0.68 ms/pass at decoder scale
                # (tools/profile_attn_micro.py)
                lsum = jnp.sum(e, axis=-1, keepdims=True)
                lsum = jnp.where(nonempty, lsum, 0.0)
                o = _dot(e.astype(vb.dtype), vb[:, sl], ((1,), (0,)))
                o = jnp.where(nonempty, o / jnp.maximum(lsum, _EPS), 0.0)
                out_ref[0, :, sl] = o.astype(out_ref.dtype)
                stats_ref[0, :, h:h + 1] = m
                stats_ref[0, :, nheads + h:nheads + h + 1] = lsum


def _grp_specs(C, bb):
    w = lambda: pl.BlockSpec((1, C, C), lambda b, i, *_: (b // bb, 0, 0),
                             memory_space=pltpu.VMEM)
    bias = lambda: pl.BlockSpec((1, 1, C), lambda b, i, *_: (b // bb, 0, 0),
                                memory_space=pltpu.VMEM)
    return [w(), bias(), w(), bias(), w(), bias()]


def _prep_w(dt, wq, bq, wk, bk, wv, bv):
    return (wq.astype(dt), bq.astype(dt)[:, None], wk.astype(dt),
            bk.astype(dt)[:, None], wv.astype(dt), bv.astype(dt)[:, None])


def _forward(x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, tile, pad,
             interpret):
    B, V, C = x.shape
    G = wq.shape[0]
    bb = B // G
    nt = V // tile
    width = tile + 2 * pad
    if not interpret:
        assert width % 128 == 0, (tile, pad)
    xp, pp, aux, win_f = _band_inputs_x(x, pos, win_id, key_valid, pad)
    nv = jnp.max(jnp.where(win_f < 2.0 ** 24,
                       jnp.arange(win_f.shape[1], dtype=jnp.int32)
                       + 1, 0), axis=1).astype(jnp.int32)
    # EXTENT (last real slot + 1), not a count: the tile-packed
    # layout intersperses bucket-slack holes, so a count would
    # skip real trailing tiles; for the compact band layout the
    # two coincide
    return xp, pp, aux, win_f, nv, bb, nt, width


def _pallas_forward(x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid,
                    nheads, tile, pad, interpret):
    B, V, C = x.shape
    G = wq.shape[0]
    xp, pp, aux, win_f, nv, bb, nt, width = _forward(
        x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, tile, pad,
        interpret)
    kern = functools.partial(_fwd_kernel, tile=tile, pad=pad, width=width,
                             nheads=nheads, head_dim=C // nheads,
                             pack=_pack_on())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ] + _grp_specs(C, bb) + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2 * nheads), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, 1, 2, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, V, C), x.dtype),
            jax.ShapeDtypeStruct((B, V, 2 * nheads), jnp.float32),
        ),
        interpret=interpret,
    )(nv, win_f[:, :, None], *_prep_w(x.dtype, wq, bq, wk, bk, wv, bv),
      xp, pp, aux)
    return out, stats


# ---------------------------------------------------------------------------
# backward: dx_q over query tiles (+ dWq), dx_kv over key tiles (+ dWk/dWv)
# ---------------------------------------------------------------------------


def _dq_kernel(nv_ref, do_ref, st_ref, winq_ref, wq_ref, bq_ref, wk_ref,
               bk_ref, wv_ref, bv_ref, x_hbm, p_hbm, aux_hbm,
               dxq_ref, dwq_ref, dbq_ref, xbuf, pbuf, auxbuf, wq_acc,
               bq_acc, sems, fsems, *, tile, pad, width, nheads, head_dim,
               bb):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    @pl.when((jax.lax.rem(b, bb) == 0) & (i == 0))
    def _():
        wq_acc[...] = jnp.zeros_like(wq_acc)
        bq_acc[...] = jnp.zeros_like(bq_acc)

    def issue(bbi, ss, sl):
        pltpu.make_async_copy(
            x_hbm.at[bbi, pl.ds(ss, width), :], xbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            p_hbm.at[bbi, pl.ds(ss, width), :], pbuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(bbi, 1), :, pl.ds(ss, width)], auxbuf.at[sl],
            sems.at[sl, 2]).start()

    @pl.when((l == 0) & cur_valid)
    def _():
        issue(b, start, slot)

    nb = b + (i + 1) // nt
    ni = jax.lax.rem(i + 1, nt)
    next_exists = l + 1 < pl.num_programs(0) * nt
    next_valid = next_exists & (ni * tile < nv_ref[
        jnp.minimum(nb, pl.num_programs(0) - 1)])

    @pl.when(next_valid)
    def _():
        issue(nb, ni * tile, 1 - slot)

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        dxq_ref[...] = jnp.zeros_like(dxq_ref)

    @pl.when(cur_valid)
    def _():
        for j in range(3):
            buf = (xbuf, pbuf, auxbuf)[j]
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, j]).wait()
        xb = xbuf[slot]
        dt = xb.dtype
        qk_b = xb + pbuf[slot]
        kb = _proj(qk_b, wk_ref, bk_ref, dt)
        vb = _proj(xb, wv_ref, bv_ref, dt)
        qk_t = qk_b[pad:pad + tile]
        qt = _proj(qk_t, wq_ref, bq_ref, dt)
        do = do_ref[0]

        wink = auxbuf[slot, 0, 0:1, :]
        kvk = auxbuf[slot, 0, 1:2, :]
        winq = winq_ref[0, :, 0:1]
        mask = (winq == wink) & (kvk > 0.5)
        bias = jnp.where(mask, 0.0, _NEG)

        scale = 1.0 / (head_dim ** 0.5)
        fold = _scale_pow2(head_dim)
        if fold:
            qt = qt * scale
        dq_parts = []   # static per-head concat (Mosaic cannot lower
        for h in range(nheads):     # dynamic_update_slice inside pl.when)
            sl = slice(h * head_dim, (h + 1) * head_dim)
            m = st_ref[0, :, h:h + 1]
            lrow = st_ref[0, :, nheads + h:nheads + h + 1]
            inv_l = jnp.where(lrow > 0, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
            dvo = st_ref[0, :, 2 * nheads + h:2 * nheads + h + 1]
            s = _dot(qt[:, sl], kb[:, sl], ((1,), (1,)))
            s = (s + bias) if fold else (s * scale + bias)
            p = jnp.exp(s - m) * inv_l
            dp = _dot(do[:, sl], vb[:, sl], ((1,), (1,)))
            ds = p * (dp - dvo)
            dq_parts.append(_dot(ds.astype(kb.dtype), kb[:, sl],
                                 ((1,), (0,))) * scale)
        dq = jnp.concatenate(dq_parts, axis=1)
        dqc = dq.astype(dt)
        # dx (query side) and the Wq grads
        dxq_ref[0] = _dot(dqc, wq_ref[0], ((1,), (1,))).astype(dt)
        wq_acc[...] += _dot(qk_t, dqc, ((0,), (0,)))
        bq_acc[...] += jnp.sum(dq, axis=0, keepdims=True)

    @pl.when((jax.lax.rem(b, bb) == bb - 1) & (i == nt - 1))
    def _():
        g = b // bb
        pltpu.make_async_copy(wq_acc, dwq_ref.at[g], fsems.at[0]).start()
        pltpu.make_async_copy(bq_acc, dbq_ref.at[g], fsems.at[1]).start()
        pltpu.make_async_copy(wq_acc, dwq_ref.at[g], fsems.at[0]).wait()
        pltpu.make_async_copy(bq_acc, dbq_ref.at[g], fsems.at[1]).wait()


def _dkv_kernel(nv_ref, aux_t_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, x_hbm, p_hbm, do_hbm, qs_hbm,
                dxkv_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                xbuf, pbuf, dobuf, qsbuf, wk_acc, bk_acc, wv_acc, bv_acc,
                sems, fsems, *, tile, pad, width, nheads, head_dim, bb):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    @pl.when((jax.lax.rem(b, bb) == 0) & (i == 0))
    def _():
        for acc in (wk_acc, bk_acc, wv_acc, bv_acc):
            acc[...] = jnp.zeros_like(acc)

    def issue(bbi, ss, sl):
        pltpu.make_async_copy(
            x_hbm.at[bbi, pl.ds(ss, width), :], xbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            p_hbm.at[bbi, pl.ds(ss, width), :], pbuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            do_hbm.at[bbi, pl.ds(ss, width), :], dobuf.at[sl],
            sems.at[sl, 2]).start()
        pltpu.make_async_copy(
            qs_hbm.at[pl.ds(bbi, 1), :, pl.ds(ss, width)], qsbuf.at[sl],
            sems.at[sl, 3]).start()

    @pl.when((l == 0) & cur_valid)
    def _():
        issue(b, start, slot)

    nb = b + (i + 1) // nt
    ni = jax.lax.rem(i + 1, nt)
    next_exists = l + 1 < pl.num_programs(0) * nt
    next_valid = next_exists & (ni * tile < nv_ref[
        jnp.minimum(nb, pl.num_programs(0) - 1)])

    @pl.when(next_valid)
    def _():
        issue(nb, ni * tile, 1 - slot)

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        dxkv_ref[...] = jnp.zeros_like(dxkv_ref)

    @pl.when(cur_valid)
    def _():
        for j in range(4):
            buf = (xbuf, pbuf, dobuf, qsbuf)[j]
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, j]).wait()
        xb = xbuf[slot]
        dt = xb.dtype
        qk_b = xb + pbuf[slot]
        qk_t = qk_b[pad:pad + tile]                  # key tile's (x+pos)
        x_t = xb[pad:pad + tile]
        kt = _proj(qk_t, wk_ref, bk_ref, dt)         # [tile, C]
        vt = _proj(x_t, wv_ref, bv_ref, dt)
        qb = _proj(qk_b, wq_ref, bq_ref, dt)         # [width, C]
        dob = dobuf[slot]                            # [width, C]

        win_t = aux_t_ref[0, :, 0:1]                 # [tile, 1]
        kv_t = aux_t_ref[0, :, 1:2]
        winq = qsbuf[slot, 0, 3 * nheads:3 * nheads + 1, :]   # [1, width]
        mask = (win_t == winq) & (kv_t > 0.5)
        bias = jnp.where(mask, 0.0, _NEG)

        scale = 1.0 / (head_dim ** 0.5)
        fold = _scale_pow2(head_dim)
        if fold:
            qb = qb * scale
        dk_parts, dv_parts = [], []     # static concat, see _dq body
        for h in range(nheads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            m = qsbuf[slot, 0, h:h + 1, :]                     # [1, width]
            lrow = qsbuf[slot, 0, nheads + h:nheads + h + 1, :]
            inv_l = jnp.where(lrow > 0, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
            dvo = qsbuf[slot, 0, 2 * nheads + h:2 * nheads + h + 1, :]
            s = _dot(kt[:, sl], qb[:, sl], ((1,), (1,)))
            s = (s + bias) if fold else (s * scale + bias)
            p = jnp.exp(s - m) * inv_l                         # [tile, width]
            dv_parts.append(_dot(p.astype(dob.dtype), dob[:, sl],
                                 ((1,), (0,))))
            dp = _dot(vt[:, sl], dob[:, sl], ((1,), (1,)))
            ds = p * (dp - dvo)
            dkh = _dot(ds.astype(qb.dtype), qb[:, sl], ((1,), (0,)))
            dk_parts.append(dkh if fold else dkh * scale)
        dk = jnp.concatenate(dk_parts, axis=1)
        dv = jnp.concatenate(dv_parts, axis=1)
        dkc = dk.astype(dt)
        dvc = dv.astype(dt)
        dxkv_ref[0] = (_dot(dkc, wk_ref[0], ((1,), (1,))) +
                       _dot(dvc, wv_ref[0], ((1,), (1,)))).astype(dt)
        wk_acc[...] += _dot(qk_t, dkc, ((0,), (0,)))
        bk_acc[...] += jnp.sum(dk, axis=0, keepdims=True)
        wv_acc[...] += _dot(x_t, dvc, ((0,), (0,)))
        bv_acc[...] += jnp.sum(dv, axis=0, keepdims=True)

    @pl.when((jax.lax.rem(b, bb) == bb - 1) & (i == nt - 1))
    def _():
        g = b // bb
        accs = (wk_acc, bk_acc, wv_acc, bv_acc)
        outs = (dwk_ref, dbk_ref, dwv_ref, dbv_ref)
        for j, (acc, out) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(acc, out.at[g], fsems.at[j]).start()
        for j, (acc, out) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(acc, out.at[g], fsems.at[j]).wait()


def _bwd_merged_kernel(nv_ref, do_ref, st_ref, wq_ref, bq_ref,
                       wk_ref, bk_ref, wv_ref, bv_ref, x_hbm, p_hbm,
                       aux_hbm, dxq_ref, dkv_hbm, dwq_ref, dbq_ref,
                       dwk_ref, dbk_ref, dwv_ref, dbv_ref, xbuf, pbuf,
                       auxbuf, acc, wq_acc, bq_acc, wk_acc, bk_acc,
                       wv_acc, bv_acc, sems, fsems, dsem, *, tile, pad,
                       width, nheads, head_dim, bb, pad_r, wacc, pack,
                       pack_hg):
    """ONE pass over query tiles producing dq AND banded dk/dv (projected
    to dx-space immediately and accumulated in a VMEM-resident table) AND
    all six weight grads.

    vs. the split dq/dkv pair: the softmax (s, exp, ds) is recomputed
    ONCE instead of twice, the x/pos bands stream once instead of twice,
    and the dkv kernel's transposed stats/do bands disappear entirely —
    the center tile's do/stats rows serve both directions.  dk/dv land as
    dx contributions: token t's window rows are [t + pad_r) with tile-
    aligned window starts (start = i*tile, in-window offset pad_r - pad),
    so every dynamic sublane offset is provably aligned; each token
    receives ~width/tile bf16 adds (cotangent-grade rounding)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    @pl.when((jax.lax.rem(b, bb) == 0) & (i == 0))
    def _():
        for a in (wq_acc, bq_acc, wk_acc, bk_acc, wv_acc, bv_acc):
            a[...] = jnp.zeros_like(a)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def issue(bbi, ss, sl):
        pltpu.make_async_copy(
            x_hbm.at[bbi, pl.ds(ss, width), :], xbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            p_hbm.at[bbi, pl.ds(ss, width), :], pbuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(bbi, 1), :, pl.ds(ss, width)], auxbuf.at[sl],
            sems.at[sl, 2]).start()

    @pl.when((l == 0) & cur_valid)
    def _():
        issue(b, start, slot)

    nb = b + (i + 1) // nt
    ni = jax.lax.rem(i + 1, nt)
    next_exists = l + 1 < pl.num_programs(0) * nt
    next_valid = next_exists & (ni * tile < nv_ref[
        jnp.minimum(nb, pl.num_programs(0) - 1)])

    @pl.when(next_valid)
    def _():
        issue(nb, ni * tile, 1 - slot)

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        dxq_ref[...] = jnp.zeros_like(dxq_ref)

    @pl.when(cur_valid)
    def _():
        for j in range(3):
            buf = (xbuf, pbuf, auxbuf)[j]
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, j]).wait()
        xb = xbuf[slot]
        dt = xb.dtype
        qk_b = xb + pbuf[slot]
        kb = _proj(qk_b, wk_ref, bk_ref, dt)            # [width, C]
        vb = _proj(xb, wv_ref, bv_ref, dt)
        qk_t = qk_b[pad:pad + tile]
        qt = _proj(qk_t, wq_ref, bq_ref, dt)            # [tile, C]
        do = do_ref[0]                                  # [tile, C]

        wink = auxbuf[slot, 0, 0:1, :]
        kvk = auxbuf[slot, 0, 1:2, :]
        winq = st_ref[0, :, 3 * nheads:3 * nheads + 1]   # packed channel
        mask = (winq == wink) & (kvk > 0.5)
        bias = jnp.where(mask, 0.0, _NEG)

        scale = 1.0 / (head_dim ** 0.5)
        C = nheads * head_dim
        if pack:
            # PACKED HEADS (see _fwd_kernel): q/do tile along sublanes with
            # head-lane masking; every matmul contracts or emits the full
            # 128 lanes.  ``hg`` heads per pass bounds the [hg*tile, width]
            # f32 temporaries so the pass fits beside the dkv-as-dx
            # accumulator table in scoped VMEM.
            hg = min(nheads, max(1, pack_hg))
            colh = (jax.lax.broadcasted_iota(jnp.int32, (tile, C), 1)
                    // head_dim)
            dqf = jnp.zeros((tile, C), jnp.float32)
            dkf = jnp.zeros((width, C), jnp.float32)
            dvf = jnp.zeros((width, C), jnp.float32)
            for h0 in range(0, nheads, hg):
                hsel = _head_mask(hg * tile, C, tile, head_dim, h0)
                qp = jnp.where(hsel, _head_tiled(qt, hg), 0)
                dop = jnp.where(hsel, _head_tiled(do, hg), 0)
                col = lambda c0: jnp.concatenate(
                    [st_ref[0, :, c0 + h:c0 + h + 1]
                     for h in range(h0, h0 + hg)], 0)    # [hg*tile, 1]
                m = col(0)
                lrow = col(nheads)
                inv_l = jnp.where(lrow > 0,
                                  1.0 / jnp.maximum(lrow, _EPS), 0.0)
                dvo = col(2 * nheads)
                s = _dot(qp, kb, ((1,), (1,))) * scale \
                    + _head_tiled(bias, hg)              # [hg*tile, width]
                p = jnp.exp(s - m) * inv_l
                dp = _dot(dop, vb, ((1,), (1,)))
                ds = p * (dp - dvo)
                dsc = ds.astype(dt)
                dqg = _dot(dsc, kb, ((1,), (0,)))        # [hg*tile, C]
                for j, h in enumerate(range(h0, h0 + hg)):
                    dqf = dqf + jnp.where(
                        colh == h, dqg[j * tile:(j + 1) * tile], 0.0)
                dkf = dkf + _dot(dsc, qp, ((0,), (0,)))
                dvf = dvf + _dot(p.astype(dt), dop, ((0,), (0,)))
            dqc = (dqf * scale).astype(dt)
            dkc = (dkf * scale).astype(dt)
            dvc = dvf.astype(dt)
        else:
            # every part lands in the compute dtype immediately — the
            # concat temporaries in f32 were the difference between
            # fitting and missing the 16 MB scoped-VMEM budget (f32 grad
            # accumulators keep full precision; bf16 parts are
            # cotangent-grade)
            dq_parts, dk_parts, dv_parts = [], [], []
            # scale fold (see _fwd_kernel): with qs = qt * scale the score
            # recompute drops its per-head [tile, width] mul, and
            # dk = dot(ds, qt) * scale = dot(ds, qs) exactly
            fold = _scale_pow2(head_dim)
            qs = qt * scale if fold else qt
            for h in range(nheads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                m = st_ref[0, :, h:h + 1]
                lrow = st_ref[0, :, nheads + h:nheads + h + 1]
                inv_l = jnp.where(lrow > 0,
                                  1.0 / jnp.maximum(lrow, _EPS), 0.0)
                dvo = st_ref[0, :, 2 * nheads + h:2 * nheads + h + 1]
                s = _dot(qs[:, sl], kb[:, sl], ((1,), (1,)))
                s = (s + bias) if fold else (s * scale + bias)
                p = jnp.exp(s - m) * inv_l              # [tile, width]
                dp = _dot(do[:, sl], vb[:, sl], ((1,), (1,)))
                ds = p * (dp - dvo)
                dsc = ds.astype(dt)
                dq_parts.append((_dot(dsc, kb[:, sl], ((1,), (0,)))
                                 * scale).astype(dt))
                dv_parts.append(_dot(p.astype(dt), do[:, sl],
                                     ((0,), (0,))).astype(dt))
                dkh = _dot(dsc, qs[:, sl], ((0,), (0,)))
                dk_parts.append((dkh if fold else dkh * scale).astype(dt))
            dqc = jnp.concatenate(dq_parts, axis=1)     # [tile, C] dt
            dkc = jnp.concatenate(dk_parts, axis=1)     # [width, C] dt
            dvc = jnp.concatenate(dv_parts, axis=1)

        dxq_ref[0] = _dot(dqc, wq_ref[0], ((1,), (1,))).astype(dt)
        wq_acc[...] += _dot(qk_t, dqc, ((0,), (0,)))
        bq_acc[...] += jnp.sum(dqc.astype(jnp.float32), axis=0,
                               keepdims=True)

        wk_acc[...] += _dot(qk_b, dkc, ((0,), (0,)))
        bk_acc[...] += jnp.sum(dkc.astype(jnp.float32), axis=0,
                               keepdims=True)
        wv_acc[...] += _dot(xb, dvc, ((0,), (0,)))
        bv_acc[...] += jnp.sum(dvc.astype(jnp.float32), axis=0,
                               keepdims=True)

        dxkv = (_dot(dkc, wk_ref[0], ((1,), (1,)))
                + _dot(dvc, wv_ref[0], ((1,), (1,)))).astype(acc.dtype)
        off = pad_r - pad
        contrib = jnp.pad(dxkv, ((off, wacc - off - width), (0, 0)))
        win = acc[pl.ds(start, wacc), :]
        acc[pl.ds(start, wacc), :] = win + contrib

    @pl.when(i == nt - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dkv_hbm.at[b], dsem)
        cp.start()
        cp.wait()

    @pl.when((jax.lax.rem(b, bb) == bb - 1) & (i == nt - 1))
    def _():
        g = b // bb
        accs = (wq_acc, bq_acc, wk_acc, bk_acc, wv_acc, bv_acc)
        outs = (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref)
        for j, (a, o) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(a, o.at[g], fsems.at[j]).start()
        for j, (a, o) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(a, o.at[g], fsems.at[j]).wait()


def _pallas_backward_merged(x, pos, wq, bq, wk, bk, wv, bv, win_id,
                            key_valid, out, stats, g_out, nheads, tile,
                            pad, interpret):
    B, V, C = x.shape
    G = wq.shape[0]
    bb = B // G
    nt = V // tile
    width = tile + 2 * pad
    f = jnp.float32
    H = nheads
    D = C // H

    xp, pp, aux, win_f = _band_inputs_x(x, pos, win_id, key_valid, pad)
    nv = jnp.max(jnp.where(win_f < 2.0 ** 24,
                       jnp.arange(win_f.shape[1], dtype=jnp.int32)
                       + 1, 0), axis=1).astype(jnp.int32)
    # EXTENT (last real slot + 1), not a count: the tile-packed
    # layout intersperses bucket-slack holes, so a count would
    # skip real trailing tiles; for the compact band layout the
    # two coincide
    dvo = jnp.einsum("bvhd,bvhd->bvh", g_out.reshape(B, V, H, D),
                     out.reshape(B, V, H, D),
                     preferred_element_type=jnp.float32)
    # winq rides as stats channel 3H (a separate [B, V, 1] f32 block
    # pads its lane dim to 128 in VMEM — 0.26 MB of pure padding)
    stats3 = jnp.concatenate([stats, dvo, win_f[:, :, None]],
                             axis=-1)                    # [B, V, 3H+1]
    ws = _prep_w(x.dtype, wq, bq, wk, bk, wv, bv)

    pad_r = ((pad + tile - 1) // tile) * tile
    wacc = ((pad_r - pad + width + 15) // 16) * 16
    rows_acc = ((V - tile + wacc + 15) // 16) * 16

    import os
    kern = functools.partial(_bwd_merged_kernel, tile=tile, pad=pad,
                             width=width, nheads=H, head_dim=D, bb=bb,
                             pad_r=pad_r, wacc=wacc, pack=_pack_on(),
                             pack_hg=int(os.environ.get(
                                 "GEOMAE_ATTN_PACK_HG", "4")))
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    tok = lambda c: pl.BlockSpec((1, tile, c), lambda b, i, *_: (b, i, 0),
                                 memory_space=pltpu.VMEM)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[tok(C), tok(3 * H + 1)] + _grp_specs(C, bb) +
                 [anyspec, anyspec, anyspec],
        out_specs=(tok(C), anyspec, anyspec, anyspec, anyspec, anyspec,
                   anyspec, anyspec),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, 1, 2, width), f),
            pltpu.VMEM((rows_acc, C), x.dtype),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dxq, dkv, dwq, dbq, dwk, dbk, dwv, dbv = pl.pallas_call(
        kern,
        grid_spec=grid,
        out_shape=(jax.ShapeDtypeStruct((B, V, C), x.dtype),
                   jax.ShapeDtypeStruct((B, rows_acc, C), x.dtype),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nv, g_out, stats3, *ws, xp, pp, aux)

    dx = dxq + dkv[:, pad_r:pad_r + V]
    return dx, dwq, dbq[:, 0], dwk, dbk[:, 0], dwv, dbv[:, 0]


def _pallas_backward(x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid,
                     out, stats, g_out, nheads, tile, pad, interpret):
    import os
    if os.environ.get("GEOMAE_ATTN_BWD") != "split":
        return _pallas_backward_merged(
            x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, out,
            stats, g_out, nheads, tile, pad, interpret)
    return _pallas_backward_split(
        x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, out, stats,
        g_out, nheads, tile, pad, interpret)


def _pallas_backward_split(x, pos, wq, bq, wk, bk, wv, bv, win_id,
                           key_valid, out, stats, g_out, nheads, tile,
                           pad, interpret):
    B, V, C = x.shape
    G = wq.shape[0]
    bb = B // G
    nt = V // tile
    width = tile + 2 * pad
    f = jnp.float32
    H = nheads
    D = C // H

    xp, pp, aux, win_f = _band_inputs_x(x, pos, win_id, key_valid, pad)
    nv = jnp.max(jnp.where(win_f < 2.0 ** 24,
                       jnp.arange(win_f.shape[1], dtype=jnp.int32)
                       + 1, 0), axis=1).astype(jnp.int32)
    # EXTENT (last real slot + 1), not a count: the tile-packed
    # layout intersperses bucket-slack holes, so a count would
    # skip real trailing tiles; for the compact band layout the
    # two coincide
    gf = g_out
    dvo = jnp.einsum("bvhd,bvhd->bvh", g_out.reshape(B, V, H, D),
                     out.reshape(B, V, H, D),
                     preferred_element_type=jnp.float32)
    stats3 = jnp.concatenate([stats, dvo], axis=-1)        # [B, V, 3H]
    ws = _prep_w(x.dtype, wq, bq, wk, bk, wv, bv)

    # ---- dx (query side) + dWq ------------------------------------------
    dq_kern = functools.partial(_dq_kernel, tile=tile, pad=pad, width=width,
                                nheads=H, head_dim=D, bb=bb)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    tok = lambda c: pl.BlockSpec((1, tile, c), lambda b, i, *_: (b, i, 0),
                                 memory_space=pltpu.VMEM)
    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[tok(C), tok(3 * H), tok(1)] + _grp_specs(C, bb) +
                 [anyspec, anyspec, anyspec],
        out_specs=(tok(C), anyspec, anyspec),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, 1, 2, width), f),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dxq, dwq, dbq = pl.pallas_call(
        dq_kern,
        grid_spec=dq_grid,
        out_shape=(jax.ShapeDtypeStruct((B, V, C), x.dtype),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f)),
        interpret=interpret,
    )(nv, gf, stats3, win_f[:, :, None], *ws, xp, pp, aux)

    # ---- dx (key side) + dWk/dWv ----------------------------------------
    gp = jnp.pad(gf, ((0, 0), (pad, pad), (0, 0)))
    st_t = jnp.pad(jnp.moveaxis(stats3, 1, 2), ((0, 0), (0, 0), (pad, pad)))
    winq_row = jnp.pad(win_f, ((0, 0), (pad, pad)),
                       constant_values=_PAD_WIN)[:, None, :]
    qs = jnp.concatenate([st_t, winq_row], axis=1)         # [B, 3H+1, Vp]
    qs = jnp.pad(qs, ((0, 0), (0, 32 - qs.shape[1]), (0, 0)))
    aux_t = jnp.stack([win_f, key_valid.astype(jnp.float32)], axis=-1)
    dkv_kern = functools.partial(_dkv_kernel, tile=tile, pad=pad,
                                 width=width, nheads=H, head_dim=D, bb=bb)
    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[tok(2)] + _grp_specs(C, bb) +
                 [anyspec, anyspec, anyspec, anyspec],
        out_specs=(tok(C), anyspec, anyspec, anyspec, anyspec),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, width, C), x.dtype),
            pltpu.VMEM((2, 1, 32, width), f),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, C), f),
            pltpu.VMEM((1, C), f),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    dxkv, dwk, dbk, dwv, dbv = pl.pallas_call(
        dkv_kern,
        grid_spec=dkv_grid,
        out_shape=(jax.ShapeDtypeStruct((B, V, C), x.dtype),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f),
                   jax.ShapeDtypeStruct((G, C, C), f),
                   jax.ShapeDtypeStruct((G, 1, C), f)),
        interpret=interpret,
    )(nv, aux_t, *ws, xp, pp, gp, qs)

    dx = dxq + dxkv
    return dx, dwq, dbq[:, 0], dwk, dbk[:, 0], dwv, dbv[:, 0]


# ---------------------------------------------------------------------------
# custom-vjp entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def band_attention_qkv(x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid,
                       nheads: int = 8, tile: int = DEFAULT_TILE,
                       pad: int = DEFAULT_PAD, interpret: bool = False):
    """Fused projections + exact windowed band attention (module doc).

    Returns the PRE-out-projection attention output [B, V, C] (feed it to
    ``ops.pallas_ffn.post_attention_block``).  ``pos`` is treated as a
    constant (no cotangent).  Weights carry a leading group axis.
    """
    out, _ = _pallas_forward(x, pos, wq, bq, wk, bk, wv, bv, win_id,
                             key_valid, nheads, tile, pad, interpret)
    return out


def _vjp_fwd(x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, nheads,
             tile, pad, interpret):
    out, stats = _pallas_forward(x, pos, wq, bq, wk, bk, wv, bv, win_id,
                                 key_valid, nheads, tile, pad, interpret)
    return out, (x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, out,
                 stats)


def _vjp_bwd(nheads, tile, pad, interpret, res, g):
    (x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, out, stats) = res
    dx, dwq, dbq, dwk, dbk, dwv, dbv = _pallas_backward(
        x, pos, wq, bq, wk, bk, wv, bv, win_id, key_valid, out, stats, g,
        nheads, tile, pad, interpret)
    cast = lambda a, p: a.astype(p.dtype)
    return (dx, jnp.zeros_like(pos), cast(dwq, wq), cast(dbq, bq),
            cast(dwk, wk), cast(dbk, bk), cast(dwv, wv), cast(dbv, bv),
            None, None)


band_attention_qkv.defvjp(_vjp_fwd, _vjp_bwd)
