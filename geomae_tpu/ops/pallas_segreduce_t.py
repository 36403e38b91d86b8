"""Transposed-layout (channel-major) Pallas segment ops.

The kernels in ``pallas_segreduce.py`` take point streams as
``[B, P, C]`` — but TPU tiles the two minor dims to (8 sublanes, 128
lanes), so a small-C point tensor pads its channel dim to 128 lanes:
``[4, 262144, 3]`` f32 physically occupies **537 MB**, and every
materialization (the kernels' padded inputs foremost) streams that.
Measured on v5e: the 3-channel cluster-mean broadcast cost 20.5 ms of a
48.5 ms VFE forward — almost entirely padded HBM traffic.

This module is the cure for the hot path: point streams ride
**channel-major** ``[B, C, P]`` (C on sublanes — pad 3 -> 8, a 2.7x
overhead instead of 42x; P on lanes — 262144 is 128-aligned), so the same
tensor is 12.6 MB.  The one-hot routing runs on the MXU exactly like the
row-major kernels, with two layout twists:

* the resident accumulator table is ``[C, rows]`` with segment rows on
  LANES; Mosaic requires 128-aligned lane-dim dynamic slices, so each
  chunk routes into a 128-ALIGNED window ``[aligned_start, aligned_start
  + chunk + 128)`` (aligned_start = floor(seg0/128)*128, from scalar
  prefetch).  Window overlap between consecutive chunks is harmless —
  the table accumulates (+= / max=) and each point contributes once.
* ONE one-hot ``Eg[window_col, point]`` (window cols on sublanes,
  points on lanes) serves both directions: the scatter is a lane-lane
  contraction ``x @ Eg^T`` (dot_general ((1,),(1,)) — the same MXU form
  the attention kernels use) and the gather is the natural ``window @
  Eg``.  All masks/ids stay lane-oriented, so no per-grid-step relayout
  ever happens (31 us/step — the historic disease, ARCHITECTURE.md
  round-2 notes).

Contract (same as pallas_segreduce): ascending dense ids with
``id - chunk_first_id < chunk`` within any chunk (dense ranks from
``voxelize.build_scene`` satisfy this); rows with ``id >= num_segments``
(sentinel + overflow) read/contribute as the row-major kernels do.
Exact-f32 sums ride the channel-stacked hi/lo split (`split_hi_lo`); max
payloads are selection-routed (bf16-born payloads bit-exact).

Reference semantics: torch_scatter reduce/gather pairs in
``/root/reference/mmdet3d/ops/voxel/scatter_points.py:9-107``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segreduce import _NEG, DEFAULT_CHUNK, split_hi_lo

_LANE = 128


def _pad_sublanes(x, is_max, mult: int = 8):
    """Pad the channel (sublane) dim of ``[B, C, P]`` to a multiple of 8."""
    C = x.shape[1]
    Cp = max(((C + mult - 1) // mult) * mult, mult)
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, Cp - C), (0, 0)),
                    constant_values=_NEG if is_max else 0.0)
    return x, Cp


def _meta_aligned(seg_ids, num_segments, chunk):
    """[B, nsteps] int32: 128-aligned first id per chunk, stored DIVIDED
    by 128 — kernels multiply back so Mosaic can statically prove the
    lane-dim dynamic slice offset is a multiple of 128."""
    first = jnp.clip(seg_ids[:, ::chunk], 0, num_segments)
    return (first // _LANE).astype(jnp.int32)


def _rows_lanes(num_segments, chunk):
    """Lane count of the resident table: ids reach num_segments + chunk
    overhang, windows reach aligned_start + chunk + 128."""
    return ((num_segments + chunk + 2 * _LANE - 1) // _LANE) * _LANE


def _ids_lane(seg_ids):
    """Lane-major [B, 1, P] f32 ids."""
    return seg_ids.astype(jnp.float32)[:, None, :]


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """Contract the LANE dims of both operands (a @ b^T) — the MXU form
    Mosaic lowers without relayout (same as the attention kernels)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _eg(seg_l, start, chunk):
    """One-hot ``Eg[j, t] = (seg[t] - start == j)`` [W, chunk] from
    lane-oriented ids; W = chunk + 128 window rows on sublanes."""
    W = chunk + _LANE
    rel_l = seg_l - start.astype(jnp.float32)           # [1, chunk]
    js = jax.lax.broadcasted_iota(jnp.int32, (W, chunk), 0) \
        .astype(jnp.float32)
    return (js == rel_l).astype(jnp.float32)


# ---------------------------------------------------------------------------
# segmented reduce (sum / max) -> [B, C, rows]
# ---------------------------------------------------------------------------


def _reduce_kernel_t(meta_ref, x_ref, idl_ref, out_hbm, acc, sem,
                     *, chunk, op, num_segments, rows):
    b = pl.program_id(0)
    i = pl.program_id(1)
    W = chunk + _LANE
    # native-dtype max path: bf16-born payloads STREAM and ACCUMULATE in
    # bf16 (half the HBM/DMA bytes, no XLA-side f32 copy, half the acc
    # VMEM) — every step is pure SELECTION of bf16 values, so the result
    # is bit-identical to the f32 path.  The routing dot's one-hot
    # selects exactly ONE end row per output element (sum of one term),
    # so the f32-accumulated dot output casts back losslessly.  The
    # Hillis-Steele scan itself runs f32 IN-VMEM: Mosaic has no bf16
    # lane rotate ("Rotate with non-32-bit data").
    dt = x_ref.dtype
    neutral = jnp.asarray(_NEG if op == "max" else 0.0, dt)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.full_like(acc, neutral)

    x = x_ref[0].astype(jnp.float32)                   # [C, chunk]
    seg_l = idl_ref[0]                                 # [1, chunk] lane ids
    start = meta_ref[b, i] * _LANE                     # provably aligned
    Eg = _eg(seg_l, start, chunk)                      # [W, chunk]

    if op == "max":
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        xm = x
        k = 1
        while k < chunk:
            ok = (pos >= k) & (seg_l == pltpu.roll(seg_l, k, 1))
            xm = jnp.maximum(xm, jnp.where(ok, pltpu.roll(xm, k, 1),
                                           _NEG))
            k *= 2
        # segment-end mask stays lane-oriented; zeroing Eg columns routes
        # only end rows
        is_end = (seg_l != pltpu.roll(seg_l, chunk - 1, 1)) \
            | (pos == chunk - 1)                       # [1, chunk]
        Ee = jnp.where(is_end, Eg, 0.0)
        Wv = _dot_t(xm, Ee).astype(dt)                 # [C, W]
        has_end = _dot_t(jnp.ones((1, chunk), jnp.float32), Ee) > 0.5
        Wv = jnp.where(has_end, Wv, neutral)
        acc[:, pl.ds(start, W)] = jnp.maximum(acc[:, pl.ds(start, W)], Wv)
    else:
        acc[:, pl.ds(start, W)] = acc[:, pl.ds(start, W)] \
            + _dot_t(x, Eg).astype(dt)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        cp = pltpu.make_async_copy(acc, out_hbm.at[b], sem)
        cp.start()
        cp.wait()


def _reduce_forward_t(x, seg_ids, num_segments, is_max, chunk, exact=True):
    B, C, P = x.shape
    assert P % chunk == 0, (P, chunk)
    dtype = x.dtype
    split = exact and not is_max and jnp.dtype(dtype) == jnp.float32
    # bf16-born max payloads stay bf16 end to end (no XLA-side f32 copy
    # of the [B, C, P] stream — 537 MB at bench shapes); selection is
    # bit-exact in either dtype.  Sums always accumulate f32.
    native = is_max and jnp.dtype(dtype) == jnp.bfloat16
    xin = x if native else x.astype(jnp.float32)
    if split:
        hi, lo = split_hi_lo(xin)
        xin = jnp.concatenate([hi, lo], axis=1)
    xin, Cp = _pad_sublanes(xin, is_max)
    idl = _ids_lane(seg_ids)
    meta = _meta_aligned(seg_ids, num_segments, chunk)
    rows = _rows_lanes(num_segments, chunk)

    kern = functools.partial(_reduce_kernel_t, chunk=chunk,
                             op="max" if is_max else "sum",
                             num_segments=num_segments, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // chunk),
        in_specs=[
            pl.BlockSpec((1, Cp, chunk), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((Cp, rows), xin.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Cp, rows), xin.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, xin, idl)
    if split:
        out = out[:, :2 * C].astype(jnp.float32)
        return (out[:, :C] + out[:, C:]).astype(dtype)
    return out[:, :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def segment_reduce_t(x, seg_ids, num_segments: int, is_max: bool,
                     chunk: int = DEFAULT_CHUNK, exact: bool = True):
    """Segmented reduce of channel-major points: ``out[b, c, v] =
    op_{t: seg[b,t]==v} x[b, c, t]`` -> [B, C, num_segments] (f32 table
    values cast back to ``x.dtype``).  Empty rows: 0 for sum, -3e38 for
    max (callers mask).  Ids: ascending dense ranks (see module doc)."""
    out = _reduce_forward_t(x, seg_ids, num_segments, is_max, chunk, exact)
    return out[..., :num_segments]


def _reduce_t_fwd(x, seg_ids, num_segments, is_max, chunk, exact):
    out = segment_reduce_t(x, seg_ids, num_segments, is_max, chunk, exact)
    res = (x, out, seg_ids) if is_max else (seg_ids,)
    return out, res


def _reduce_t_bwd(num_segments, is_max, chunk, exact, res, g):
    if is_max:
        x, out, seg_ids = res
        # sanitize empty-row neutrals before the gather: the in-kernel
        # Veltkamp split overflows on |v| ~ 3e38 (65537 * v -> inf)
        out_m = jnp.where(out.astype(jnp.float32) > _NEG / 2,
                          out.astype(jnp.float32), 0.0)
        vals = segment_gather_t(out_m, seg_ids, chunk)
        gpt = segment_gather_t(g.astype(jnp.float32), seg_ids, chunk)
        dx = jnp.where(x.astype(jnp.float32) == vals, gpt, 0.0)
        return dx.astype(x.dtype), None
    (seg_ids,) = res
    return segment_gather_t(g, seg_ids, chunk).astype(g.dtype), None


segment_reduce_t.defvjp(_reduce_t_fwd, _reduce_t_bwd)


# ---------------------------------------------------------------------------
# segment broadcast (reduce + gather-back in one kernel) -> [B, C, P]
# ---------------------------------------------------------------------------


def _bcast_kernel_t(meta_ref, x_ref, idl_ref, out_ref, acc, *,
                    chunk, op, num_segments, split, cnt_row):
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    # native-dtype max: see _reduce_kernel_t — bf16-born payloads stream,
    # route and accumulate in bf16, bit-identical (pure selection); the
    # scan runs f32 in-VMEM (Mosaic has no bf16 lane rotate)
    dt = x_ref.dtype
    neutral = jnp.asarray(_NEG if op == "max" else 0.0, dt)
    W = chunk + _LANE

    @pl.when((g == 0) & (i == 0))
    def _():
        acc[...] = jnp.full_like(acc, neutral)

    seg_l = idl_ref[0]                                  # [1, chunk]
    start = meta_ref[b, i] * _LANE                      # provably aligned
    Eg = _eg(seg_l, start, chunk)                       # [W, chunk]

    @pl.when(g == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)                # [C, chunk]
        if op == "max":
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            xm = x
            k = 1
            while k < chunk:
                ok = (pos >= k) & (seg_l == pltpu.roll(seg_l, k, 1))
                xm = jnp.maximum(xm, jnp.where(ok, pltpu.roll(xm, k, 1),
                                               _NEG))
                k *= 2
            is_end = (seg_l != pltpu.roll(seg_l, chunk - 1, 1)) \
                | (pos == chunk - 1)
            Ee = jnp.where(is_end, Eg, 0.0)
            Wv = _dot_t(xm, Ee).astype(dt)
            has_end = _dot_t(jnp.ones((1, chunk), jnp.float32), Ee) > 0.5
            Wv = jnp.where(has_end, Wv, neutral)
            acc[:, pl.ds(start, W)] = jnp.maximum(acc[:, pl.ds(start, W)],
                                                  Wv)
        else:
            acc[:, pl.ds(start, W)] = acc[:, pl.ds(start, W)] \
                + _dot_t(x, Eg).astype(dt)

    @pl.when(g == 1)
    def _():
        window = acc[:, pl.ds(start, W)]                # [C, W]
        if op == "mean":
            cnt = jnp.maximum(window[cnt_row:cnt_row + 1, :], 1.0)
            window = window / cnt
        if split:
            c = window * 65537.0
            w_hi = c - (c - window)
            y = _dot(w_hi, Eg) + _dot(window - w_hi, Eg)
        else:
            # max tables hold selected values — the one-hot gather sums
            # exactly one term per output, exact in any dtype
            y = _dot(window, Eg.astype(dt))             # [C, chunk]
        y = jnp.where(seg_l < float(num_segments), y, 0.0)
        out_ref[0] = y.astype(out_ref.dtype)


def _bcast_forward_t(x, seg_ids, num_segments, op, chunk, exact=True):
    B, C, P = x.shape
    assert P % chunk == 0, (P, chunk)
    dtype = x.dtype
    split = (exact and op != "max" and jnp.dtype(dtype) == jnp.float32)
    # bf16-born max payloads stay bf16 end to end (see _reduce_forward_t)
    native = op == "max" and jnp.dtype(dtype) == jnp.bfloat16
    xin = x if native else x.astype(jnp.float32)
    if split:
        hi, lo = split_hi_lo(xin)
        xin = jnp.concatenate([hi, lo], axis=1)
    if op == "mean":
        xin = jnp.concatenate(
            [xin, jnp.ones((B, 1, P), jnp.float32)], axis=1)
    cnt_row = xin.shape[1] - 1
    xin, Cp = _pad_sublanes(xin, op == "max")
    idl = _ids_lane(seg_ids)
    meta = _meta_aligned(seg_ids, num_segments, chunk)
    rows = _rows_lanes(num_segments, chunk)
    nsteps = P // chunk

    kern = functools.partial(_bcast_kernel_t, chunk=chunk, op=op,
                             num_segments=num_segments, split=split,
                             cnt_row=cnt_row)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2, nsteps),
        in_specs=[
            # x is only read in sweep 0 — park the block at index 0
            # during sweep 1 so the pipeline doesn't re-stream the whole
            # [B, C, P] input a second time
            pl.BlockSpec((1, Cp, chunk),
                         lambda b, g, i, *_: (b, 0, i * (1 - g)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, g, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        # sweep 0 parks the output on a trailing throwaway block
        out_specs=pl.BlockSpec(
            (1, Cp, chunk),
            lambda b, g, i, *_: (b, 0, i * g + nsteps * (1 - g)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Cp, rows), xin.dtype),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Cp, P + chunk), xin.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, xin, idl)
    out = out[:, :, :P]
    if split:
        return (out[:, :C] + out[:, C:2 * C]).astype(dtype)
    return out[:, :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def segment_broadcast_t(x, seg_ids, num_segments: int, op: str,
                        chunk: int = DEFAULT_CHUNK, exact: bool = True):
    """Per-point segment reduction broadcast in channel-major layout:
    ``out[b, c, t] = op_{q: seg[q]==seg[t]} x[b, c, q]``; rows with
    ``seg >= num_segments`` return 0.  ``op`` in {"sum", "mean", "max"}."""
    return _bcast_forward_t(x, seg_ids, num_segments, op, chunk, exact)


def _bcast_t_fwd(x, seg_ids, num_segments, op, chunk, exact):
    out = _bcast_forward_t(x, seg_ids, num_segments, op, chunk, exact)
    res = (x, out, seg_ids) if op == "max" else (seg_ids,)
    return out, res


def _bcast_t_bwd(num_segments, op, chunk, exact, res, g):
    # bf16-level routing (exact=False) is free accuracy-wise on cotangents
    # — mirrors pallas_segreduce._bcast_bwd, incl. the ties-share-gradient
    # convention for max
    if op == "max":
        x, out, seg_ids = res
        gs = _bcast_forward_t(g.astype(jnp.float32), seg_ids, num_segments,
                              "sum", chunk, False)
        hit = x.astype(jnp.float32) == out.astype(jnp.float32)
        return jnp.where(hit, gs, 0.0).astype(x.dtype), None
    (seg_ids,) = res
    # sum-broadcast is self-adjoint; mean-broadcast's adjoint is
    # mean-broadcast (sum of cotangents / the same segment count)
    gm = _bcast_forward_t(g.astype(jnp.float32), seg_ids, num_segments,
                          op, chunk, False)
    return gm.astype(g.dtype), None


segment_broadcast_t.defvjp(_bcast_t_fwd, _bcast_t_bwd)


# ---------------------------------------------------------------------------
# fused slot-outer segment sum, channel-major input
# ---------------------------------------------------------------------------


def _slot_kernel_t(meta_ref, vals_ref, idl_ref, slotl_ref,
                   out_hbm, acc, sem, *, chunk, cv, sc_dim, group_slots,
                   split):
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    W = chunk + _LANE

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    vals = vals_ref[0].astype(jnp.float32)        # [cv_in, chunk]
    slot_l = slotl_ref[0]                         # [1, chunk]
    seg_l = idl_ref[0]                            # [1, chunk]
    start = meta_ref[b, i] * _LANE                # provably aligned
    Eg = _eg(seg_l, start, chunk)                 # [W, chunk]

    # OH[s_local*cv + c, t] = vals[c, t] * (slot[t] == g*group + s_local):
    # the outer product lives in VMEM only, sublane-major, built from
    # lane-oriented operands; slot groups ride grid dim g so the resident
    # table stays <= [128, rows]
    sc = jax.lax.broadcasted_iota(jnp.int32, (sc_dim, chunk), 0)
    s_of = (sc // cv).astype(jnp.float32) + (g * group_slots).astype(
        jnp.float32)
    sel = (slot_l == s_of)                        # [sc_dim, chunk]

    def oh_of(off):
        oh = jnp.zeros((sc_dim, chunk), jnp.float32)
        for c in range(cv):
            oh = oh + jnp.where((sc % cv) == c, vals[off + c:off + c + 1],
                                0.0)
        return jnp.where(sel, oh, 0.0)

    Wv = _dot_t(oh_of(0), Eg)                     # [sc_dim, W]
    if split:
        Wv = Wv + _dot_t(oh_of(cv), Eg)
    acc[:, pl.ds(start, W)] = acc[:, pl.ds(start, W)] + Wv

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        cp = pltpu.make_async_copy(
            acc, out_hbm.at[b, pl.ds(g * sc_dim, sc_dim), :], sem)
        cp.start()
        cp.wait()


def slot_outer_segment_sum_t(vals, slot, seg_ids, num_slots: int,
                             num_segments: int,
                             chunk: int = DEFAULT_CHUNK):
    """Channel-major twin of ``pallas_segreduce.slot_outer_segment_sum_
    pallas``: ``out[b, v, s, c] = sum_t vals[b, c, t] (seg==v)(slot==s)``
    with ``vals`` [B, cv, P].  Same return shape/order ([B, V, S, cv]
    f32) so the two are drop-in interchangeable.  Slot groups of
    ``128 // cv`` ride an extra grid dimension (GeoMAE production:
    128 slots x 4 ch = 4 groups of 32)."""
    B, cv, P = vals.shape
    assert P % chunk == 0, (P, chunk)
    group_slots = max(min(128 // cv, num_slots), 1)
    assert num_slots % group_slots == 0, (num_slots, cv)
    n_groups = num_slots // group_slots
    sc_dim = group_slots * cv
    split = jnp.dtype(vals.dtype) == jnp.float32
    xin = vals.astype(jnp.float32)
    if split:
        hi, lo = split_hi_lo(xin)
        xin = jnp.concatenate([hi, lo], axis=1)   # [B, 2cv, P]
    xin, _ = _pad_sublanes(xin, False)
    idl = _ids_lane(seg_ids)
    slotl = slot.astype(jnp.float32)[:, None, :]
    meta = _meta_aligned(seg_ids, num_segments, chunk)
    rows = _rows_lanes(num_segments, chunk)
    sc_pad = max(((sc_dim + 7) // 8) * 8, 8)

    kern = functools.partial(_slot_kernel_t, chunk=chunk, cv=cv,
                             sc_dim=sc_pad, group_slots=group_slots,
                             split=split)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_groups, P // chunk),
        in_specs=[
            pl.BlockSpec((1, xin.shape[1], chunk),
                         lambda b, g, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, g, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, g, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((sc_pad, rows), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_groups * sc_pad, rows),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, xin, idl, slotl)
    out = out.reshape(B, n_groups, sc_pad, rows)[:, :, :sc_dim,
                                                 :num_segments]
    out = out.reshape(B, num_slots, cv, num_segments)
    return out.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# segment gather (table rows -> sorted points) -> [B, C, P]
# ---------------------------------------------------------------------------


def _gather_kernel_t(meta_ref, tab_hbm, idl_ref, out_ref, tbl, sem, *,
                     chunk, num_segments, split):
    b = pl.program_id(0)
    i = pl.program_id(1)
    W = chunk + _LANE

    # resident table loads ONCE per batch row into scratch — a pipelined
    # input block would be double-buffered (2 x ~10.8 MB at [128, 21k]
    # exceeds the 16 MB scoped-VMEM budget inside a fused train step)
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(tab_hbm.at[b], tbl, sem)
        cp.start()
        cp.wait()

    start = meta_ref[b, i] * _LANE                      # provably aligned
    seg_l = idl_ref[0]                                  # [1, chunk]
    Eg = _eg(seg_l, start, chunk)                       # [W, chunk]
    window = tbl[:, pl.ds(start, W)].astype(jnp.float32)
    if split:
        c = window * 65537.0
        w_hi = c - (c - window)
        y = _dot(w_hi, Eg) + _dot(window - w_hi, Eg)
    else:
        y = _dot(window, Eg)
    y = jnp.where(seg_l < float(num_segments), y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _gather_forward_t(table, seg_ids, chunk):
    B, C, V = table.shape
    P = seg_ids.shape[1]
    assert P % chunk == 0, (P, chunk)
    dtype = table.dtype
    split = jnp.dtype(dtype) == jnp.float32
    rows = _rows_lanes(V, chunk)
    tab = jnp.pad(table.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, rows - V)))
    tab, Cp = _pad_sublanes(tab, False)
    idl = _ids_lane(seg_ids)
    meta = _meta_aligned(seg_ids, V, chunk)

    kern = functools.partial(_gather_kernel_t, chunk=chunk,
                             num_segments=V, split=split)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, chunk), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cp, chunk), lambda b, i, *_: (b, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Cp, rows), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Cp, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, tab, idl)
    return out[:, :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_gather_t(table, seg_ids, chunk: int = DEFAULT_CHUNK):
    """``out[b, c, t] = table[b, c, seg[b, t]]`` for ascending dense ids;
    sentinel/overflow ids (>= V) read 0.  Table stays VMEM-resident per
    batch row; exact f32 via in-kernel Veltkamp split."""
    return _gather_forward_t(table, seg_ids, chunk)


def _gather_t_fwd(table, seg_ids, chunk):
    # shape/dtype of the table ride as an empty array (residue leaves
    # must be JAX types)
    proto = jnp.zeros((0, table.shape[2]), table.dtype)
    return _gather_forward_t(table, seg_ids, chunk), (seg_ids, proto)


def _gather_t_bwd(chunk, res, g):
    seg_ids, proto = res
    gt = segment_reduce_t(g.astype(jnp.float32), seg_ids, proto.shape[1],
                          False, chunk)
    return gt.astype(proto.dtype), None


segment_gather_t.defvjp(_gather_t_fwd, _gather_t_bwd)
