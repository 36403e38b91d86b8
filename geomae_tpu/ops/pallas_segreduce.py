"""Pallas segmented reduce / gather over sorted dense segment ids.

The workhorses behind the VFE's point<->pillar traffic and the GeoMAE
dense target tables.  XLA's alternatives are all bandwidth-catastrophic on
TPU: scatter-adds sort internally, ``associative_scan`` makes log(N)
passes with strided access, and row gathers run at ~25 M rows/s.  The
reference uses CUDA ``torch_scatter`` kernels for the same ops
(``/root/reference/mmdet3d/ops/voxel/scatter_points.py:9-107``).

Design: the OUTPUT TABLE LIVES IN VMEM for a whole batch row ([V, 128]
f32 = 10.5 MB at V=20480 — under the ~16 MB/core budget), as a pipelined
output block revisited across the chunk grid.  Each grid step streams one
chunk of points and routes it with a one-hot matmul on the MXU:

  sum:  out[seg0 + j] += sum_t (seg[t]-seg0 == j) * x[t]
  max:  in-chunk segmented max (log2(chunk) masked rolls), then route
        segment-end rows and max-accumulate into the table.

Accumulating (+= / max=) into the resident table makes per-chunk partial
results just work — no carry state, no overlapping-window DMA dance, and
the Pallas pipeline handles all data movement.  ``segment_gather_pallas``
is the transpose: the TABLE is resident and each chunk routes table rows
to points with the transposed one-hot.

``slot_outer_segment_sum_pallas`` fuses the GeoMAE target build
(``models/mae.py:compute_targets``): instead of materializing the
``[P, S*4]`` one-hot outer product in HBM (537 MB/sample) and cumsum-ing
it, the kernel builds each chunk's ``vals ⊗ one_hot(slot)`` block in VMEM
via iota arithmetic and routes it with the same pillar one-hot matmul.
Slot groups ride an extra grid dimension so the resident table stays
[V, 128] f32.

Ids are passed as exact float32 (ids < 2^24) to sidestep Mosaic's int32
slice-tiling limits.  CONTRACT (beyond ascending ids): within any one
chunk of positions, every non-sentinel id must satisfy
``id - chunk_first_id < chunk`` — the one-hot window addresses ``chunk``
rows (widened to ``chunk + 16`` with a 16-floored start for 16-bit
packed tables, whose dynamic gather base must be sublane-aligned).
Dense rank ids (0,0,1,2,2,...) as produced by
``voxelize.build_scene``'s ``point2voxel`` satisfy this for any chunk
size.  Rows of empty segments are 0 for sum and the neutral -3e38 -> 0
masked by callers for max.

Backward (custom VJP): sum -> pallas gather of the cotangent at each
point's segment; max -> gather + equality routing (ties share gradient);
gather -> pallas segment sum of the cotangents.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 512
_NEG = -3.0e38


def _pad_channels(x, is_max):
    C = x.shape[-1]
    Cp = max(((C + 127) // 128) * 128, 128)   # Mosaic lane alignment
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C)),
                    constant_values=_NEG if is_max else 0.0)
    return x, Cp


def _seg0_meta(seg_ids, num_segments, chunk):
    """[B, nsteps] int32 clipped first id per chunk (scalar prefetch)."""
    return jnp.clip(seg_ids[:, ::chunk], 0, num_segments).astype(jnp.int32)


def _rows_pad(num_segments, chunk):
    """Output row count: table + one-hot overhang, sublane-aligned."""
    return ((num_segments + chunk + 7) // 8) * 8


# ---------------------------------------------------------------------------
# segmented reduce (sum / max)
# ---------------------------------------------------------------------------


def split_hi_lo(x):
    """(hi, lo) f32 decomposition with both parts EXACT under the MXU's
    bf16 operand truncation: hi zeroes the low 16 mantissa bits (sign +
    exp + 7 mantissa = a bf16-representable f32), lo = x - hi.

    Computed in XLA OUTSIDE the kernels: in-kernel bitwise/cast chains
    measured ~36 us/grid-step (scalarized bit-ops / (8,128)<->(16,128)
    relayouts in Mosaic — 23x total kernel cost).  Riding the split in as
    stacked channels is free when the channel tile was already padding
    (C <= 64 -> same [T, 128] lane tile, same matmul)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return hi, x - hi


def _route(E, x):
    return jax.lax.dot_general(E, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _reduce_kernel(meta_ref, x_ref, seg_ref, out_hbm, acc, sem, *,
                   chunk, is_max):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)
    neutral = _NEG if is_max else 0.0

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.full_like(acc, neutral)

    x = x_ref[0].astype(jnp.float32)              # [T, C]
    seg = seg_ref[0, :, 0:1]                      # [T, 1] f32 ids
    seg0 = meta_ref[b, i].astype(jnp.float32)
    rel = seg - seg0                              # [T, 1]
    # one-hot in NATURAL [T, out_row] orientation: building the transposed
    # [out_row, T] would force seg through a sublane->lane relayout, which
    # measured 31 us/step (the entire kernel cost); the MXU contracts
    # dim 0 of both operands for free instead.
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1) \
        .astype(jnp.float32)                      # out row per LANE
    start = meta_ref[b, i]

    if is_max:
        # in-chunk segmented max: Hillis-Steele with masked rolls
        pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        k = 1
        while k < chunk:
            x_s = pltpu.roll(x, k, 0)
            seg_s = pltpu.roll(seg, k, 0)
            ok = (pos >= k) & (seg == seg_s)
            x = jnp.maximum(x, jnp.where(ok, x_s, neutral))
            k *= 2
        # route every LOCAL segment tail (incl. the chunk's last row) and
        # max-accumulate — a segment spanning chunks combines in the acc.
        # next-row id via circular roll by chunk-1 (== shift -1); the wrap
        # row is forced to be an end anyway
        is_end = (seg != pltpu.roll(seg, chunk - 1, 0)) | (pos == chunk - 1)
        E = ((rel == j) & is_end).astype(jnp.float32)     # [T, out]
        W = _route(E, x)
        has_end = jax.lax.dot_general(
            E, jnp.ones((chunk, 1), jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(chunk, 1) > 0.5
        W = jnp.where(has_end, W, neutral)
        acc[pl.ds(start, chunk), :] = jnp.maximum(
            acc[pl.ds(start, chunk), :], W)
    else:
        E = (rel == j).astype(jnp.float32)                # [T, out]
        W = _route(E, x)
        acc[pl.ds(start, chunk), :] = acc[pl.ds(start, chunk), :] + W

    # one table write per batch row (the accumulator is VMEM-resident
    # scratch — pipelined *output* blocks would flush/refetch every step)
    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(acc, out_hbm.at[b], sem)
        cp.start()
        cp.wait()


def _reduce_forward(x, seg_ids, num_segments, is_max, chunk, exact=True):
    B, P, C = x.shape
    assert P % chunk == 0, (P, chunk)
    # exact f32 sums: stack (hi, lo) on channels BEFORE the kernel — the
    # routing matmul selects rows linearly, so summing the two output
    # halves reconstructs the exact sum; free while 2C stays within the
    # already-padded 128-lane tile.  Max is selection, not linear — f32
    # max payloads keep bf16-level routing precision (all production max
    # payloads are bf16-born features).
    # C <= 64 keeps the stacked channels inside the one padded 128-lane
    # tile (wider payloads would double the VMEM accumulator); all exact
    # f32 payloads in production are <= 4 channels
    split = (exact and not is_max and C <= 64
             and jnp.dtype(x.dtype) == jnp.float32)
    if split:
        hi, lo = split_hi_lo(x)
        x = jnp.concatenate([hi, lo], axis=-1)
    x, Cp = _pad_channels(x, is_max)
    seg_f = seg_ids.astype(jnp.float32)
    nxt = jnp.concatenate(
        [seg_f[:, 1:], jnp.full((B, 1), -2.0, jnp.float32)], axis=1)
    seg2 = jnp.stack([seg_f, nxt], axis=-1)    # [B, P, 2]
    meta = _seg0_meta(seg_ids, num_segments, chunk)
    rows = _rows_pad(num_segments, chunk)

    kern = functools.partial(_reduce_kernel, chunk=chunk,
                             is_max=bool(is_max))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, Cp), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 2), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, rows, Cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, x, seg2)
    if split:
        return out[:, :num_segments, :C] + out[:, :num_segments, C:2 * C]
    return out[:, :num_segments, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def segment_reduce_pallas(x, seg_ids, num_segments: int, is_max: bool,
                          chunk: int = DEFAULT_CHUNK, exact: bool = True):
    """Segmented sum/max of ``x`` [B, P, C] over ASCENDING ``seg_ids``
    [B, P] (int32; ids >= num_segments = padding suffix).  Returns
    [B, num_segments, C] float32; empty-segment rows are 0 (sum) or the
    neutral -3e38 (max) — callers mask with their row-validity.

    ``exact=True`` (default) hi/lo-splits true-f32 payloads so the routing
    matmuls don't silently truncate to bf16 (see ``_route``); cotangent
    paths pass False (bf16-level gradient noise is free accuracy-wise)."""
    return _reduce_forward(x, seg_ids, num_segments, is_max, chunk, exact)


def _reduce_fwd(x, seg_ids, num_segments, is_max, chunk, exact):
    out = _reduce_forward(x, seg_ids, num_segments, is_max, chunk, exact)
    return out, (x, seg_ids, out)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _bwd_gather(table, seg_ids, num_segments, chunk):
    """Cotangent broadcast-back: pallas on TPU, XLA rows gather elsewhere
    (custom-VJP bodies trace outside any interpret-mode context)."""
    if _on_tpu():
        return segment_gather_pallas(table, seg_ids, chunk, False)
    safe = jnp.clip(seg_ids, 0, num_segments - 1)
    rows = jnp.take_along_axis(table, safe[..., None], axis=1)
    ok = (seg_ids >= 0) & (seg_ids < num_segments)
    return jnp.where(ok[..., None], rows, 0.0)


def _reduce_bwd(num_segments, is_max, chunk, exact, res, g):
    x, seg_ids, out = res
    if is_max:
        if jnp.dtype(x.dtype) == jnp.bfloat16:
            # ONE fused gather for (cotangent, max) via channel concat;
            # bf16 carriers are LOSSLESS only for bf16-born max payloads
            # (the argmax equality below needs out_pt == x bit-exact) and
            # keep the resident table within VMEM at 2x128 channels
            C = x.shape[-1]
            both = jnp.concatenate([g.astype(jnp.bfloat16),
                                    out.astype(jnp.bfloat16)], axis=-1)
            both_pt = _bwd_gather(both, seg_ids, num_segments, chunk)
            g_pt = both_pt[..., :C].astype(jnp.float32)
            out_pt = both_pt[..., C:].astype(jnp.float32)
        else:
            g_pt = _bwd_gather(g.astype(jnp.float32), seg_ids,
                               num_segments, chunk)
            out_pt = _bwd_gather(out, seg_ids, num_segments, chunk)
        ok = (seg_ids >= 0) & (seg_ids < num_segments)
        hit = (x.astype(jnp.float32) == out_pt) & ok[..., None]
        dx = jnp.where(hit, g_pt, 0.0)
    else:
        g_pt = _bwd_gather(g.astype(jnp.float32), seg_ids, num_segments,
                           chunk)
        dx = g_pt                      # gather already zeroes sentinel rows
    return dx.astype(x.dtype), None


segment_reduce_pallas.defvjp(_reduce_fwd, _reduce_bwd)


# ---------------------------------------------------------------------------
# fused slot-outer segment sum (GeoMAE dense target tables)
# ---------------------------------------------------------------------------


def _slot_kernel(meta_ref, vals_ref, seg_ref, out_hbm, acc, sem, *,
                 chunk, cv, group_slots, split):
    """``split``: vals carries pre-split (hi, lo) channel pairs
    ([T, 2*cv]); the product is routed in two dots and summed — exact
    f32 at 2x matmul cost, zero extra grid steps, no in-kernel bit ops
    (those scalarize, see ``split_hi_lo``)."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    n = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    lanes = group_slots * cv
    vals = vals_ref[0].astype(jnp.float32)        # [T, cv]
    seg = seg_ref[0, :, 0:1]                      # [T, 1] pillar ids (f32)
    slot = seg_ref[0, :, 1:2]                     # [T, 1] slot ids (f32)
    seg0 = meta_ref[b, i].astype(jnp.float32)
    rel = seg - seg0

    # prod[t, s_local*cv + c] = vals[t, c] * (slot[t] == g*group + s_local)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, lanes), 1)
    s_of_col = (col // cv).astype(jnp.float32) + g * group_slots
    oh = (slot == s_of_col).astype(jnp.float32)   # [T, lanes]

    def vt_of(off):
        vt = jnp.zeros((chunk, lanes), jnp.float32)
        for c in range(cv):
            vt = vt + jnp.where(col % cv == c,
                                vals[:, off + c:off + c + 1], 0.0)
        return vt

    # natural [T, out_row] one-hot (transposed construction relayouts —
    # see _reduce_kernel) contracted on dim 0
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1) \
        .astype(jnp.float32)
    E = (rel == j).astype(jnp.float32)
    W = _route(E, oh * vt_of(0))
    if split:
        W = W + _route(E, oh * vt_of(cv))
    start = meta_ref[b, i]
    acc[pl.ds(start, chunk), :] = acc[pl.ds(start, chunk), :] + W

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(
            acc, out_hbm.at[b, :, pl.ds(g * lanes, lanes)], sem)
        cp.start()
        cp.wait()


def slot_outer_segment_sum_pallas(vals, slot, seg_ids, num_slots: int,
                                  num_segments: int,
                                  chunk: int = DEFAULT_CHUNK):
    """``out[b, v, s, c] = sum_t vals[b, t, c] * (seg==v) * (slot==s)`` for
    ASCENDING dense ``seg_ids``; the one-hot outer product never touches
    HBM.  vals [B, P, cv] (cv small, e.g. 4); slot [B, P] in [0,
    num_slots).  Returns [B, num_segments, num_slots, cv] float32.
    Invalid points must carry zeroed vals or sentinel seg ids.
    """
    B, P, cv = vals.shape
    assert P % chunk == 0, (P, chunk)
    group_slots = max(128 // cv, 1)
    n_groups = (num_slots + group_slots - 1) // group_slots
    assert num_slots % min(group_slots, num_slots) == 0, (num_slots, cv)
    split = jnp.dtype(vals.dtype) == jnp.float32
    if split:
        hi, lo = split_hi_lo(vals)
        vals = jnp.concatenate([hi, lo], axis=-1)      # [B, P, 2*cv]
    cv_in = vals.shape[-1]
    meta = _seg0_meta(seg_ids, num_segments, chunk)
    seg2 = jnp.stack([seg_ids.astype(jnp.float32),
                      slot.astype(jnp.float32)], axis=-1)
    rows = _rows_pad(num_segments, chunk)
    lanes = group_slots * cv

    kern = functools.partial(_slot_kernel, chunk=chunk, cv=cv,
                             group_slots=group_slots, split=split)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_groups, P // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, cv_in), lambda b, g, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 2), lambda b, g, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, rows, n_groups * lanes),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, vals, seg2)
    out = out[:, :num_segments, :num_slots * cv]
    return out.reshape(B, num_segments, num_slots, cv)


# ---------------------------------------------------------------------------
# fused segment broadcast (reduce + gather-back in ONE kernel)
# ---------------------------------------------------------------------------


def _bcast_kernel(meta_ref, x_ref, seg_ref, out_ref, acc, *, chunk, op,
                  num_segments, split, cnt_idx=0):
    """Two-sweep grid (b, g, i): g=0 accumulates the segment reduce into
    the VMEM-resident table, g=1 window-gathers it back per chunk.  The
    reduced table never round-trips HBM and the whole reduce+broadcast is
    one pallas call (per-call overhead is the dominant cost of the
    separate reduce+gather pair at [4, 262k, 64] on v5e).

    ``split``: the accumulated f32 table values are not bf16-representable,
    so the gather-back dot would truncate them on the MXU; a Veltkamp
    split (pure f32 arithmetic — bitwise/cast chains scalarize in Mosaic,
    see ``split_hi_lo``) rides them through two dots at ~2^-16 relative
    accuracy."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    neutral = _NEG if op == "max" else 0.0

    @pl.when((g == 0) & (i == 0))
    def _():
        acc[...] = jnp.full_like(acc, neutral)

    x = x_ref[0].astype(jnp.float32)              # [T, C(+1)]
    seg = seg_ref[0, :, 0:1]                      # [T, 1] f32 ids
    seg0 = meta_ref[b, i].astype(jnp.float32)
    rel = seg - seg0
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1) \
        .astype(jnp.float32)
    start = meta_ref[b, i]

    @pl.when(g == 0)
    def _():
        if op == "max":
            pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            xm = x
            k = 1
            while k < chunk:
                x_s = pltpu.roll(xm, k, 0)
                seg_s = pltpu.roll(seg, k, 0)
                ok = (pos >= k) & (seg == seg_s)
                xm = jnp.maximum(xm, jnp.where(ok, x_s, neutral))
                k *= 2
            is_end = (seg != pltpu.roll(seg, chunk - 1, 0)) \
                | (pos == chunk - 1)
            E = ((rel == j) & is_end).astype(jnp.float32)
            W = _route(E, xm)
            has_end = jax.lax.dot_general(
                E, jnp.ones((chunk, 1), jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(chunk, 1) > 0.5
            W = jnp.where(has_end, W, neutral)
            acc[pl.ds(start, chunk), :] = jnp.maximum(
                acc[pl.ds(start, chunk), :], W)
        else:
            E = (rel == j).astype(jnp.float32)
            acc[pl.ds(start, chunk), :] = (acc[pl.ds(start, chunk), :]
                                           + _route(E, x))

    @pl.when(g == 1)
    def _():
        E = (rel == j).astype(jnp.float32)
        window = acc[pl.ds(start, chunk), :]
        if split:
            # Veltkamp: hi keeps the top 8 mantissa bits (bf16-exact on
            # the MXU), lo carries the rest (truncates to ~2^-16 rel)
            c = window * 65537.0
            w_hi = c - (c - window)
            y = jax.lax.dot_general(E, w_hi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y + jax.lax.dot_general(E, window - w_hi,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:
            y = jax.lax.dot_general(E, window, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if op == "mean":
            cnt = jnp.maximum(y[:, cnt_idx:cnt_idx + 1], 1.0)
            y = y / cnt
        # overhang rows DO accumulate (the one-hot window spans
        # [seg0, seg0+chunk)); points of overflowed/sentinel segments must
        # read 0 like the fallback's clipped take_rows, not the overhang
        y = jnp.where(seg < float(num_segments), y, 0.0)
        out_ref[0] = y.astype(out_ref.dtype)


def _bcast_forward(x, seg_ids, num_segments, op, chunk, exact=True):
    B, P, C = x.shape
    assert P % chunk == 0, (P, chunk)
    dtype = x.dtype
    # exact f32 accumulation: hi/lo-split the payload channels (see
    # _reduce_forward) so the g=0 routing dots don't truncate to bf16;
    # the g=1 gather splits in-kernel (Veltkamp) since the accumulated
    # sums are new f32 values.  Max is selection (bf16-born payloads).
    split = (exact and op != "max" and C <= 63
             and jnp.dtype(dtype) == jnp.float32)
    xin = x.astype(jnp.float32)
    if split:
        hi, lo = split_hi_lo(xin)
        xin = jnp.concatenate([hi, lo], axis=-1)
    if op == "mean":
        xin = jnp.concatenate(
            [xin, jnp.ones((B, P, 1), jnp.float32)], axis=-1)
    cnt_idx = xin.shape[-1] - 1
    xin, Cp = _pad_channels(xin, op == "max")
    seg_f = seg_ids.astype(jnp.float32)
    seg2 = jnp.stack([seg_f, seg_f], axis=-1)
    meta = _seg0_meta(seg_ids, num_segments, chunk)
    rows = _rows_pad(num_segments, chunk)
    nsteps = P // chunk

    kern = functools.partial(_bcast_kernel, chunk=chunk, op=op,
                             num_segments=num_segments, split=split,
                             cnt_idx=cnt_idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2, nsteps),
        in_specs=[
            # x is only read in sweep 0 — park the block during sweep 1
            # (see the channel-major twin)
            pl.BlockSpec((1, chunk, Cp),
                         lambda b, g, i, *_: (b, i * (1 - g), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 2), lambda b, g, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # sweep 0 parks the output block on a trailing throwaway block (its
        # index never changes within the sweep -> one garbage flush); sweep
        # 1 writes the real blocks
        out_specs=pl.BlockSpec(
            (1, chunk, Cp),
            lambda b, g, i, *_: (b, i * g + nsteps * (1 - g), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, Cp), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P + chunk, Cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, xin, seg2)
    out = out[:, :P]
    if split:
        # both halves were divided by cnt already (mean divides all lanes)
        return (out[..., :C] + out[..., C:2 * C]).astype(dtype)
    return out[..., :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def segment_broadcast_pallas(x, seg_ids, num_segments: int, op: str,
                             chunk: int = DEFAULT_CHUNK,
                             exact: bool = True):
    """Per-point segment reduction broadcast: ``out[b, t] =
    op_{q: seg[q]==seg[t]} x[b, q]`` for ASCENDING dense ids, one pallas
    call (contract as :func:`segment_reduce_pallas`).  ``op`` in
    {"sum", "mean", "max"}.  Rows with seg >= num_segments (sentinel AND
    capacity-overflow ids) return 0 on every op, like the fallback's
    clipped take_rows.  ``exact`` as in :func:`segment_reduce_pallas`
    (sum/mean only — max payloads are bf16-born and selection-routed)."""
    return _bcast_forward(x, seg_ids, num_segments, op, chunk, exact)


def _bcast_fwd(x, seg_ids, num_segments, op, chunk, exact):
    out = _bcast_forward(x, seg_ids, num_segments, op, chunk, exact)
    res = (x, out, seg_ids) if op == "max" else (seg_ids,)
    return out, res


def _bcast_bwd(num_segments, op, chunk, exact, res, g):
    if op == "max":
        x, out, seg_ids = res
        gs = _bcast_cot(g, seg_ids, num_segments, "sum", chunk)
        hit = x.astype(jnp.float32) == out.astype(jnp.float32)
        dx = jnp.where(hit, gs, 0.0).astype(x.dtype)
    else:
        (seg_ids,) = res
        # sum-broadcast is self-adjoint; mean-broadcast's adjoint is
        # mean-broadcast (sum of cotangents / the same segment count)
        dx = _bcast_cot(g, seg_ids, num_segments, op, chunk).astype(g.dtype)
    return dx, None


def _bcast_cot(g, seg_ids, num_segments, op, chunk):
    if _on_tpu():
        # bf16-level routing is free accuracy-wise on cotangents
        return segment_broadcast_pallas(g.astype(jnp.float32), seg_ids,
                                        num_segments, op, chunk, False)
    from .scatter import segment_mean, segment_sum, take_rows_sorted
    red = segment_mean if op == "mean" else segment_sum

    def one(gg, ss):
        # out-of-range ids are a suffix the sorted path ignores; masking
        # via `valid` (NOT clipping into the last real segment) keeps the
        # mean's denominator equal to the forward's per-segment count
        ok = (ss >= 0) & (ss < num_segments)
        r = red(gg, ss, num_segments, ok, sorted_ids=True)
        if op == "mean":
            r = r[0]
        return take_rows_sorted(r, ss)
    return jax.vmap(one)(g.astype(jnp.float32), seg_ids)


segment_broadcast_pallas.defvjp(_bcast_fwd, _bcast_bwd)


# ---------------------------------------------------------------------------
# segment gather (broadcast table rows back to sorted points)
# ---------------------------------------------------------------------------


def _gather_kernel(meta_ref, seg_ref, table_hbm, out_ref, tbl, sem, *,
                   chunk, aligned):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # resident table loads ONCE per batch row into scratch — a pipelined
    # input block would be double-buffered (2 x 10.7 MB > the 16 MB VMEM
    # budget inside a fused train step)
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], tbl, sem)
        cp.start()
        cp.wait()

    seg = seg_ref[0, :, 0:1]                      # [T, 1] f32 ids, sublane
    if aligned:
        # 16-bit tables: a dynamic sublane offset on a packed (16, 128)
        # tile must be PROVABLY 8-aligned for Mosaic's vector.load.  meta
        # carries start//16; multiplying back by 16 is divisibility the
        # compiler can see, and the one-hot window widens by 16 to cover
        # the rounding (ids satisfy id - start < chunk by contract).
        start = meta_ref[b, i] * 16
        W = chunk + 16
    else:
        start = meta_ref[b, i]
        W = chunk
    seg0 = start.astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1) \
        .astype(jnp.float32)
    E = ((seg - seg0) == j).astype(tbl.dtype)     # [T, window], natural
    window = tbl[pl.ds(start, W), :]
    out_ref[0] = jax.lax.dot_general(
        E, window, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _gather_forward(table, seg_ids, chunk, exact=True):
    B, S, C = table.shape
    P = seg_ids.shape[1]
    assert P % chunk == 0, (P, chunk)
    dtype = table.dtype
    # exact f32 gathers ride the same channel-stacked (hi, lo) trick as
    # the sum (free while 2C fits the padded lane tile)
    split = exact and C <= 64 and jnp.dtype(dtype) == jnp.float32
    # bf16 tables STAY bf16 in VMEM (the one-hot is 0/1-exact in any
    # dtype): a 256-channel bf16 table upcast to f32 would blow the
    # ~16 MB VMEM budget at [20k rows]
    if split or jnp.dtype(dtype) != jnp.bfloat16:
        table = table.astype(jnp.float32)
    if split:
        hi, lo = split_hi_lo(table)
        table = jnp.concatenate([hi, lo], axis=-1)
    pad_neutral = 0.0
    Cfull = table.shape[-1]
    Cp = max(((Cfull + 127) // 128) * 128, 128)
    if Cp != Cfull:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, Cp - Cfull)),
                        constant_values=pad_neutral)
    aligned = jnp.dtype(table.dtype).itemsize == 2
    # one-hot windows reach [start, start + chunk) (+16 when aligned):
    # pad the row axis
    rows = _rows_pad(S, chunk + (16 if aligned else 0))
    table = jnp.pad(table, ((0, 0), (0, rows - S), (0, 0)))
    seg_f = seg_ids.astype(jnp.float32)
    seg2 = jnp.stack([seg_f, seg_f], axis=-1)   # 2 lanes: proven tiling
    meta = _seg0_meta(seg_ids, S, chunk)
    if aligned:
        meta = meta // 16

    kern = functools.partial(_gather_kernel, chunk=chunk, aligned=aligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, 2), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, chunk, Cp), lambda b, i, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, Cp), table.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, Cp), jnp.float32),
    )(meta, seg2, table)
    if split:
        return (out[..., :C] + out[..., C:2 * C]).astype(dtype)
    return out[..., :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_gather_pallas(table, seg_ids, chunk: int = DEFAULT_CHUNK,
                          exact: bool = True):
    """``out[b, t] = table[b, seg_ids[b, t]]`` for ASCENDING dense ids
    (same contract as :func:`segment_reduce_pallas`); rows with
    ``seg_ids >= table.shape[1]`` (sentinel suffix) return 0.  ``exact``
    as in :func:`segment_reduce_pallas` (one-hot routing is a matmul)."""
    return _gather_forward(table, seg_ids, chunk, exact)


def _gather_fwd(table, seg_ids, chunk, exact):
    # zero-width token carries the STATIC table length + dtype through the
    # residuals (custom_vjp residuals must be JAX types)
    token = jnp.zeros((table.shape[1], 0), table.dtype)
    return _gather_forward(table, seg_ids, chunk, exact), (token, seg_ids)


def _gather_bwd(chunk, exact, res, g):
    token, seg_ids = res
    # NOTE: rows of the result no point maps to are garbage (see the reduce
    # contract).  In practice the gathered table is always produced through
    # a row-validity ``where`` whose own VJP zeroes those rows' cotangents,
    # so no scatter-based occupancy mask is needed here.
    if _on_tpu():
        # pallas reduce (2.9 ms at [4, 262k, 128] after the natural-
        # orientation one-hot fix) beats the scan path's cumsum
        dt = segment_reduce_pallas(g.astype(jnp.float32), seg_ids,
                                   token.shape[0], False, chunk, False)
    else:
        from .scatter import segment_sum
        dt = jax.vmap(lambda gg, ss: segment_sum(
            gg, ss, token.shape[0], sorted_ids=True))(
            g.astype(jnp.float32), seg_ids)
    return dt.astype(token.dtype), None


segment_gather_pallas.defvjp(_gather_fwd, _gather_bwd)


# ---------------------------------------------------------------------------
# expand: key-sorted rows -> dense cell grid (the scatter-set inverse)
# ---------------------------------------------------------------------------


def _expand_kernel(meta_ref, key_ref, table_hbm, out_ref, tbl, sem, *,
                   chunk, window):
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], tbl, sem)
        cp.start()
        cp.wait()

    start = meta_ref[b, i] * 128          # provable 128-alignment
    win = tbl[pl.ds(start, window), :]            # [W, 128]
    kw = key_ref[0, 0:1, pl.ds(start, window)]    # [1, W] f32 keys, lanes
    c0 = (i * chunk)
    # int32 iota then cast: Mosaic's tpu.iota only emits integer vectors
    cells = jax.lax.broadcasted_iota(
        jnp.int32, (chunk, 1), 0).astype(jnp.float32) + jnp.float32(c0)
    E = (kw == cells).astype(win.dtype)           # [T, W], natural
    out_ref[0] = jax.lax.dot_general(
        E, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def expand_rows_pallas(feats, key, n_cells: int,
                       chunk: int = DEFAULT_CHUNK):
    """``out[b, c] = feats[b, r]`` where ``key[b, r] == c`` (0 if no row).

    The inverse of :func:`segment_gather_pallas` — replaces the XLA
    ``zeros.at[key].set(feats)`` dense-grid build, whose TPU lowering
    serializes the updates (measured ~10 ms at [4, 20480] -> [160001]
    rows inside the pretrain step; this kernel routes each 512-cell chunk
    with one one-hot matmul against a 640-row table window).

    Contract: ``key`` ascending per batch row with UNIQUE values in
    ``[0, n_cells)``; rows with ``key == n_cells`` (the sentinel tail) all
    land in output row ``n_cells`` summed together (callers discard it).
    Returns f32 ``[B, n_cells + 1, C]``, exact for f32 inputs (hi/lo
    channel split).
    """
    B, V, C = feats.shape
    assert C <= 48, C
    window = chunk + 128
    n_out = n_cells + 1
    n_chunks = (n_out + chunk - 1) // chunk

    hi, lo = split_hi_lo(feats.astype(jnp.float32))
    table = jnp.concatenate(
        [hi, lo, key.astype(jnp.float32)[..., None]], axis=-1)
    Cfull = table.shape[-1]
    table = jnp.pad(table, ((0, 0), (0, 0), (0, 128 - Cfull)))
    rows = ((V + window + 7) // 8) * 8
    # pad rows carry an impossible key so they never match a cell
    pad_tbl = jnp.concatenate([
        jnp.zeros((B, rows - V, 2 * C), jnp.float32),
        jnp.full((B, rows - V, 1), 2.0 ** 26, jnp.float32),
        jnp.zeros((B, rows - V, 127 - 2 * C), jnp.float32)], axis=-1)
    table = jnp.concatenate([table, pad_tbl], axis=1)

    lane_rows = ((rows + 127) // 128) * 128
    key_t = jnp.pad(key.astype(jnp.float32), ((0, 0), (0, lane_rows - V)),
                    constant_values=2.0 ** 26)[:, None, :]   # [B, 1, R]

    # chunk starts: #keys < i*chunk, via a histogram over chunk bins
    # (pad/sentinel keys clip into the last bin -> affect no start)
    bins = jnp.clip(key // chunk, 0, n_chunks - 1)
    counts = jnp.sum(jax.nn.one_hot(bins, n_chunks, dtype=jnp.int32),
                     axis=1)                                  # [B, nch]
    starts = jnp.cumsum(counts, axis=-1) - counts
    meta = jnp.minimum(starts // 128,
                       (rows - window) // 128).astype(jnp.int32)

    kern = functools.partial(_expand_kernel, chunk=chunk, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, lane_rows), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, chunk, 128),
                               lambda b, i, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_chunks * chunk, 128),
                                       jnp.float32),
    )(meta, key_t, table)
    out = out[:, :n_out]
    return out[..., :C] + out[..., C:2 * C]
