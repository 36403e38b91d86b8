"""Pallas segmented reduce over sorted segment ids (single HBM pass).

The workhorse behind the VFE's point->pillar reductions and the GeoMAE
centroid sums.  XLA's alternatives are all bandwidth-catastrophic on TPU:
scatter-adds sort internally (~90 ms/batch), ``associative_scan`` makes
log(N) full passes, and per-element gathers run at ~100 M/s.  This kernel
makes ONE pass over the [B, P, C] data:

* the grid walks chunks of the point axis sequentially, all batch rows per
  step (few, fat steps); VMEM carries hold each row's open segment partial
  across chunk boundaries;
* SUM: a one-hot matmul ``W[j] = sum_t x[t] * (seg[t]-seg0 == j)`` computes
  every in-chunk segment sum directly on the MXU — no scan at all.  The
  chunk's first segment additionally receives the carry.
* MAX: a Hillis-Steele segmented scan (log2(T) masked ``pltpu.roll`` steps
  in VMEM) produces inclusive per-segment maxima; segment-END rows are then
  routed with a (permutation) one-hot matmul.
* both write rows [seg0, seg0 + T) of the output with one dynamic-start
  DMA per batch row.  Because ids ascend, a segment's CLOSING chunk is the
  last writer of its row, so partial/dummy writes by earlier chunks are
  safely overwritten (the grid is sequential).

Ids are passed as exact float32 (ids < 2^24) to sidestep Mosaic's int32
slice-tiling limits.  The caller pads ids with a trailing sentinel segment
(id = num_segments) so the last real segment closes; outputs carry trash
rows past the last closed segment.

CONTRACT (beyond ascending ids): within any one chunk of positions, every
non-sentinel id must satisfy ``id - chunk_first_id < chunk`` — the one-hot
compaction only addresses a ``chunk``-row output window.  Dense rank ids
(0,0,1,2,2,... with no skips, as produced by ``voxelize.build_scene``'s
``point2voxel``) satisfy this for any chunk size; arbitrary sparse ids do
NOT.  A segment violating the bound is silently dropped (its output row
keeps whatever a neighboring chunk wrote, or HBM garbage).  Rows after the
last closed segment are also garbage — callers mask with their row-validity
(``table.valid``).

Backward (custom VJP): sum -> gather of the cotangent at each point's
segment; max -> gather + equality routing (ties share gradient).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 256
_NEG = -3.0e38


def _kernel(x_ref, seg_ref, out_hbm, carry, carry_seg, wbuf, sems, *, chunk,
            num_segments, channels, batch, is_max):
    i = pl.program_id(0)
    neutral = _NEG if is_max else 0.0

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.full_like(carry, neutral)
        for b in range(batch):          # SMEM stores must be scalar
            carry_seg[0, b] = -1.0

    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)  # out row
    copies = []
    for b in range(batch):
        x = x_ref[b].astype(jnp.float32)          # [T, C]
        seg = seg_ref[b, :, 0:1]                  # [T, 1] f32 ids
        seg0 = seg[0, 0]
        seg_last = seg[chunk - 1, 0]
        seg_rel = (seg[:, 0] - seg0).astype(jnp.int32)
        cont = carry_seg[0, b] == seg0
        cvals = carry[b:b + 1, :]                 # [1, C]

        if is_max:
            # fold carry into the (open) first segment, then scan
            x = jnp.where((seg == seg0) & cont, jnp.maximum(x, cvals), x)
            pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            k = 1
            while k < chunk:
                x_s = pltpu.roll(x, k, 0)
                seg_s = pltpu.roll(seg, k, 0)
                ok = (pos >= k) & (seg == seg_s)
                x = jnp.maximum(x, jnp.where(ok, x_s, neutral))
                k *= 2
            is_end = seg != seg_ref[b, :, 1:2]
            E = (seg_rel[None, :] == j) & is_end[:, 0][None, :]
            # routing matmul: each out row receives exactly one end value,
            # so DEFAULT (single-pass bf16) would round it — use HIGHEST
            W = jax.lax.dot_general(E.astype(jnp.float32), x,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            new_carry = jnp.max(jnp.where(seg == seg_last, x, neutral),
                                axis=0, keepdims=True)
        else:
            # the matmul IS the in-chunk segment sum (f32 accumulate)
            E = seg_rel[None, :] == j
            W = jax.lax.dot_general(E.astype(jnp.float32), x,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            first = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) == 0
            W = jnp.where(first & cont, W + cvals, W)
            new_carry = jnp.sum(jnp.where(seg == seg_last, x, 0.0),
                                axis=0, keepdims=True)

        carry[b:b + 1, :] = new_carry
        carry_seg[0, b] = seg_last

        start = jnp.clip(seg0.astype(jnp.int32), 0, num_segments)
        wbuf[b] = W.astype(wbuf.dtype)
        cp = pltpu.make_async_copy(
            wbuf.at[b], out_hbm.at[b, pl.ds(start, chunk), :], sems.at[b])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


def _forward(x, seg_ids, num_segments, is_max, chunk):
    B, P, C = x.shape
    assert P % chunk == 0, (P, chunk)
    Cp = max(((C + 127) // 128) * 128, 128)   # Mosaic lane alignment
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C)),
                    constant_values=_NEG if is_max else 0.0)
    seg_f = seg_ids.astype(jnp.float32)
    nxt = jnp.concatenate(
        [seg_f[:, 1:], jnp.full((B, 1), -2.0, jnp.float32)], axis=1)
    seg2 = jnp.stack([seg_f, nxt], axis=-1)    # [B, P, 2]

    kern = functools.partial(_kernel, chunk=chunk,
                             num_segments=num_segments, channels=Cp,
                             batch=B, is_max=bool(is_max))
    out = pl.pallas_call(
        kern,
        grid=(P // chunk,),
        in_specs=[
            pl.BlockSpec((B, chunk, Cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, num_segments + chunk + 1, Cp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, Cp), jnp.float32),
            pltpu.SMEM((1, B), jnp.float32),
            pltpu.VMEM((B, chunk, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, seg2)
    return out[:, :num_segments, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def segment_reduce_pallas(x, seg_ids, num_segments: int, is_max: bool,
                          chunk: int = DEFAULT_CHUNK):
    """Segmented sum/max of ``x`` [B, P, C] over ASCENDING ``seg_ids``
    [B, P] (int32; ids >= num_segments = padding suffix).  Returns
    [B, num_segments, C] float32; rows of empty segments are garbage —
    callers mask with their row-validity."""
    return _forward(x, seg_ids, num_segments, is_max, chunk)


def _fwd(x, seg_ids, num_segments, is_max, chunk):
    out = _forward(x, seg_ids, num_segments, is_max, chunk)
    return out, (x, seg_ids, out)


def _bwd(num_segments, is_max, chunk, res, g):
    x, seg_ids, out = res
    safe = jnp.clip(seg_ids, 0, num_segments - 1)
    g_pt = jnp.take_along_axis(g, safe[..., None], axis=1)
    ok = (seg_ids >= 0) & (seg_ids < num_segments)
    if is_max:
        out_pt = jnp.take_along_axis(out, safe[..., None], axis=1)
        hit = (x.astype(jnp.float32) == out_pt) & ok[..., None]
        dx = jnp.where(hit, g_pt, 0.0)
    else:
        dx = jnp.where(ok[..., None], g_pt, 0.0)
    return dx.astype(x.dtype), None


segment_reduce_pallas.defvjp(_fwd, _bwd)
