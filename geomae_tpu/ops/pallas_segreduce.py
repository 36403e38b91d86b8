"""Pallas segmented reduce / gather over sorted dense segment ids.

The workhorses behind the VFE's point<->pillar traffic and the GeoMAE
centroid sums.  XLA's alternatives are all bandwidth-catastrophic on TPU:
scatter-adds sort internally (~90 ms/batch), ``associative_scan`` makes
log(N) full passes, and row gathers run at ~25 M rows/s (~40 ms for one
262k-point gather-back).  Both kernels here make ONE pass over the
[B, P, C] point data in chunks, with all per-chunk scalars (first id, open
-segment continuation, output window start) precomputed OUTSIDE the kernel
and delivered via scalar prefetch — extracting scalars from VMEM vectors
inside the kernel costs ~µs each and dominated the v1 runtime.

* ``segment_reduce_pallas`` (sum/max): SUM is a per-chunk one-hot matmul
  ``W[j] = sum_t x[t] * (seg[t]-seg0 == j)`` on the MXU — no scan; the
  chunk's first row additionally receives the running carry.  MAX runs a
  Hillis-Steele segmented scan (log2(T) masked ``pltpu.roll`` steps) and
  routes segment-END rows with a (permutation) one-hot matmul.  Both write
  output rows [seg0, seg0 + T) with a dynamic-start DMA per batch row;
  because ids ascend, a segment's CLOSING chunk is the last writer of its
  row, so earlier partial/dummy window writes are safely overwritten (the
  grid is sequential).
* ``segment_gather_pallas``: the transpose — DMA-reads table rows
  [seg0, seg0 + T) into VMEM and routes them to points with the transposed
  one-hot matmul (exact: one 0/1 coefficient per row).  Replaces the
  gather-back broadcasts (``scatter_v2``'s gather side, reference
  ``voxel_encoder.py:400-412``).

Ids are passed as exact float32 (ids < 2^24) to sidestep Mosaic's int32
slice-tiling limits.  The caller pads ids with a trailing sentinel segment
(id = num_segments) so the last real segment closes.

CONTRACT (beyond ascending ids): within any one chunk of positions, every
non-sentinel id must satisfy ``id - chunk_first_id < chunk`` — the one-hot
window only addresses ``chunk`` rows.  Dense rank ids (0,0,1,2,2,... with
no skips, as produced by ``voxelize.build_scene``'s ``point2voxel``)
satisfy this for any chunk size; arbitrary sparse ids do NOT.  Reduce
rows after the last closed segment are garbage — callers mask with their
row-validity (``table.valid``).  Gather outputs for sentinel ids are 0.

Backward (custom VJP): sum -> gather of the cotangent at each point's
segment; max -> gather + equality routing (ties share gradient);
gather -> segment sum of the cotangents.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 256
_NEG = -3.0e38


def _pad_channels(x, is_max):
    C = x.shape[-1]
    Cp = max(((C + 127) // 128) * 128, 128)   # Mosaic lane alignment
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C)),
                    constant_values=_NEG if is_max else 0.0)
    return x, Cp


def _chunk_meta(seg_ids, num_segments, chunk):
    """[3, B, nsteps] int32: first id, continuation flag, clipped start."""
    seg0 = seg_ids[:, ::chunk]
    prev_last = jnp.concatenate(
        [jnp.full_like(seg_ids[:, :1], -1), seg_ids[:, chunk - 1::chunk]],
        axis=1)[:, :seg0.shape[1]]
    cont = (seg0 == prev_last).astype(jnp.int32)
    start = jnp.clip(seg0, 0, num_segments)
    return jnp.stack([seg0, cont, start]).astype(jnp.int32)


def _reduce_kernel(meta_ref, x_ref, seg_ref, out_hbm, carry, wbuf, sems, *,
                   chunk, batch, is_max, exact):
    i = pl.program_id(0)
    neutral = _NEG if is_max else 0.0
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.full_like(carry, neutral)

    j = jax.lax.broadcasted_iota(            # out row (f32 for the
        jnp.int32, (chunk, chunk), 0).astype(jnp.float32)  # id compare)
    copies = []
    for b in range(batch):
        x = x_ref[b].astype(jnp.float32)          # [T, C]
        seg = seg_ref[b, :, 0:1]                  # [T, 1] f32 ids
        seg0 = meta_ref[0, b, i].astype(jnp.float32)
        cont = meta_ref[1, b, i] == 1
        relf = seg - seg0                         # [T, 1] f32 relative id
        is_last = seg == seg[chunk - 1:chunk]     # vector-vector compare
        cvals = carry[b:b + 1, :]                 # [1, C]

        if is_max:
            x = jnp.where((relf == 0.0) & cont, jnp.maximum(x, cvals), x)
            pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            k = 1
            while k < chunk:
                x_s = pltpu.roll(x, k, 0)
                seg_s = pltpu.roll(seg, k, 0)
                ok = (pos >= k) & (seg == seg_s)
                x = jnp.maximum(x, jnp.where(ok, x_s, neutral))
                k *= 2
            is_end = seg != seg_ref[b, :, 1:2]
            E = (relf[:, 0][None, :] == j) & is_end[:, 0][None, :]
            W = jax.lax.dot_general(E.astype(jnp.float32), x,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            new_carry = jnp.max(jnp.where(is_last, x, neutral),
                                axis=0, keepdims=True)
        else:
            E = relf[:, 0][None, :] == j
            W = jax.lax.dot_general(E.astype(jnp.float32), x,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            first = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) == 0
            W = jnp.where(first & cont, W + cvals, W)
            new_carry = jnp.sum(jnp.where(is_last, x, 0.0),
                                axis=0, keepdims=True)

        carry[b:b + 1, :] = new_carry
        start = meta_ref[2, b, i]
        slot = i % 2
        # consecutive output windows OVERLAP (rows of still-open segments
        # are rewritten by the closing chunk), so step i's write must not
        # race step i-1's: wait the previous DMA (same byte count — the
        # descriptor is only used for its size) before issuing.  The wait
        # lands after this step's compute, so the previous write's latency
        # hides behind the matmuls.
        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[1 - slot, b], out_hbm.at[b, pl.ds(start, chunk), :],
                sems.at[1 - slot, b]).wait()
        wbuf[slot, b] = W.astype(wbuf.dtype)
        cp = pltpu.make_async_copy(
            wbuf.at[slot, b], out_hbm.at[b, pl.ds(start, chunk), :],
            sems.at[slot, b])
        cp.start()
        copies.append(cp)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for cp in copies:
            cp.wait()


def _reduce_forward(x, seg_ids, num_segments, is_max, chunk):
    B, P, C = x.shape
    assert P % chunk == 0, (P, chunk)
    exact = x.dtype == jnp.float32 and not is_max
    x, Cp = _pad_channels(x, is_max)
    seg_f = seg_ids.astype(jnp.float32)
    nxt = jnp.concatenate(
        [seg_f[:, 1:], jnp.full((B, 1), -2.0, jnp.float32)], axis=1)
    seg2 = jnp.stack([seg_f, nxt], axis=-1)    # [B, P, 2]
    meta = _chunk_meta(seg_ids, num_segments, chunk)

    kern = functools.partial(_reduce_kernel, chunk=chunk, batch=B,
                             is_max=bool(is_max), exact=exact)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // chunk,),
        in_specs=[
            pl.BlockSpec((B, chunk, Cp), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, 2), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((B, Cp), jnp.float32),
            pltpu.VMEM((2, B, chunk, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_segments + chunk + 1, Cp),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, x, seg2)
    return out[:, :num_segments, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def segment_reduce_pallas(x, seg_ids, num_segments: int, is_max: bool,
                          chunk: int = DEFAULT_CHUNK):
    """Segmented sum/max of ``x`` [B, P, C] over ASCENDING ``seg_ids``
    [B, P] (int32; ids >= num_segments = padding suffix).  Returns
    [B, num_segments, C] float32; rows of empty segments are garbage —
    callers mask with their row-validity."""
    return _reduce_forward(x, seg_ids, num_segments, is_max, chunk)


def _reduce_fwd(x, seg_ids, num_segments, is_max, chunk):
    out = _reduce_forward(x, seg_ids, num_segments, is_max, chunk)
    return out, (x, seg_ids, out)


def _reduce_bwd(num_segments, is_max, chunk, res, g):
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


segment_reduce_pallas.defvjp(_reduce_fwd, _reduce_bwd)


# ---------------------------------------------------------------------------
# segment gather (broadcast table rows back to sorted points)
# ---------------------------------------------------------------------------

def _gather_kernel(meta_ref, seg_ref, table_hbm, out_ref, wnd, sems, *,
                   chunk, batch):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    j = jax.lax.broadcasted_iota(            # window row
        jnp.int32, (chunk, chunk), 1).astype(jnp.float32)
    slot = i % 2

    def issue(step, s):
        for b in range(batch):
            pltpu.make_async_copy(
                table_hbm.at[b, pl.ds(meta_ref[2, b, step], chunk), :],
                wnd.at[s, b], sems.at[s, b]).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    # prefetch the NEXT window while this one computes (reads don't race;
    # starts come from scalar prefetch so they're known ahead of time)
    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, 1 - slot)

    for b in range(batch):
        pltpu.make_async_copy(
            table_hbm.at[b, pl.ds(meta_ref[2, b, i], chunk), :],
            wnd.at[slot, b], sems.at[slot, b]).wait()
        seg = seg_ref[b, :, 0]                    # [T] f32 ids
        seg0 = meta_ref[0, b, i].astype(jnp.float32)
        E = (seg - seg0)[:, None] == j            # [T, window]
        out_ref[b] = jax.lax.dot_general(
            E.astype(jnp.float32), wnd[slot, b].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _gather_forward(table, seg_ids, chunk):
    B, S, C = table.shape
    P = seg_ids.shape[1]
    assert P % chunk == 0, (P, chunk)
    dtype = table.dtype
    # bf16 HBM tiling packs 2 rows per word: a dynamic window start at an
    # odd row is not expressible as a DMA, so the window path runs in f32
    table, Cp = _pad_channels(table.astype(jnp.float32), False)
    # window reads reach [start, start + chunk): pad the table's row axis
    table = jnp.pad(table, ((0, 0), (0, chunk + 1), (0, 0)))
    seg_f = seg_ids.astype(jnp.float32)
    seg2 = jnp.stack([seg_f, seg_f], axis=-1)   # 2 lanes: proven tiling
    meta = _chunk_meta(seg_ids, S, chunk)

    kern = functools.partial(_gather_kernel, chunk=chunk, batch=B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // chunk,),
        in_specs=[
            pl.BlockSpec((B, chunk, 2), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((B, chunk, Cp), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, chunk, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, Cp), jnp.float32),
    )(meta, seg2, table)
    return out[..., :C].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_gather_pallas(table, seg_ids, chunk: int = DEFAULT_CHUNK):
    """``out[b, t] = table[b, seg_ids[b, t]]`` for ASCENDING dense ids
    (same contract as :func:`segment_reduce_pallas`); rows with
    ``seg_ids >= table.shape[1]`` (sentinel suffix) return 0."""
    return _gather_forward(table, seg_ids, chunk)


def _gather_fwd(table, seg_ids, chunk):
    # zero-width token carries the STATIC table length + dtype through the
    # residuals (custom_vjp residuals must be JAX types)
    token = jnp.zeros((table.shape[1], 0), table.dtype)
    return _gather_forward(table, seg_ids, chunk), (token, seg_ids)


def _gather_bwd(chunk, res, g):
    token, seg_ids = res
    # NOTE: rows of the result no point maps to are garbage (see the reduce
    # contract).  In practice the gathered table is always produced through
    # a row-validity ``where`` whose own VJP zeroes those rows' cotangents,
    # so no scatter-based occupancy mask is needed here.
    dt = segment_reduce_pallas(g.astype(jnp.float32), seg_ids,
                               token.shape[0], False, chunk)
    return dt.astype(token.dtype), None


segment_gather_pallas.defvjp(_gather_fwd, _gather_bwd)
