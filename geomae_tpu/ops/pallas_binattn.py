"""Bin-packed exact window attention (Pallas TPU, forward + fused backward).

Drop-in replacement for the band kernels (``ops/pallas_attention.py``) with
~2.2x less pair work at nuScenes occupancy.  The window-sorted stream is cut
into <= 256-row BINS at window boundaries (``ops/windows.bin_pack``), so a
whole window always lives in one bin and attention is exact per bin:

  band:  every 256-query tile attends a 640-wide band (window <= 144 ==>
         +-192 pad covers it); useful pairs ~ 144/640.
  bins:  each query attends only its own bin's 256 rows; bins are >= 113
         rows full by construction, so pair work is ~256 * V/fill ~ 290/row.

The reference's equivalent is the drop-level bucketing of
``SSTInputLayer`` + per-bucket ``nn.MultiheadAttention``
(``/root/reference/mmdet3d/ops/sst/sst_ops.py:272-388``,
``models/sst/sst_basic_block.py:36-59``) — which pads windows into
``[num_win, bucket, C]`` buffers and DROPS tokens past each bucket's cap.
Bins never drop (next-fit keeps whole windows) and never reorder (cut
points only — the same window-sorted permutation feeds both paths).

Masking needs no window ids: a row's window occupies the CONTIGUOUS
bin-relative range [rel_start, rel_end) carried per row, so
``mask[i, j] = rel_start_i <= j < rel_end_i`` builds from sublane vectors
against a free column iota.  The mask is symmetric (same-window), which the
backward exploits: the transposed-score path masks with the KEY rows' own
ranges, and all-masked COLUMNS (spillover / invalid rows) are detected by a
sublane-reduce of the bias — no lane-major per-row metadata anywhere.

Per-row softmax stats are NOT saved: both backward orientations recompute
max/normalizer from the rebuilt scores along whichever axis is natural
(lane-reduce for [q, k], sublane-reduce for [k, q]), and D_i = sum_d dO*O
comes from a ones-contraction on the MXU in either orientation — so the
forward emits only the output, and dq/dk/dv come from ONE fused kernel.

Output rows are written with manual DMAs at dynamic row offsets; a bin's
full-tile write overlaps its successors by < window-size rows, so writes
are ORDERED: each step waits the previous write before issuing its own
(TPU pallas grids execute serially), and ascending order makes the owner
bin's write land last.  Rows no bin owns (the invalid suffix) are never
written — the wrapper masks them to zero afterwards.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512
_NEG = -1e9
_EPS = 1e-20
_AUX_LANES = 128     # rel bounds ride a 128-lane bf16 array (DMA-aligned)


def _prefetch(S_ref, nb_ref, issue, l, b, j, slot, cur):
    """First-step + next-step double-buffered DMA issue (shared fwd/bwd)."""
    NB = pl.num_programs(1)

    @pl.when((l == 0) & cur)
    def _():
        issue(b, j, slot)

    nbb = b + (j + 1) // NB
    njj = jax.lax.rem(j + 1, NB)
    nbb_c = jnp.minimum(nbb, pl.num_programs(0) - 1)
    next_valid = (l + 1 < pl.num_programs(0) * NB) & (njj < nb_ref[nbb_c])

    @pl.when(next_valid)
    def _():
        issue(nbb_c, njj, 1 - slot)


def _mask_bias(aux_view, tile):
    # rel rides bf16 as DELTAS from the row's own in-bin offset (<= 144,
    # bf16-exact; absolute offsets up to the 512-row tile would round)
    ds = aux_view[:, 0:1].astype(jnp.float32)      # [tile, 1] sublane
    de = aux_view[:, 1:2].astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) \
        .astype(jnp.float32)
    rs = rowi - ds
    re = rowi + de
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
        .astype(jnp.float32)
    mask = (col >= rs) & (col < re)
    return jnp.where(mask, 0.0, _NEG), (re > rs)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_body(qkv_ref, aux_ref, o_ref, *, tile, nheads, head_dim):
    C = nheads * head_dim
    q = qkv_ref[:, :C]
    k_ref = qkv_ref.at[:, C:2 * C]
    v_ref = qkv_ref.at[:, 2 * C:3 * C]
    bias, nonempty = _mask_bias(aux_ref, tile)
    ones = jnp.ones((tile, 1), jnp.float32)
    scale = 1.0 / (head_dim ** 0.5)
    for h in range(nheads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)                          # all-masked rows: e == 1
        lrow = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        lrow = jnp.where(nonempty, lrow, 0.0)
        o = jax.lax.dot_general(
            e.astype(v_ref.dtype), v_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.where(nonempty, o / jnp.maximum(lrow, _EPS), 0.0)
        o_ref[:, sl] = o.astype(o_ref.dtype)


def _fwd_kernel(S_ref, L_ref, nb_ref, qkv_hbm, aux_hbm, out_hbm,
                qkvbuf, auxbuf, obuf, flag, sems, wsem, *,
                tile, nheads, head_dim):
    b = pl.program_id(0)
    j = pl.program_id(1)
    NB = pl.num_programs(1)
    l = b * NB + j
    slot = jax.lax.rem(l, 2)
    cur = j < nb_ref[b]

    @pl.when(l == 0)
    def _():
        flag[0] = 0

    def issue(bb, jj, sl):
        S = pl.multiple_of(S_ref[bb, jj], 8)
        for hbm, buf, si in ((qkv_hbm, qkvbuf, 0), (aux_hbm, auxbuf, 1)):
            pltpu.make_async_copy(hbm.at[bb, pl.ds(S, tile), :],
                                  buf.at[sl], sems.at[sl, si]).start()

    _prefetch(S_ref, nb_ref, issue, l, b, j, slot, cur)

    def wwait():
        # byte-count wait on the single outstanding output write (the
        # descriptor only sizes the wait; all writes are [tile, C])
        pltpu.make_async_copy(obuf.at[0], out_hbm.at[b, pl.ds(0, tile), :],
                              wsem).wait()

    @pl.when(cur)
    def _():
        for buf, si in ((qkvbuf, 0), (auxbuf, 1)):
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, si]).wait()
        _fwd_body(qkvbuf.at[slot], auxbuf.at[slot], obuf.at[slot],
                  tile=tile, nheads=nheads, head_dim=head_dim)

        # ordered overlapping write: wait the previous step's write, then
        # issue ours (ascending order ==> the owner bin lands last)
        @pl.when(flag[0] == 1)
        def _():
            wwait()

        pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[b, pl.ds(pl.multiple_of(S_ref[b, j], 8), tile), :],
            wsem).start()
        flag[0] = 1

    # drain the final outstanding write before the kernel exits
    @pl.when((l == pl.num_programs(0) * NB - 1) & (flag[0] == 1))
    def _():
        wwait()


# ---------------------------------------------------------------------------
# fused backward: dq + dk + dv in one pass
# ---------------------------------------------------------------------------


def _bwd_body(big_ref, aux_ref, dq_ref, dk_ref, dv_ref, L, *, tile,
              nheads, head_dim):
    C = nheads * head_dim
    q = big_ref[:, :C]
    k_ref = big_ref.at[:, C:2 * C]
    v_ref = big_ref.at[:, 2 * C:3 * C]
    do = big_ref[:, 3 * C:4 * C]
    o_ref = big_ref.at[:, 4 * C:5 * C]
    bias, nonempty = _mask_bias(aux_ref, tile)
    # TRANSPOSED-path bias: spillover rows (>= L, owned by later bins)
    # carry owner-bin-relative ranges, so as KEY rows their garbage
    # ranges would claim owned query columns and pollute the per-query
    # normalizer — mask them out by position.  (The [q, k] path needs no
    # guard: owned queries' ranges never reach spillover columns.)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    bias2 = jnp.where(rowi < L, bias, _NEG)
    # all-masked COLUMNS (invalid rows as queries of the transposed
    # path) — sublane-reduce, lane-natural result
    ne2 = jnp.max(bias2, axis=0, keepdims=True) > -1.0      # [1, tile]
    onesd = jnp.ones((head_dim, 1), jnp.float32)
    onesd_r = jnp.ones((1, head_dim), jnp.float32)
    scale = 1.0 / (head_dim ** 0.5)
    for h in range(nheads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        z = (do[:, sl] * o_ref[:, sl]).astype(jnp.float32)    # [tile, D]
        # D_i in both orientations via ones-contractions (MXU)
        d_sub = jax.lax.dot_general(                         # [tile, 1]
            z, onesd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_lane = jax.lax.dot_general(                        # [1, tile]
            onesd_r, z, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # ---- [q, k] orientation: dq ------------------------------------
        s = jax.lax.dot_general(
            q[:, sl], k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        lrow = jnp.sum(e, axis=-1, keepdims=True)
        inv_l = jnp.where(nonempty, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
        p = e * inv_l
        dp = jax.lax.dot_general(
            do[:, sl], v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - d_sub)
        dq = jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)

        # ---- [k, q] orientation: dk, dv --------------------------------
        # same-window masking is symmetric, so the KEY rows' own
        # [rel_start, rel_end) ranges mask the transposed scores
        s2 = jax.lax.dot_general(
            k_ref[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias2
        m2 = jnp.max(s2, axis=0, keepdims=True)              # [1, tile]
        e2 = jnp.exp(s2 - m2)
        l2 = jnp.sum(e2, axis=0, keepdims=True)
        inv_l2 = jnp.where(ne2, 1.0 / jnp.maximum(l2, _EPS), 0.0)
        p2 = e2 * inv_l2                                     # [k, q]
        dv = jax.lax.dot_general(
            p2.astype(do.dtype), do[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [tile, D]
        dp2 = jax.lax.dot_general(
            v_ref[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [k, q]
        ds2 = p2 * (dp2 - d_lane)
        dk = jax.lax.dot_general(
            ds2.astype(q.dtype), q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel(S_ref, L_ref, nb_ref, big_hbm, aux_hbm,
                dq_hbm, dk_hbm, dv_hbm,
                bigbuf, auxbuf,
                dqb, dkb, dvb, flag, sems, wsems, *, tile, nheads, head_dim):
    b = pl.program_id(0)
    j = pl.program_id(1)
    NB = pl.num_programs(1)
    l = b * NB + j
    slot = jax.lax.rem(l, 2)
    cur = j < nb_ref[b]

    @pl.when(l == 0)
    def _():
        flag[0] = 0

    def issue(bb, jj, sl):
        S = pl.multiple_of(S_ref[bb, jj], 8)
        for hbm, buf, si in ((big_hbm, bigbuf, 0), (aux_hbm, auxbuf, 1)):
            pltpu.make_async_copy(hbm.at[bb, pl.ds(S, tile), :],
                                  buf.at[sl], sems.at[sl, si]).start()

    _prefetch(S_ref, nb_ref, issue, l, b, j, slot, cur)

    def wwait():
        for buf, hbm, wi in ((dqb, dq_hbm, 0), (dkb, dk_hbm, 1),
                             (dvb, dv_hbm, 2)):
            pltpu.make_async_copy(buf.at[0], hbm.at[b, pl.ds(0, tile), :],
                                  wsems.at[wi]).wait()

    @pl.when(cur)
    def _():
        for buf, si in ((bigbuf, 0), (auxbuf, 1)):
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, si]).wait()
        _bwd_body(bigbuf.at[slot], auxbuf.at[slot],
                  dqb.at[slot], dkb.at[slot], dvb.at[slot], L_ref[b, j],
                  tile=tile, nheads=nheads, head_dim=head_dim)

        @pl.when(flag[0] == 1)
        def _():
            wwait()

        S = pl.multiple_of(S_ref[b, j], 8)
        for buf, hbm, wi in ((dqb, dq_hbm, 0), (dkb, dk_hbm, 1),
                             (dvb, dv_hbm, 2)):
            pltpu.make_async_copy(buf.at[slot], hbm.at[b, pl.ds(S, tile), :],
                                  wsems.at[wi]).start()
        flag[0] = 1

    @pl.when((l == pl.num_programs(0) * NB - 1) & (flag[0] == 1))
    def _():
        wwait()


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _streams(q, k, v, rel, tile, extra=()):
    """One channel-concatenated padded stream (ONE data DMA per grid
    step) + the 128-lane aux."""
    B, V = q.shape[:2]
    parts = [x.reshape(B, V, -1) for x in (q, k, v) + tuple(extra)]
    big = jnp.pad(jnp.concatenate(parts, axis=-1),
                  ((0, 0), (0, tile), (0, 0)))
    aux = jnp.pad(rel.astype(jnp.bfloat16),
                  ((0, 0), (0, tile), (0, _AUX_LANES - rel.shape[-1])))
    return big, aux


def _bin_forward(q, k, v, rel, bin_start, bin_len, n_bins, tile,
                 interpret=False):
    B, V, H, D = q.shape
    C = H * D
    big, aux = _streams(q, k, v, rel, tile)
    NB = bin_start.shape[1]
    kern = functools.partial(_fwd_kernel, tile=tile, nheads=H, head_dim=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, tile, 3 * C), q.dtype),
            pltpu.VMEM((2, tile, _AUX_LANES), jnp.bfloat16),
            pltpu.VMEM((2, tile, C), v.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, V + tile, C), v.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bin_start, bin_len, n_bins, big, aux)
    valid = (rel[:, :, 0] + rel[:, :, 1]) > 0
    out = jnp.where(valid[:, :, None], out[:, :V], 0)
    return out.reshape(B, V, H, D)


def _bin_backward(q, k, v, rel, bin_start, bin_len, n_bins, out, g, tile,
                  interpret=False):
    B, V, H, D = q.shape
    C = H * D
    big, aux = _streams(q, k, v, rel, tile, extra=(g, out))
    NB = bin_start.shape[1]
    kern = functools.partial(_bwd_kernel, tile=tile, nheads=H, head_dim=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 3),
        scratch_shapes=[
            pltpu.VMEM((2, tile, 5 * C), q.dtype),
            pltpu.VMEM((2, tile, _AUX_LANES), jnp.bfloat16),
            pltpu.VMEM((2, tile, C), q.dtype),
            pltpu.VMEM((2, tile, C), k.dtype),
            pltpu.VMEM((2, tile, C), v.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, V + tile, C), x.dtype)
            for x in (q, k, v)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bin_start, bin_len, n_bins, big, aux)
    valid = ((rel[:, :, 0] + rel[:, :, 1]) > 0)[:, :, None]
    shape = (B, V, H, D)
    return tuple(jnp.where(valid, x[:, :V], 0).reshape(shape)
                 for x in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def bin_attention(q, k, v, rel, bin_start, bin_len, n_bins,
                  tile: int = DEFAULT_TILE, interpret: bool = False):
    """Exact windowed attention over bin-packed window-sorted tokens.

    Args:
      q, k, v:   [B, V, H, D] window-sorted tokens.
      rel:       int32 [B, V, 2] per-row window-range deltas from the
                 row's in-bin offset (``ops.windows.bin_pack_batch``);
                 invalid rows [0, 0).
      bin_start: int32 [B, NB] stream row of each bin (sentinel V).
      bin_len:   int32 [B, NB] rows owned by each bin.
      n_bins:    int32 [B].
    Returns [B, V, H, D]; invalid rows are 0.
    """
    return _bin_forward(q, k, v, rel, bin_start, bin_len, n_bins, tile,
                        interpret)


def _fwd(q, k, v, rel, bin_start, bin_len, n_bins, tile, interpret):
    out = _bin_forward(q, k, v, rel, bin_start, bin_len, n_bins, tile,
                       interpret)
    return out, (q, k, v, rel, bin_start, bin_len, n_bins, out)


def _bwd(tile, interpret, res, g):
    q, k, v, rel, bin_start, bin_len, n_bins, out = res
    dq, dk, dv = _bin_backward(q, k, v, rel, bin_start, bin_len, n_bins,
                               out, g, tile, interpret)
    return dq, dk, dv, None, None, None, None


bin_attention.defvjp(_fwd, _bwd)
