"""Fused band window attention, forward AND backward (Pallas TPU kernels).

Drop-in replacement for ``ops.attention.band_attention``: same math (exact
windowed attention over window-sorted tokens, see ``ops/windows.py``), but
the [tile, band] score/weight matrices live in VMEM scratch instead of HBM.
The XLA einsum path materializes the banded K/V copies AND the weight
tensor per layer (hundreds of MB per pass at 20k tokens); these kernels
stream bands straight from HBM with async DMA and never write the weights
anywhere.

Band geometry: tokens of one window are contiguous in the sorted order and
a window holds <= 144 tokens, so two same-window tokens are always within
143 positions of each other — a band of ``pad`` >= 144 on each side of a
query tile provably covers every same-window key.  ``pad`` is independent
of the tile size (the einsum path rounds it up to whole tiles; here the
band width ``tile + 2*pad`` only needs 128-lane alignment for the aux DMA
slices), which cuts the pair-work per call from ``V * (128 + 2*256)`` to
``V * (128 + 2*192)`` — 20% less at tile=128.

LAYOUT RULE (the perf-critical part): every per-ROW vector is kept in the
orientation its consumer needs — query-side vectors (query window ids,
softmax stats m/l/D) ride the SUBLANE axis ([V, k] arrays, block
(tile, k)), key-side vectors (band window ids, key validity) ride the
LANE axis ([2, Vp] arrays).  A vector born in the wrong orientation costs
a sublane<->lane relayout PER GRID STEP, which measured ~31 us — the
same pathology fixed in ops/pallas_segreduce.py.

Forward, per grid step (b, i): DMA the padded K/V band and a float32 aux
band (window id + key-validity channels; ids < 2^24 are exact in f32,
which sidesteps Mosaic's int32 slice-tiling limits) for positions
``[i*tile - pad, i*tile + tile + pad)`` into VMEM, compute per-head
``softmax(q K^T / sqrt(d) + mask) V`` with the same -1e9 masking and
empty-row -> 0 semantics as the einsum path, and write the [tile, C]
output block plus the per-row softmax stats (running max m, normalizer l)
needed by the backward.

Backward is the flash-attention split (the reference's torch autodiff
equivalent lives under ``nn.MultiheadAttention``,
``/root/reference/mmdet3d/models/sst/sst_basic_block.py:36-59``):

  D_i  = sum_d dO_id O_id                       (tiny elementwise, XLA)
  p_ij = exp(s_ij - m_i) / max(l_i, eps)        (recomputed in VMEM)
  dV_j = sum_i p_ij dO_i
  dS_ij = p_ij (dO_i . v_j - D_i)
  dQ_i = scale * sum_j dS_ij k_j                (dq kernel: query tiles)
  dK_j = scale * sum_i dS_ij q_i                (dkv kernel: key tiles)

The band structure is symmetric (same-window pairs are within ±pad sorted
positions of each other), so the dkv kernel iterates KEY tiles and DMAs
the same-shaped band of Q/dO/stats around them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 128
DEFAULT_PAD = 192        # min pad >= 144 with width 128-aligned (pad = 0 mod 64)
_PAD_WIN = -1.0
_NEG = -1e9
_EPS = 1e-20


def _band_inputs(q, k, v, win_id, key_valid, pad):
    """Flatten heads and build padded K/V + key-side aux [B, 2, Vp]."""
    B, V, H, D = q.shape
    C = H * D
    qf = q.reshape(B, V, C)
    kf = jnp.pad(k.reshape(B, V, C), ((0, 0), (pad, pad), (0, 0)))
    vf = jnp.pad(v.reshape(B, V, C), ((0, 0), (pad, pad), (0, 0)))
    # window ids as exact small floats; sorted-table padding (INT32_MAX)
    # exceeds 2^24, so clamp it to a sentinel that never matches a real id
    win_f = jnp.where(win_id >= 2 ** 24, 2.0 ** 25,
                      win_id.astype(jnp.float32))
    aux = jnp.stack([
        jnp.pad(win_f, ((0, 0), (pad, pad)), constant_values=_PAD_WIN),
        jnp.pad(key_valid.astype(jnp.float32), ((0, 0), (pad, pad))),
    ], axis=1)                                      # [B, 2, Vp] lane-major
    return qf, kf, vf, aux, win_f


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(nv_ref, q_ref, winq_ref, k_hbm, v_hbm, aux_hbm, out_ref,
                stats_ref, kbuf, vbuf, auxbuf, sems, *, tile, width, nheads,
                head_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    def issue(bb, ss, sl):
        pltpu.make_async_copy(
            k_hbm.at[bb, pl.ds(ss, width), :], kbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            v_hbm.at[bb, pl.ds(ss, width), :], vbuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(bb, 1), :, pl.ds(ss, width)], auxbuf.at[sl],
            sems.at[sl, 2]).start()

    # double-buffered band prefetch: serialized issue->wait->compute left
    # the DMA latency exposed on every grid step; here step l prefetches
    # step l+1's bands into the other buffer slot before waiting its own
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
        _fwd_body(q_ref, winq_ref, out_ref, stats_ref, kbuf.at[slot],
                  vbuf.at[slot], auxbuf.at[slot], sems.at[slot],
                  tile=tile, width=width, nheads=nheads, head_dim=head_dim)


def _fwd_body(q_ref, winq_ref, out_ref, stats_ref, kbuf, vbuf, auxbuf,
              sems, *, tile, width, nheads, head_dim):
    pltpu.make_async_copy(kbuf, kbuf, sems.at[0]).wait()
    pltpu.make_async_copy(vbuf, vbuf, sems.at[1]).wait()
    pltpu.make_async_copy(auxbuf, auxbuf, sems.at[2]).wait()

    q = q_ref[0]                                   # [tile, C]
    wink = auxbuf[0, 0:1, :]                       # [1, width] lane-major
    kvk = auxbuf[0, 1:2, :]                        # [1, width]
    winq = winq_ref[0, :, 0:1]                     # [tile, 1] sublane-major
    mask = (winq == wink) & (kvk > 0.5)            # [tile, width], natural
    # additive bias replaces a per-head where on the scores; masked
    # entries reach exp(-1e9 - m) == 0 exactly, and a fully-masked row
    # gets m == -1e9 so its e == exp(0) spikes — zeroed via the l == 0
    # detection below (bias rows full of _NEG make l == width there, so
    # track emptiness from the mask itself once)
    bias = jnp.where(mask, 0.0, _NEG)
    nonempty = jnp.max(bias, axis=-1, keepdims=True) > -1.0  # [tile, 1]
    ones = jnp.ones((width, 1), jnp.float32)

    scale = 1.0 / (head_dim ** 0.5)
    for h in range(nheads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], kbuf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)                          # exact 0 at masked
        # row-sum on the MXU instead of a lane reduction
        l = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l = jnp.where(nonempty, l, 0.0)
        o = jax.lax.dot_general(
            e.astype(vbuf.dtype), vbuf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.where(nonempty, o / jnp.maximum(l, _EPS), 0.0)
        out_ref[0, :, sl] = o.astype(out_ref.dtype)
        stats_ref[0, :, h:h + 1] = m                # [tile, 1] sublane write
        stats_ref[0, :, nheads + h:nheads + h + 1] = l


def _pallas_forward(q, k, v, win_id, key_valid, tile, pad,
                    interpret=False):
    B, V, H, D = q.shape
    C = H * D
    nt = V // tile
    width = tile + 2 * pad
    if not interpret:   # Mosaic: lane-dim DMA slices must be 128-aligned
        assert width % 128 == 0, (tile, pad)
    qf, kf, vf, aux, win_f = _band_inputs(q, k, v, win_id, key_valid, pad)

    nv = jnp.max(jnp.where(win_f < 2.0 ** 24,
                       jnp.arange(win_f.shape[1], dtype=jnp.int32)
                       + 1, 0), axis=1).astype(jnp.int32)
    # EXTENT (last real slot + 1), not a count: the tile-packed
    # layout intersperses bucket-slack holes, so a count would
    # skip real trailing tiles; for the compact band layout the
    # two coincide   # [B]
    kern = functools.partial(_fwd_kernel, tile=tile, width=width, nheads=H,
                             head_dim=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2 * H), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), k.dtype),
            pltpu.VMEM((2, width, C), v.dtype),
            pltpu.VMEM((2, 1, 2, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, V, C), v.dtype),
            jax.ShapeDtypeStruct((B, V, 2 * H), jnp.float32),
        ),
        interpret=interpret,
    )(nv, qf, win_f[:, :, None], kf, vf, aux)
    return out.reshape(B, V, H, D), stats


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(nv_ref, q_ref, do_ref, st_ref, winq_ref, k_hbm, aux_hbm,
               dq_ref, kbuf, auxbuf, sems, *, tile, width, nheads,
               head_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    def issue(bb, ss, sl):
        pltpu.make_async_copy(
            k_hbm.at[bb, pl.ds(ss, width), :], kbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(bb, 1), :, pl.ds(ss, width)], auxbuf.at[sl],
            sems.at[sl, 1]).start()

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
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(cur_valid)
    def _():
        _dq_body(q_ref, do_ref, st_ref, winq_ref, dq_ref, kbuf.at[slot],
                 auxbuf.at[slot], sems.at[slot], tile=tile, width=width,
                 nheads=nheads, head_dim=head_dim)


def _dq_body(q_ref, do_ref, st_ref, winq_ref, dq_ref, kbuf, auxbuf, sems,
             *, tile, width, nheads, head_dim):
    pltpu.make_async_copy(kbuf, kbuf, sems.at[0]).wait()
    pltpu.make_async_copy(auxbuf, auxbuf, sems.at[1]).wait()

    q = q_ref[0]
    do = do_ref[0]
    wink = auxbuf[0, 0:1, :]
    kvk = auxbuf[0, 1:2, :]
    winq = winq_ref[0, :, 0:1]
    mask = (winq == wink) & (kvk > 0.5)
    bias = jnp.where(mask, 0.0, _NEG)

    scale = 1.0 / (head_dim ** 0.5)
    for h in range(nheads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        m = st_ref[0, :, h:h + 1]                          # [tile, 1]
        lrow = st_ref[0, :, nheads + h:nheads + h + 1]
        # empty rows stored l == 0; with the bias construction their
        # p would be exp(0)/EPS — zero inv_l kills them exactly
        inv_l = jnp.where(lrow > 0, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
        dvo = st_ref[0, :, 2 * nheads + h:2 * nheads + h + 1]
        s = jax.lax.dot_general(
            q[:, sl], kbuf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = jnp.exp(s - m) * inv_l                         # [tile, width]
        # dP_ij = dO_i . v_j — the V band rides in the same buffer as K:
        # kbuf holds [K ; V] stacked on channels (see _pallas_backward)
        vsl = slice(nheads * head_dim + sl.start, nheads * head_dim + sl.stop)
        dp = jax.lax.dot_general(
            do[:, sl], kbuf[:, vsl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dvo)                                # [tile, width]
        dq = jax.lax.dot_general(
            ds.astype(kbuf.dtype), kbuf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _dkv_kernel(nv_ref, k_ref, v_ref, aux_t_ref, q_hbm, do_hbm, qs_hbm,
                dk_ref, dv_ref, qbuf, dobuf, qsbuf, sems, *,
                tile, width, nheads, head_dim):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    start = i * tile
    l = b * nt + i
    slot = jax.lax.rem(l, 2)
    cur_valid = start < nv_ref[b]

    def issue(bb, ss, sl):
        pltpu.make_async_copy(
            q_hbm.at[bb, pl.ds(ss, width), :], qbuf.at[sl],
            sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            do_hbm.at[bb, pl.ds(ss, width), :], dobuf.at[sl],
            sems.at[sl, 1]).start()
        pltpu.make_async_copy(
            qs_hbm.at[pl.ds(bb, 1), :, pl.ds(ss, width)], qsbuf.at[sl],
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
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(cur_valid)
    def _():
        _dkv_body(k_ref, v_ref, aux_t_ref, dk_ref, dv_ref, qbuf.at[slot],
                  dobuf.at[slot], qsbuf.at[slot], sems.at[slot],
                  tile=tile, width=width, nheads=nheads, head_dim=head_dim)


def _dkv_body(k_ref, v_ref, aux_t_ref, dk_ref, dv_ref, qbuf, dobuf, qsbuf,
              sems, *, tile, width, nheads, head_dim):
    pltpu.make_async_copy(qbuf, qbuf, sems.at[0]).wait()
    pltpu.make_async_copy(dobuf, dobuf, sems.at[1]).wait()
    pltpu.make_async_copy(qsbuf, qsbuf, sems.at[2]).wait()

    kt = k_ref[0]                                  # [tile, C] key tile
    vt = v_ref[0]
    # TRANSPOSED score orientation: keys (tile) on SUBLANES, queries
    # (band) on LANES.  The previous orientation ([width, tile] scores)
    # made dv/dk contract over the sublane axis, which Mosaic lowers by
    # transposing the [width, tile] f32 score matrix per head per grid
    # step — 16 relayouts/step that made the dkv kernel ~2x the cost of
    # dq.  Here every dot is a lane contraction or a standard A@B.
    win_t = aux_t_ref[0, :, 0:1]                   # [tile, 1] sublane
    kv_t = aux_t_ref[0, :, 1:2]                    # [tile, 1]
    winq = qsbuf[0, 3 * nheads:3 * nheads + 1, :]  # [1, width] lane-major
    # pair mask (key j in tile, query i in band): win_j == win_i & kv_j
    mask = (win_t == winq) & (kv_t > 0.5)          # [tile, width]
    bias = jnp.where(mask, 0.0, _NEG)

    scale = 1.0 / (head_dim ** 0.5)
    for h in range(nheads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        m = qsbuf[0, h:h + 1, :]                           # [1, width]
        lrow = qsbuf[0, nheads + h:nheads + h + 1, :]
        inv_l = jnp.where(lrow > 0, 1.0 / jnp.maximum(lrow, _EPS), 0.0)
        dvo = qsbuf[0, 2 * nheads + h:2 * nheads + h + 1, :]
        # s_ji for keys j (tile) x queries i (band)
        s = jax.lax.dot_general(
            kt[:, sl], qbuf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = jnp.exp(s - m) * inv_l                         # [tile, width]
        dv = jax.lax.dot_general(
            p.astype(dobuf.dtype), dobuf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, Dh]
        dp = jax.lax.dot_general(
            vt[:, sl], dobuf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, width]
        ds = p * (dp - dvo)
        dk = jax.lax.dot_general(
            ds.astype(qbuf.dtype), qbuf[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [tile, Dh]
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _pallas_backward(q, k, v, win_id, key_valid, out, stats, g,
                     tile, pad, interpret=False):
    B, V, H, D = q.shape
    C = H * D
    nt = V // tile
    width = tile + 2 * pad

    qf, kf, vf, aux, win_f = _band_inputs(q, k, v, win_id, key_valid, pad)
    gf = g.reshape(B, V, C)
    # D_i = sum_d dO_id O_id per head — bf16 inputs contract straight to
    # f32 (casting first would materialize two full f32 copies)
    dvo = jnp.einsum("bvhd,bvhd->bvh", g, out,
                     preferred_element_type=jnp.float32)
    stats3 = jnp.concatenate([stats, dvo], axis=-1)        # [B, V, 3H]

    # ---- dq over query tiles ----------------------------------------------
    # the dq kernel needs both K and V bands; stack them on channels so one
    # DMA streams both ([B, Vp, 2C])
    kv_band = jnp.concatenate([kf, vf], axis=-1)
    dq_kern = functools.partial(_dq_kernel, tile=tile, width=width,
                                nheads=H, head_dim=D)
    nv = jnp.max(jnp.where(win_f < 2.0 ** 24,
                       jnp.arange(win_f.shape[1], dtype=jnp.int32)
                       + 1, 0), axis=1).astype(jnp.int32)
    # EXTENT (last real slot + 1), not a count: the tile-packed
    # layout intersperses bucket-slack holes, so a count would
    # skip real trailing tiles; for the compact band layout the
    # two coincide
    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3 * H), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, width, 2 * C), k.dtype),
            pltpu.VMEM((2, 1, 2, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    dq = pl.pallas_call(
        dq_kern,
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct((B, V, C), q.dtype),
        interpret=interpret,
    )(nv, qf, gf, stats3, win_f[:, :, None], kv_band, aux)

    # ---- dk/dv over key tiles ----------------------------------------------
    # query-side per-row data (3H softmax stats + the query window id)
    # packed into ONE LANE-major [B, 32, Vp] f32 band: the transposed
    # kernel reads each stat as a [1, width] lane vector, and the DMA
    # moves 32 sublanes instead of a 128-lane padded row (4x less
    # traffic).  The key tile's aux (win id, validity) rides sublane-major
    # [B, V, 2] so the [tile, width] mask builds without relayouts.
    qp = jnp.pad(qf, ((0, 0), (pad, pad), (0, 0)))
    gp = jnp.pad(gf, ((0, 0), (pad, pad), (0, 0)))
    st_t = jnp.pad(jnp.moveaxis(stats3, 1, 2), ((0, 0), (0, 0), (pad, pad)))
    winq_row = jnp.pad(win_f, ((0, 0), (pad, pad)),
                       constant_values=_PAD_WIN)[:, None, :]
    qs = jnp.concatenate([st_t, winq_row], axis=1)         # [B, 3H+1, Vp]
    qs = jnp.pad(qs, ((0, 0), (0, 32 - qs.shape[1]), (0, 0)))
    aux_t = jnp.stack([win_f, key_valid.astype(jnp.float32)], axis=-1)
    dkv_kern = functools.partial(_dkv_kernel, tile=tile, width=width,
                                 nheads=H, head_dim=D)
    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, width, C), q.dtype),
            pltpu.VMEM((2, width, C), g.dtype if hasattr(g, "dtype")
                       else jnp.float32),
            pltpu.VMEM((2, 1, 32, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kern,
        grid_spec=dkv_grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, V, C), k.dtype),
            jax.ShapeDtypeStruct((B, V, C), v.dtype),
        ),
        interpret=interpret,
    )(nv, k.reshape(B, V, C), v.reshape(B, V, C), aux_t, qp, gp, qs)

    shape = (B, V, H, D)
    return (dq.reshape(shape), dk.reshape(shape), dv.reshape(shape))


# ---------------------------------------------------------------------------
# custom-vjp entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def band_attention_pallas(q, k, v, win_id, key_valid,
                          tile: int = DEFAULT_TILE,
                          pad: int = DEFAULT_PAD,
                          interpret: bool = False):
    """Pallas-fused exact windowed attention (see module docstring)."""
    out, _ = _pallas_forward(q, k, v, win_id, key_valid, tile, pad,
                             interpret)
    return out


def _fwd(q, k, v, win_id, key_valid, tile, pad, interpret):
    out, stats = _pallas_forward(q, k, v, win_id, key_valid, tile, pad,
                                 interpret)
    return out, (q, k, v, win_id, key_valid, out, stats)


def _bwd(tile, pad, interpret, res, g):
    q, k, v, win_id, key_valid, out, stats = res
    dq, dk, dv = _pallas_backward(q, k, v, win_id, key_valid, out, stats,
                                  g, tile, pad, interpret)
    return dq, dk, dv, None, None


band_attention_pallas.defvjp(_fwd, _bwd)
