"""Static shifted-window layout engine.

TPU-native re-expression of SST's window machinery
(``/root/reference/mmdet3d/ops/sst/sst_ops.py:272-388`` —
``get_window_coors`` / ``get_inner_win_inds`` / ``flat2window``) and the MAE
backbone's embedded copy
(``mmdet3d/models/backbones/multi_mae_sst_spearate_top_only.py:629-659``).

Instead of scattering tokens into per-drop-level ``[num_win, max_tokens, C]``
buffers, we *sort tokens by window id* once per shift.  Tokens of one window
are then contiguous, and windowed attention becomes **band attention**: each
query attends to a fixed ±W band of sorted positions masked by
``same-window``.  Because a 12x12 BEV window holds at most 144 distinct
pillars, a band of 144 each side always covers the full window — no token is
ever dropped, which exactly matches the shipped configs (drop-free by
construction; SURVEY.md §8.4, §8.13).

All outputs are static-shape [V] arrays per sample (vmap over batch).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SSTConfig, VoxelConfig

INT32_MAX = jnp.iinfo(jnp.int32).max


class WindowLayout(NamedTuple):
    """Per-shift sorted window layout (leading batch dim once vmapped).

    Attributes:
      perm:     int32 [S] — ``perm[s]`` = table row at sorted position s.
                S == V for the band layout; S == V_pack (2V) for the
                tile-packed layout, where hole slots hold INT32_MAX
                (gathers through :func:`geomae_tpu.ops.scatter.
                gather_injective` read 0 there).
      inv_perm: int32 [V] — sorted position of each table row (INT32_MAX
                for invalid rows in the packed layout).
      win_id:   int32 [S] — window id at each *sorted* position (invalid
                rows hold INT32_MAX so they sort last and match nothing).
      coors_in_win: int32 [V, 2] — (x, y) offsets inside the window, in
                *row* order (not sorted order), matching the reference's
                ``coors_in_win`` (backbone ``:655-657``).
    """

    perm: jnp.ndarray
    inv_perm: jnp.ndarray
    win_id: jnp.ndarray
    coors_in_win: jnp.ndarray


def window_ids(coords: jnp.ndarray, valid: jnp.ndarray,
               shift: Tuple[int, int], sst: SSTConfig, voxel: VoxelConfig):
    """Window id + in-window coords per pillar (one sample, one shift).

    Matches ``window_partition`` (backbone ``:629-659``): coordinates are
    shifted by ``win_shape - shift`` when shift > 0, window id hashes as
    ``wx * max_num_win_y + wy`` (x-major; the reference's batch term drops
    out because we are per-sample).
    """
    win_x, win_y = sst.window_shape
    ny, nx = voxel.grid_size
    shift_x, shift_y = shift
    max_num_win_y = int(math.ceil(ny / win_y)) + 1

    x = coords[:, 1] + (win_x - shift_x if shift_x > 0 else 0)
    y = coords[:, 0] + (win_y - shift_y if shift_y > 0 else 0)
    wx, wy = x // win_x, y // win_y
    win = wx * max_num_win_y + wy
    win = jnp.where(valid, win, INT32_MAX)
    coors_in_win = jnp.stack([x % win_x, y % win_y], axis=-1)  # (x, y)
    return win.astype(jnp.int32), coors_in_win.astype(jnp.int32)


def make_layout(coords: jnp.ndarray, valid: jnp.ndarray,
                shift: Tuple[int, int], sst: SSTConfig,
                voxel: VoxelConfig) -> WindowLayout:
    """Build the sorted band layout for one sample and one shift."""
    win, ciw = window_ids(coords, valid, shift, sst, voxel)
    perm = jnp.argsort(win, stable=True).astype(jnp.int32)
    # inverse of a permutation == argsort of it (scatter-free: XLA TPU
    # scatters cost ~50x a sort)
    inv_perm = jnp.argsort(perm).astype(jnp.int32)
    return WindowLayout(perm=perm, inv_perm=inv_perm, win_id=win[perm],
                        coors_in_win=ciw)


def make_layouts(coords: jnp.ndarray, valid: jnp.ndarray, sst: SSTConfig,
                 voxel: VoxelConfig) -> Tuple[WindowLayout, ...]:
    """All shifts, batched: coords [B, V, 2], valid [B, V].

    The shifts ride a stacked leading axis through ONE pair of batched
    argsorts ([S*B, V] instead of S separate [B, V] sort launches)."""
    if getattr(sst, "band_layout", "band") == "tilepack":
        return make_layouts_packed(coords, valid, sst, voxel)
    wins, ciws = [], []
    for shift in sst.shifts:
        w, c = jax.vmap(lambda cc, mm, s=shift: window_ids(
            cc, mm, s, sst, voxel))(coords, valid)
        wins.append(w)
        ciws.append(c)
    win_all = jnp.stack(wins)                       # [S, B, V]
    # sort_key_val emits the sorted ids as a sort output (no
    # take_along_axis gather); within-window tie order is free — the
    # attention mask only tests same-window membership
    iota = jnp.broadcast_to(
        jnp.arange(win_all.shape[-1], dtype=jnp.int32), win_all.shape)
    win_sorted, perm_all = jax.lax.sort_key_val(win_all, iota)
    inv_all = jnp.argsort(perm_all, axis=-1).astype(jnp.int32)
    return tuple(
        WindowLayout(perm=perm_all[s], inv_perm=inv_all[s],
                     win_id=win_sorted[s], coors_in_win=ciws[s])
        for s in range(len(sst.shifts)))



PACK_TILE = 256


def _pow2ceil(s: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= s (exact in f32 for s <= 2^24; s <= 256
    here).  0 stays 0."""
    b = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(s, 1).astype(jnp.float32))))
    return jnp.where(s > 0, b.astype(jnp.int32), 0)


def packed_layout(win: jnp.ndarray, ciw: jnp.ndarray,
                  v_pack: int) -> WindowLayout:
    """Tile-packed layout for one sample/shift: every window occupies one
    contiguous run that NEVER straddles a ``PACK_TILE`` boundary, so band
    attention runs with pad=0 (score width = tile instead of tile+2*192).

    Construction is pure sort+cumsum: window sizes round UP to powers of
    two and windows are ordered by bucket size descending.  Each window's
    offset is then a cumsum of larger-or-equal powers of two, hence a
    multiple of its own bucket — size-aligned placement cannot cross a
    256 boundary.  Total extent <= 2V (worst-case rounding), so
    ``v_pack = 2V`` is always sufficient and nothing is ever dropped
    (the reference's drop-free contract, SURVEY §8.4).  Hole slots carry
    INT32_MAX; real content is a prefix of ``extent = sum(buckets)``
    rows, so trailing tiles skip via the kernels' nv logic.
    """
    V = win.shape[0]
    pos = jnp.arange(V, dtype=jnp.int32)
    perm0 = jnp.argsort(win, stable=True).astype(jnp.int32)
    inv0 = jnp.argsort(perm0).astype(jnp.int32)
    win_s = win[perm0]
    valid_s = win_s != INT32_MAX
    first = jnp.concatenate(
        [valid_s[:1], win_s[1:] != win_s[:-1]]) & valid_s
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0))
    rank = pos - seg_start
    wrank = jnp.cumsum(first.astype(jnp.int32)) - 1        # window idx/token
    n_win = jnp.sum(first.astype(jnp.int32))

    last = jnp.concatenate([win_s[1:] != win_s[:-1],
                            jnp.ones((1,), bool)]) & valid_s
    # order-preserving compaction of per-window sizes: sort by
    # position-if-last carries sizes to the prefix in window order
    _, sizes = jax.lax.sort(
        (jnp.where(last, pos, INT32_MAX), rank + 1), num_keys=1)
    sizes = jnp.where(pos < n_win, sizes, 0)               # [V] window order
    buckets = _pow2ceil(sizes)

    ord2 = jnp.argsort(-buckets, stable=True).astype(jnp.int32)
    b_sorted = buckets[ord2]
    offs = jnp.cumsum(b_sorted) - b_sorted                 # exclusive
    woff = offs[jnp.argsort(ord2)]                         # window order

    d = jnp.where(valid_s,
                  woff[jnp.maximum(wrank, 0)] + rank, INT32_MAX)
    perm_packed = jnp.full((v_pack,), INT32_MAX, jnp.int32) \
        .at[d].set(perm0, mode="drop", unique_indices=True)
    inv_packed = jnp.where(win != INT32_MAX, d[inv0], INT32_MAX)
    win_packed = jnp.where(perm_packed != INT32_MAX,
                           win[jnp.minimum(perm_packed, V - 1)], INT32_MAX)
    return WindowLayout(perm=perm_packed, inv_perm=inv_packed,
                        win_id=win_packed, coors_in_win=ciw)


def make_layouts_packed(coords: jnp.ndarray, valid: jnp.ndarray,
                        sst: SSTConfig,
                        voxel: VoxelConfig) -> Tuple[WindowLayout, ...]:
    """Tile-packed layouts for all shifts, batched ([B, V] inputs)."""
    win_x, win_y = sst.window_shape
    if win_x * win_y > PACK_TILE:
        raise ValueError(
            f"tilepack packs windows into {PACK_TILE}-token tiles; window "
            f"shape {sst.window_shape} holds up to {win_x * win_y} tokens "
            f"— use band_layout='band' for windows larger than {PACK_TILE}")
    V = coords.shape[1]
    v_pack = 2 * V
    outs = []
    for shift in sst.shifts:
        w, c = jax.vmap(lambda cc, mm, s=shift: window_ids(
            cc, mm, s, sst, voxel))(coords, valid)
        outs.append(jax.vmap(lambda ww, cc: packed_layout(
            ww, cc, v_pack))(w, c))
    return tuple(outs)


def positional_embedding(coors_in_win: jnp.ndarray, sst: SSTConfig,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal in-window positional embedding.

    Bit-matches ``get_pos_embed`` (backbone ``:361-399``): offsets centered
    at the window middle, ``inv_freq = T^(2*(i//2)/pos_length)``, interleaved
    sin/cos per axis, x then y concatenated.  Added to q and k only.

    Args: coors_in_win [..., 2] (x, y).  Returns [..., d_model].
    """
    win_x, win_y = sst.window_shape
    x = coors_in_win[..., 0].astype(jnp.float32) - win_x / 2
    y = coors_in_win[..., 1].astype(jnp.float32) - win_y / 2
    if sst.normalize_pos:
        x = x / win_x * 2 * 3.1415
        y = y / win_y * 2 * 3.1415
    pos_length = sst.d_model // 2
    i = jnp.arange(pos_length, dtype=jnp.float32)
    inv_freq = sst.pos_temperature ** (2 * (i // 2) / pos_length)
    ex = x[..., None] / inv_freq
    ey = y[..., None] / inv_freq
    # interleave: the reference's torch.stack([e[:, ::2].sin(),
    # e[:, 1::2].cos()], -1).flatten(1) puts sin(e_j) at even j and
    # cos(e_j) at odd j — an ELEMENTWISE parity select (bit-identical
    # floats), with no strided lane slices / stack / reshape (each strided
    # slice lowers to a gather-style relayout on TPU)
    even = (jnp.arange(pos_length, dtype=jnp.int32) % 2) == 0

    def _mix(e):
        return jnp.where(even, jnp.sin(e), jnp.cos(e))
    return jnp.concatenate([_mix(ex), _mix(ey)], axis=-1).astype(dtype)
