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
      perm:     int32 [V] — ``perm[s]`` = table row at sorted position s.
      inv_perm: int32 [V] — sorted position of each table row.
      win_id:   int32 [V] — window id at each *sorted* position (invalid
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
    wins, ciws = [], []
    for shift in sst.shifts:
        w, c = jax.vmap(lambda cc, mm, s=shift: window_ids(
            cc, mm, s, sst, voxel))(coords, valid)
        wins.append(w)
        ciws.append(c)
    win_all = jnp.stack(wins)                       # [S, B, V]
    perm_all = jnp.argsort(win_all, axis=-1, stable=True).astype(jnp.int32)
    inv_all = jnp.argsort(perm_all, axis=-1).astype(jnp.int32)
    win_sorted = jnp.take_along_axis(win_all, perm_all, axis=-1)
    return tuple(
        WindowLayout(perm=perm_all[s], inv_perm=inv_all[s],
                     win_id=win_sorted[s], coors_in_win=ciws[s])
        for s in range(len(sst.shifts)))


# ---------------------------------------------------------------------------
# bin packing: cut the window-sorted stream into <=BIN_TILE-row bins
# ---------------------------------------------------------------------------

BIN_TILE = 512


def win_grid_cap(sst: SSTConfig, voxel: VoxelConfig) -> int:
    """Static upper bound on the number of windows in one sample/shift."""
    win_x, win_y = sst.window_shape
    ny, nx = voxel.grid_size
    return (math.ceil(nx / win_x) + 1) * (math.ceil(ny / win_y) + 1)


def bin_cap(v_cap: int, sst: SSTConfig, tile: int = BIN_TILE) -> int:
    """Static bin-count bound: next-fit opens a new bin only when the
    previous holds > tile - max_window tokens."""
    win_x, win_y = sst.window_shape
    min_fill = tile - win_x * win_y + 1
    return v_cap // max(min_fill, 1) + 2


def padded_cap(v_cap: int, sst: SSTConfig, tile: int = BIN_TILE) -> int:
    """Static padded-stream size: every bin's end rounds up to a multiple
    of 8 rows (Mosaic DMA sublane alignment), costing <= 7 rows per bin."""
    return v_cap + 8 * bin_cap(v_cap, sst, tile)


def bin_pack(win_sorted: jnp.ndarray, w_cap: int, nb_cap: int, vp: int,
             tile: int = BIN_TILE):
    """Next-fit pack whole windows into <= ``tile``-row bins, laid out in
    a PADDED stream whose bins all start at multiples of 8 (one sample).

    The stream is already window-sorted (``make_layout``); packing
    chooses cut points between windows and rounds each bin's length up to
    a multiple of 8 (Mosaic DMA sublane alignment; <= 7 dead rows per
    bin, <= 6.2% inflation since bins hold >= tile - 143 rows).  Every
    window lies entirely inside exactly one bin (window size <=
    win_x*win_y <= tile), so per-bin attention is exact and drop-free.

    Args:
      win_sorted: int32 [V] ascending window ids, INT32_MAX suffix.
      w_cap / nb_cap / vp: static caps (``win_grid_cap`` / ``bin_cap`` /
                ``padded_cap``).
    Returns:
      to_pos:    int32 [V] — padded position of each sorted row
                 (INT32_MAX for invalid rows).
      to_sorted: int32 [vp] — sorted row at each padded position
                 (INT32_MAX at pad rows / tail).
      rel:       int32 [vp, 2] — the window's row range as DELTAS from
                 the row's own in-bin offset ``o``: the range is
                 ``[o - rel[0], o + rel[1])``.  Deltas are <= window size
                 (144) so they stay exact through a bfloat16 carrier
                 (absolute offsets up to the 512-row tile would round);
                 pads/tail: [0, 0) (an empty range).
      bin_start: int32 [nb_cap] — padded start of each bin (every value
                 a multiple of 8; 0 beyond ``n_bins``).
      bin_len:   int32 [nb_cap] — padded bin length (multiple of 8,
                 <= tile; 0 beyond ``n_bins``).
      n_bins:    int32 [].
    """
    from . import scatter

    V = win_sorted.shape[0]
    valid = win_sorted != INT32_MAX
    first = valid & jnp.concatenate(
        [jnp.ones((1,), bool), win_sorted[1:] != win_sorted[:-1]])
    widx = jnp.cumsum(first.astype(jnp.int32)) - 1
    widx = jnp.where(valid, widx, w_cap)
    sizes = scatter.segment_sum(
        valid.astype(jnp.float32)[:, None], widx, w_cap,
        sorted_ids=True).astype(jnp.int32)[:, 0]            # [w_cap]

    # next-fit over windows: the only sequential step, O(w_cap) scalar ops
    def step(fill, s):
        nb = (fill + s > tile) & (s > 0)
        fill2 = jnp.where(nb, s, fill + s)
        return fill2, nb

    _, newbin = jax.lax.scan(step, jnp.int32(tile + 1), sizes, unroll=16)
    binw = jnp.cumsum(newbin.astype(jnp.int32)) - 1          # bin per window
    startw = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])
    idx = jnp.arange(nb_cap)
    ohb = (binw[:, None] == idx[None, :]) & newbin[:, None]
    s_unp = jnp.sum(jnp.where(ohb, startw[:, None], 0),
                    axis=0).astype(jnp.int32)                # sorted starts
    n_bins = jnp.sum(newbin).astype(jnp.int32)
    nv = jnp.sum(valid).astype(jnp.int32)
    nxt = jnp.where(idx < n_bins - 1,
                    jnp.concatenate([s_unp[1:], s_unp[-1:]]), nv)
    lb = jnp.where(idx < n_bins, nxt - s_unp, 0)             # real rows
    lp = ((lb + 7) // 8) * 8                                 # padded rows
    s_pad = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(lp)[:-1]])           # mult of 8
    s_pad = jnp.where(idx < n_bins, s_pad, 0).astype(jnp.int32)

    # per-row padded position: shift by the padding of earlier bins
    s_cmp = jnp.where(idx < n_bins, s_unp, INT32_MAX)
    rows = jnp.arange(V, dtype=jnp.int32)
    bin_r = jnp.sum(rows[:, None] >= s_cmp[None, :], axis=1) - 1
    bin_r = jnp.clip(bin_r, 0, nb_cap - 1)
    to_pos = jnp.where(valid,
                       rows + jnp.take(s_pad - s_unp, bin_r), INT32_MAX)

    # inverse map + per-position window range
    sp_cmp = jnp.where(idx < n_bins,
                       jnp.cumsum(jnp.concatenate(
                           [jnp.zeros((1,), jnp.int32), lp[:-1]])),
                       INT32_MAX)
    ppos = jnp.arange(vp, dtype=jnp.int32)
    bin_p = jnp.sum(ppos[:, None] >= sp_cmp[None, :], axis=1) - 1
    ok_bin = bin_p >= 0
    bin_p = jnp.clip(bin_p, 0, nb_cap - 1)
    off = ppos - jnp.take(s_pad, bin_p)
    r_of_p = jnp.take(s_unp, bin_p) + off
    ok = ok_bin & (off < jnp.take(lb, bin_p))
    to_sorted = jnp.where(ok, r_of_p, INT32_MAX)

    relw = startw - jnp.take(s_unp, jnp.clip(binw, 0, nb_cap - 1))
    tbl = jnp.stack([relw, relw + sizes], axis=-1)           # [w_cap, 2]
    tbl = jnp.concatenate([tbl, jnp.zeros((1, 2), jnp.int32)], axis=0)
    rel_r = jnp.take(tbl, jnp.minimum(widx, w_cap), axis=0)  # [V, 2] abs
    rel_p = jnp.take(rel_r, jnp.clip(r_of_p, 0, V - 1), axis=0)
    deltas = jnp.stack([off - rel_p[:, 0], rel_p[:, 1] - off], axis=-1)
    rel = jnp.where(ok[:, None], deltas, 0)
    return to_pos, to_sorted, rel, s_pad, lp.astype(jnp.int32), n_bins


def bin_pack_batch(win_sorted: jnp.ndarray, sst: SSTConfig,
                   voxel: VoxelConfig, tile: int = BIN_TILE):
    """Batched :func:`bin_pack` ([B, V] -> per-sample padded layouts)."""
    V = win_sorted.shape[-1]
    w_cap = min(win_grid_cap(sst, voxel), V)
    nb_cap = bin_cap(V, sst, tile)
    vp = padded_cap(V, sst, tile)
    return jax.vmap(lambda w: bin_pack(w, w_cap, nb_cap, vp, tile))(
        win_sorted)


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
