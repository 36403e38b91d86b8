"""GeoMAE pretrainer: masked geometric target prediction.

TPU-native rebuild of ``MultiSubVoxelDynamicVoxelNetSSL``
(``/root/reference/mmdet3d/models/detectors/multi_sub_voxel_dynamic_voxelnet_ssl.py``)
+ ``MultiMAESSTSPChoose``
(``mmdet3d/models/backbones/multi_mae_sst_spearate_top_only.py``).

Key re-designs (semantics preserved, layout TPU-first):

* **Dense targets via one one-hot cumsum.** The reference materializes
  dense ``[V, 128, 3]`` sub-voxel centroid tables through three
  voxelize+unique+scatter passes (``..._ssl.py:674-722``).  On TPU every
  scatter lowers to a sort, so the tables are instead built from ONE
  segmented cumsum of a one-hot outer product over the canonical
  (pillar, slot)-sorted points; med/top sums are reshape-reductions of
  the low sums.  The loss is then pure elementwise arithmetic over the
  dense tables — its backward is elementwise (no gathers/sorts in the
  differentiated graph).
* The 3x3-neighborhood med-centroid aggregation for normals/curvature
  runs as a dense-BEV-grid stencil (scatter moment rows once, 9 shifted
  slices, gather back) instead of spconv's
  ``get_indice_pairs_implicit_gemm`` (``..._ssl.py:192-207``);
  per-voxel ``torch.svd`` becomes a closed-form symmetric 3x3 eigensolver
  (``ops/eig3``).
* Masked rows keep their table position: the decoder input is
  ``where(keep, encoder_out, mask_token)`` instead of appending masked rows
  after visible ones (backbone ``:239-280``) — equivalent because pretrain
  windows are drop-free.
* Targets are in (z, y, x) order like the reference (``..._ssl.py:185-187``).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import PretrainConfig
from ..ops import scatter
from ..ops.eig3 import normal_and_curvature
from ..ops.voxelize import Scene
from ..ops.windows import make_layouts
from .sst import SSTStack, SSTStackPair, prepare_shift_data
from .vfe import DynamicScatterVFE

INT32_MAX = jnp.iinfo(jnp.int32).max

# Profiling-only knob (tools/profile_bwd_bisect.py): trace-time choice of a
# stage whose output gets stop_gradient'ed, attributing backward time by
# variant deltas.  None (always, outside the profiler) is zero-cost.
_SG_STAGE: str | None = None

# Profiling-only knob (tools/profile_targets_r5.py): trace-time choice of a
# targets stage to SKIP (wrong outputs, variant-delta timing only).
_TGT_SKIP: str | None = None


def _sg(x, stage: str):
    if _SG_STAGE == stage:
        return jax.tree_util.tree_map(jax.lax.stop_gradient, x)
    return x


class GeoMAETargets(NamedTuple):
    """Dense geometric targets; (z, y, x) coordinate order.

    Sub-voxel tables are DENSE ``[B, V, S(, 3)]`` like the reference's
    (``..._ssl.py:674-722``) so the loss is pure elementwise arithmetic
    with a free backward — no gathers, no scatters, no sorts anywhere in
    the differentiated region.  ``low_*`` tables are in the canonical
    med-major ``slot_sort`` order; the reference's row-major ``slot_low``
    relabeling is folded into the low heads' weight columns
    (``_slot_sort_to_low``), so preds and targets line up elementwise.
    """

    low_occ: jnp.ndarray       # [B, V, S_low] bool
    low_tgt: jnp.ndarray       # [B, V, S_low, 3] normalized, 0 if empty
    med_occ: jnp.ndarray       # [B, V, S_med] bool
    med_tgt: jnp.ndarray       # [B, V, S_med, 3]
    centroid_top: jnp.ndarray  # [B, V, 3] normalized
    normal: jnp.ndarray        # [B, V, 3]
    curv: jnp.ndarray          # [B, V, 3] (unsupervised in shipped config)


def _normalize_sub(cent_zyx, pillar_coords, slot, ratio, voxel):
    """(c - (coor * size + origin)) / size per sub-voxel
    (``normalize_centroid_sub_voxel``, ``..._ssl.py:626-641``).

    Args (per point/segment): cent_zyx [N, 3] raw meters; pillar_coords
    [N, 2] (y, x); slot [N] in the reference row-major layout.
    """
    rz, ry, rx = ratio
    vx, vy, vz = voxel.voxel_size
    r = voxel.point_cloud_range
    sz = slot // (ry * rx)
    sy = (slot // rx) % ry
    sx = slot % rx
    coor = jnp.stack([sz.astype(jnp.float32),
                      (pillar_coords[:, 0] * ry + sy).astype(jnp.float32),
                      (pillar_coords[:, 1] * rx + sx).astype(jnp.float32)],
                     -1)
    size = jnp.array([vz / rz, vy / ry, vx / rx], jnp.float32)
    origin = jnp.array([r[2], r[1], r[0]], jnp.float32)
    return (cent_zyx - (coor * size + origin)) / size


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------


def _normalize_dense(raw, coords, slot_labels, ratio, voxel):
    """Dense-table centroid normalization: ``raw`` [V, S, 3] raw meters,
    ``coords`` [V, 2] pillar (y, x), ``slot_labels`` static int [S] in the
    reference row-major hash of ``ratio``."""
    v_cap, s = raw.shape[0], raw.shape[1]
    pc = jnp.broadcast_to(coords[:, None, :], (v_cap, s, 2)).reshape(-1, 2)
    sl = jnp.broadcast_to(jnp.asarray(slot_labels, jnp.int32)[None, :],
                          (v_cap, s)).reshape(-1)
    return _normalize_sub(raw.reshape(-1, 3), pc, sl, ratio,
                          voxel).reshape(v_cap, s, 3)


def _centered_vals4(scene: Scene, v_cap: int):
    """Batched (mu, vals4): per-sample-mean-centered (z, y, x, 1) rows,
    zeroed at invalid points.  Centering keeps running sums a bounded
    random walk (fp32 exactness of the counts is separate: 0/1 sums)."""
    p2v = scene.table.point2voxel
    valid = scene.valid & (p2v < v_cap)
    zyx = scene.points[..., :3][..., ::-1].astype(jnp.float32)
    nvalid = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    mu = jnp.sum(jnp.where(valid[..., None], zyx, 0), axis=-2) \
        / nvalid[..., None]
    vals4 = jnp.concatenate(
        [jnp.where(valid[..., None], zyx - mu[..., None, :], 0),
         valid[..., None].astype(jnp.float32)], -1)
    return mu, vals4


def _centered_vals4_t(scene: Scene, v_cap: int):
    """Channel-major twin of :func:`_centered_vals4`: (mu [B, 3],
    vals4_t [B, 4, P]) — point streams never materialize in the
    lane-padded [B, P, small-C] layout (537 MB at bench shapes)."""
    p2v = scene.table.point2voxel
    valid = (scene.valid & (p2v < v_cap))[:, None, :]          # [B, 1, P]
    zyx = jnp.swapaxes(scene.points, 1, 2)[:, :3][:, ::-1] \
        .astype(jnp.float32)                                   # [B, 3, P]
    nvalid = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
    mu = jnp.sum(jnp.where(valid, zyx, 0), axis=-1) / nvalid[:, None]
    vals4 = jnp.concatenate(
        [jnp.where(valid, zyx - mu[..., None], 0),
         valid.astype(jnp.float32)], axis=1)
    return mu, vals4


_SYM_PAIRS = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def _moment_feats(table, voxel, sums, mu):
    """Per-pillar 13-ch moment rows [count | S1 (3) | packed-sym S2 (6) |
    top centroid (3)] + BEV key — the dense-stencil inputs, factored out
    so the batched TPU path can build the dense grid OUTSIDE the
    per-sample vmap (Pallas expand kernel).  Duplicates a slice of
    :func:`compute_targets`'s centroid math; XLA CSEs the shared subgraph
    inside one jit.  S2 is symmetric, so 6 packed components replace the
    9 of a trailing [3, 3] (whose minor dims would tile to (8, 128) —
    114x physical padding)."""
    ny, nx = voxel.grid_size
    v_cap = table.valid.shape[0]
    s_med = voxel.num_slots_med
    fan = voxel.num_slots_low // s_med
    sums_med = sums.reshape(v_cap, s_med, fan, 4).sum(2)
    sums_top = sums_med.sum(1)
    occ_med = sums_med[..., 3] > 0.5
    raw_med = sums_med[..., :3] / jnp.maximum(sums_med[..., 3], 1.0)[
        ..., None] + mu
    occ_top = sums_top[..., 3] > 0.5
    top_raw = sums_top[..., :3] / jnp.maximum(sums_top[..., 3], 1.0)[
        ..., None] + mu
    top_raw = jnp.where(occ_top[:, None], top_raw, 0.0)
    med_table = jnp.where(occ_med[..., None], raw_med, 0.0)
    of = occ_med.astype(jnp.float32)
    mt = med_table - top_raw[:, None, :]
    cm = jnp.sum(of, axis=1)
    S1 = jnp.einsum("vs,vsi->vi", of, mt)
    S2 = jnp.stack([jnp.einsum("vs,vs,vs->v", of, mt[..., i], mt[..., j])
                    for i, j in _SYM_PAIRS], axis=-1)       # [V, 6]
    feats = jnp.concatenate([cm[:, None], S1, S2, top_raw], axis=-1)
    key = jnp.where(table.valid,
                    table.coords[:, 0] * nx + table.coords[:, 1],
                    ny * nx)
    return feats, key


def _stencil_dense(feats: jnp.ndarray, key: jnp.ndarray, ny: int,
                   nx: int) -> jnp.ndarray:
    """Dense BEV moment grid ``[ny*nx + 1, 13]`` from per-pillar rows
    (``key`` ascending unique; sentinel ny*nx for invalid rows).
    Non-TPU fallback; the batched TPU path uses the Pallas expand
    kernel (XLA's scatter-set lowering serializes the updates)."""
    return jnp.zeros((ny * nx + 1, feats.shape[-1]), jnp.float32) \
        .at[key].set(feats, mode="drop", unique_indices=True,
                     indices_are_sorted=True)


def _stencil_covs(dense: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """9-tap neighborhood covariance over the dense moment grid.

    Packed-sym output ``[ny, nx, 6]`` (00, 11, 22, 01, 02, 12): every
    intermediate is a channel vector over the BEV plane — a trailing
    [3, 3] would tile its minor dims to (8, 128) and physically occupy
    114x the logical bytes (the round-4 lane-padding lesson)."""
    grid = dense[:-1].reshape(ny, nx, 13)
    gp = jnp.pad(grid, ((1, 1), (1, 1), (0, 0)))
    tg = grid[..., 10:13]                          # receiving cell's t
    acc = [jnp.zeros((ny, nx), jnp.float32) for _ in range(6)]
    for dy in range(3):
        for dx in range(3):
            nb = jax.lax.slice(gp, (dy, dx, 0), (dy + ny, dx + nx, 13))
            Cn = nb[..., 0]
            S1n = nb[..., 1:4]
            S2n = nb[..., 4:10]                    # packed sym
            # empty neighbor cells have Cn = S1n = S2n = 0 and tn = 0, so
            # every term vanishes regardless of d
            d = nb[..., 10:13] - tg
            for k, (i, j) in enumerate(_SYM_PAIRS):
                acc[k] = (acc[k] + S2n[..., k]
                          + S1n[..., i] * d[..., j]
                          + d[..., i] * S1n[..., j]
                          + Cn * d[..., i] * d[..., j])
    return jnp.stack(acc, axis=-1)


def compute_targets(scene: Scene, cfg: PretrainConfig,
                    sums=None, mu=None, dense=None) -> GeoMAETargets:
    """Pure target computation for one sample (vmap over batch).

    The dense per-(pillar, slot) sums come from ONE segmented reduction of
    a one-hot outer product ``one_hot(slot)[:, :, None] * (zyx, 1)[:,
    None]`` over pillar segments (no sort, no scatter; the reference
    builds the same tables via three voxelize+unique+scatter passes,
    ``..._ssl.py:674-722``).  On TPU the batch wrapper passes ``sums``
    from the fused Pallas kernel (``ops.pallas_segreduce.slot_outer_
    segment_sum_pallas``) which never materializes the [P, S*4] product;
    elsewhere the product is built here and reduced with the segmented
    cumsum.  Med and top sums are pure reshape-reductions of the low sums
    because ``slot_sort`` is med-major.
    """
    import numpy as np

    table = scene.table
    voxel = cfg.voxel
    ny, nx = voxel.grid_size
    v_cap = table.valid.shape[0]
    s_low, s_med = voxel.num_slots_low, voxel.num_slots_med
    fan = s_low // s_med
    p2v = table.point2voxel
    P = scene.valid.shape[0]

    if sums is None:
        mu, vals4 = _centered_vals4(scene, v_cap)
        oh = jax.nn.one_hot(scene.slot_sort, s_low, dtype=jnp.float32)
        prod = (oh[:, :, None] * vals4[:, None, :]).reshape(P, s_low * 4)
        sums = scatter.segment_sum(prod, p2v, v_cap,
                                   sorted_ids=True).reshape(v_cap, s_low, 4)
    sums_med = sums.reshape(v_cap, s_med, fan, 4).sum(2)
    sums_top = sums_med.sum(1)

    def _cent(s4, mu_add=True):
        cnt = s4[..., 3]
        raw = s4[..., :3] / jnp.maximum(cnt, 1.0)[..., None] + mu
        return (cnt > 0.5), raw

    occ_sort, raw_sort = _cent(sums)            # slot_sort unit order
    occ_med, raw_med = _cent(sums_med)          # slot_med order (med-major)
    occ_top, top_raw = _cent(sums_top)          # [V]

    perm = _slot_sort_to_low(voxel)             # perm[slot_sort] = slot_low
    if _TGT_SKIP == "norm":
        low_norm_sort, med_norm, top_norm = raw_sort, raw_med, top_raw
    else:
        low_norm_sort = _normalize_dense(raw_sort, table.coords, perm,
                                         voxel.sub_voxel_ratio_low, voxel)
        med_norm = _normalize_dense(raw_med, table.coords,
                                    np.arange(s_med),
                                    voxel.sub_voxel_ratio_med, voxel)
        top_norm = _normalize_dense(top_raw[:, None, :], table.coords,
                                    [0], (1, 1, 1), voxel)[:, 0]

    # low tables STAY in the canonical slot_sort order: the reference's
    # row-major slot_low relabeling is folded into the low heads' WEIGHT
    # columns instead (GeoMAE.__call__) — a [C, S*k] static gather at
    # compile time replaces two [B, V, S, 3] table gathers per step
    low_occ = occ_sort
    low_tgt = jnp.where(low_occ[..., None], low_norm_sort, 0.0)

    c_top = jnp.where(occ_top[:, None], top_norm, 0.0)

    # ---- normals & curvature from RAW med centroids ------------------------
    # The covariance over the 3x3 neighborhood's occupied med centroids
    # cov_u = sum_n sum_s occ (m - t_u)(m - t_u)^T expands to moment
    # algebra with per-pillar moments c = sum occ, S1 = sum occ*(m - t),
    # S2 = sum occ*(m - t)(m - t)^T computed about each pillar's OWN top
    # centroid t (all operands O(sub-voxel meters) — moments about raw
    # world coordinates cancel catastrophically in f32 for far pillars),
    # then translated to the receiving pillar u by d_n = t_n - t_u:
    #   cov_u = sum_n [S2_n + S1_n d^T + d S1_n^T + c_n d d^T]
    # Neighbor access goes through a dense BEV grid: one build of the
    # 13-ch moment rows (Pallas expand on TPU / sorted-unique scatter
    # elsewhere — ``_moment_feats``/``_stencil_dense``), a 9-tap
    # shifted-slice stencil in PACKED-SYM channels, and one row gather
    # back.  The previous per-pillar ``neighbor_rows`` binary search
    # (searchsorted method='sort' over 9V queries) plus 9-way row gather
    # measured ~35 ms of the targets stage on v5e (the spconv
    # ``get_indice_pairs_implicit_gemm`` replacement, ``..._ssl.py:192-207``).
    feats, key = _moment_feats(table, voxel, sums, mu)
    if dense is None:
        dense = _stencil_dense(feats, key, ny, nx)
    if _TGT_SKIP == "stencil":
        cov6 = jnp.ones((v_cap, 6), jnp.float32) * dense.sum()
    else:
        cov6 = scatter.gather_rows(
            _stencil_covs(dense, ny, nx).reshape(ny * nx, 6),
            key)                                   # sentinel -> 0
    from ..ops.eig3 import normal_and_curvature6
    if _TGT_SKIP == "eig":
        normal, curv = cov6[:, :3], cov6[:, :1]
    else:
        normal, curv = normal_and_curvature6(cov6)

    vmask = table.valid
    return GeoMAETargets(
        low_occ=low_occ,
        low_tgt=low_tgt,
        med_occ=occ_med,
        med_tgt=jnp.where(occ_med[..., None], med_norm, 0.0),
        centroid_top=c_top,
        normal=jnp.where(vmask[:, None], normal, 0.0),
        curv=jnp.where(vmask[:, None], curv, 0.0),
    )


def _targets_use_pallas(scene: Scene, use_pallas) -> bool:
    if use_pallas is not None:
        return use_pallas
    # measured v5e @ [4, 262k]: the fused slot-outer kernel builds the
    # dense sums in 11.2 ms vs 60 ms for the XLA one-hot cumsum (after the
    # natural-orientation one-hot fix in ops/pallas_segreduce.py).
    import os
    if os.environ.get("GEOMAE_PALLAS_TARGETS") == "0":
        return False
    from .sst import _is_tpu_backend
    P = scene.valid.shape[-1]
    return _is_tpu_backend() and P % 512 == 0


def compute_targets_batch(scene: Scene, cfg: PretrainConfig,
                          use_pallas: bool | None = None):
    """Batched targets.  On TPU the dense (pillar, slot) sums run through
    the fused Pallas slot-outer kernel; ``use_pallas`` overrides the
    auto-detection (tests force it through interpret mode)."""
    v_cap = scene.table.valid.shape[-1]
    if _targets_use_pallas(scene, use_pallas):
        # channel-major input build + kernel: the row-major vals4
        # [B, P, 4] pads its lane dim to 128 (537 MB at bench shapes)
        from ..ops.pallas_segreduce import expand_rows_pallas
        from ..ops.pallas_segreduce_t import slot_outer_segment_sum_t
        mu, vals4_t = _centered_vals4_t(scene, v_cap)
        if _TGT_SKIP == "slotouter":
            # keep the channel-major input build alive via a full
            # reduction; only the slot-outer kernel itself drops out
            B = vals4_t.shape[0]
            sums = jnp.ones(
                (B, v_cap, cfg.voxel.num_slots_low, 4), jnp.float32
            ) * vals4_t.sum(axis=(1, 2))[:, None, None, None]
        else:
            # chunk 256: the slot-outer kernel is one-hot-AREA-bound
            # ((chunk+128) x P per slot group) — measured 7.7 ms vs
            # 10-17 at chunk 512 (tools/profile_segops.py, v5e); the
            # scan-bound max/mean ops stay at 512
            sums = slot_outer_segment_sum_t(
                vals4_t, scene.slot_sort, scene.table.point2voxel,
                cfg.voxel.num_slots_low, v_cap, chunk=256)
        # dense BEV moment grid via the Pallas expand kernel (batched,
        # OUTSIDE the vmap): the XLA scatter-set lowering serializes its
        # 20480 updates (~10 ms at bench shapes)
        ny, nx = cfg.voxel.grid_size
        feats, key = jax.vmap(lambda t, sm, m: _moment_feats(
            t, cfg.voxel, sm, m))(scene.table, sums, mu)
        if _TGT_SKIP == "expand":
            dense = jnp.ones((feats.shape[0], ny * nx + 1, 13),
                             jnp.float32) * feats.sum((1, 2))[:, None,
                                                              None]
        else:
            dense = expand_rows_pallas(feats, key, ny * nx)
        return jax.vmap(lambda s, sm, m, d: compute_targets(
            s, cfg, sm, m, d))(scene, sums, mu, dense)
    return jax.vmap(lambda s: compute_targets(s, cfg))(scene)


# ---------------------------------------------------------------------------
# mask sampling
# ---------------------------------------------------------------------------


def sample_mask(rng: jax.Array, valid: jnp.ndarray,
                mask_ratio: float) -> jnp.ndarray:
    """Per-sample random keep mask (``get_vanilla_mask_index``,
    ``..._ssl.py:287-304``): keep ``int(L * (1 - ratio))`` random rows.

    Args: valid [B, V].  Returns keep [B, V] bool (subset of valid).
    """
    B, V = valid.shape
    r = jax.random.uniform(rng, (B, V))
    r = jnp.where(valid, r, jnp.inf)
    n_valid = jnp.sum(valid, axis=1)
    len_keep = jnp.floor(n_valid * (1.0 - mask_ratio)).astype(jnp.int32)
    # rank < len_keep == r below its len_keep-th order statistic: ONE
    # value sort instead of the rank construction's two argsorts
    # (draws are continuous, ties have measure zero)
    rs = jnp.sort(r, axis=1)
    thr = jnp.take_along_axis(rs, jnp.minimum(len_keep, V - 1)[:, None], 1)
    keep = (r < thr) & valid
    return jnp.where((len_keep >= V)[:, None], valid, keep)


def sample_focal_mask(rng: jax.Array, table, gt_boxes, gt_mask,
                      voxel_cfg, mask_ratio: float) -> jnp.ndarray:
    """Foreground-focused masking (``get_focal_mask_index``,
    ``..._ssl.py:245-284``): pillars whose BEV center falls inside a GT box
    (z forced mid-box like the reference's z=1, h=2 trick) are randomly
    masked at ``mask_ratio``; background pillars are always kept.

    Args: table batched VoxelTable; gt_boxes [B, G, >=7]; gt_mask [B, G].
    Returns keep mask [B, V].
    """
    from ..core.boxes import points_in_boxes

    r = voxel_cfg.point_cloud_range
    vx, vy = voxel_cfg.voxel_size[0], voxel_cfg.voxel_size[1]

    def one(coords, valid, boxes, bmask, key):
        centers = jnp.stack([
            coords[:, 1].astype(jnp.float32) * vx + r[0],
            coords[:, 0].astype(jnp.float32) * vy + r[1],
            jnp.ones(coords.shape[0], jnp.float32)], -1)
        b = boxes.at[:, 2].set(0.0).at[:, 5].set(2.0)
        inside = points_in_boxes(centers, b) & bmask[None, :]
        fg = inside.any(-1) & valid
        L = fg.sum()
        len_keep = jnp.floor(L * (1.0 - mask_ratio)).astype(jnp.int32)
        u = jnp.where(fg, jax.random.uniform(key, fg.shape), jnp.inf)
        rank = jnp.argsort(jnp.argsort(u))
        keep_fg = (rank < len_keep) & fg
        return keep_fg | (valid & ~fg)

    keys = jax.random.split(rng, table.valid.shape[0])
    return jax.vmap(one)(table.coords, table.valid, gt_boxes, gt_mask, keys)


def compact_visible(keep: jnp.ndarray, vis_cap: int):
    """Pack kept rows into a [vis_cap] buffer (per sample; vmap over B).

    Returns (vis_idx int32 [vis_cap] row indices ascending, vis_valid bool).
    """
    V = keep.shape[0]
    rows = jnp.where(keep, jnp.arange(V, dtype=jnp.int32), INT32_MAX)
    order = jnp.sort(rows)[:vis_cap]
    vis_valid = order != INT32_MAX
    return jnp.where(vis_valid, order, 0), vis_valid


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class GeoMAE(nn.Module):
    """VFE + SST encoder over visible pillars + two-branch SST decoder.

    ``__call__`` returns full-[B, V] dense predictions; the loss gathers
    them at occupied sub-voxel segments.  Heads mirror the reference
    (backbone ``:117-130``): ``decoder_pred_{low,med,top}`` (centroids),
    ``decoder_pred_density_top`` (normal; config ``top=True`` only),
    ``cls_pred_{low,med}`` (occupancy).
    """

    cfg: PretrainConfig

    @nn.compact
    def __call__(self, scene: Scene, keep: jnp.ndarray, train: bool = True,
                 voxel_feats: jnp.ndarray | None = None):
        """``voxel_feats`` (optional [B, V, C]) bypasses the VFE — used by
        full-backbone parity tests and profilers to inject post-VFE
        features; params are identical either way (init runs the VFE)."""
        cfg = self.cfg
        table = scene.table
        C = cfg.sst.d_model
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V = keep.shape
        vis_cap = cfg.caps.max_visible
        s_low, s_med = cfg.voxel.num_slots_low, cfg.voxel.num_slots_med

        if voxel_feats is None:
            voxel_feats = DynamicScatterVFE(cfg.vfe, cfg.voxel, dtype,
                                            name="voxel_encoder")(scene,
                                                                  train)
        voxel_feats = _sg(voxel_feats, "vfe")

        # ---- encoder over compacted visible tokens ------------------------
        vis_idx, vis_valid = jax.vmap(
            lambda k: compact_visible(k, vis_cap))(keep)
        # the compaction is an INJECTION (each table row appears at most
        # once); gather_injective makes both its forward and its backward
        # pure row gathers — take_rows_sorted's backward instead rode a
        # sorted-segment sum whose boundary search costs one sort per call
        vis_raw = jnp.where(vis_valid, vis_idx, INT32_MAX)
        vis_rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        ok = keep & (vis_rank < vis_cap)
        rank_m = jnp.where(ok, vis_rank, INT32_MAX)       # inverse map
        take = lambda x: jax.vmap(scatter.gather_injective)(
            x, vis_raw, rank_m)
        vis_feats = take(voxel_feats)          # sentinel rows read 0
        vis_coords = take(table.coords)

        enc_layouts = make_layouts(vis_coords, vis_valid, cfg.sst, cfg.voxel)
        enc_data = prepare_shift_data(enc_layouts, None, vis_valid,
                                      cfg.sst, cfg.voxel)
        x = vis_feats.astype(dtype)
        x = SSTStack(cfg.sst, cfg.mae.encoder_blocks, dtype,
                     name="encoder")(x, enc_data)
        x = _sg(x, "enc")

        # expand encoder outputs back to table rows: the inverse injection
        # (masked rows read the sentinel -> 0; backward gathers by vis_raw)
        enc_full = jax.vmap(scatter.gather_injective)(x, rank_m, vis_raw)

        # ---- decoder over all (visible ∪ masked) pillars -------------------
        mask_token = self.param("mask_token",
                                nn.initializers.xavier_uniform(), (1, C))
        dec_in = jnp.where(keep[..., None], enc_full,
                           mask_token.astype(dtype))
        dec_in = jnp.where(table.valid[..., None], dec_in, 0)

        dec_layouts = make_layouts(table.coords, table.valid, cfg.sst,
                                   cfg.voxel)
        dec_data = prepare_shift_data(dec_layouts, None, table.valid,
                                      cfg.sst, cfg.voxel)

        # the two parameter-independent decoder branches (reference
        # backbone :236-303) run as ONE grouped stack over a [2B] batch —
        # half the kernel launches; branch 0 = centroid, 1 = density
        dec_out = SSTStackPair(cfg.sst, cfg.mae.decoder_blocks, 2, dtype,
                               name="decoders")(dec_in, dec_data)
        dec_out = _sg(dec_out, "dec")
        cent, dens = dec_out[0], dec_out[1]

        xavier = nn.initializers.xavier_uniform()
        head = lambda n, name: nn.Dense(n, dtype=dtype, kernel_init=xavier,
                                        name=name)

        # low heads: params keep the reference slot_low column layout
        # (torch-ckpt interop unchanged) but OUTPUTS are emitted in the
        # canonical slot_sort order by permuting the weight columns — a
        # static [C, S*k] gather fused at compile time.  The targets'
        # low tables are slot_sort-ordered to match (compute_targets).
        import numpy as np
        perm = _slot_sort_to_low(cfg.voxel)      # perm[slot_sort] = slot_low

        def low_head(x, k, name):
            from .sst import _DenseParams
            w, b = _DenseParams(C, s_low * k, name=name)()
            cols = (perm[:, None] * k + np.arange(k)).reshape(-1)
            y = x @ w[:, cols].astype(dtype) + b[cols].astype(dtype)
            return y.reshape(B, V, s_low, k)

        preds = dict(
            reg_low=low_head(cent, 3, "decoder_pred_low"),
            reg_med=head(s_med * 3, "decoder_pred_med")(cent)
            .reshape(B, V, s_med, 3),
            reg_top=head(3, "decoder_pred_top")(cent),
            nor_top=head(3, "decoder_pred_density_top")(dens),
        )
        if cfg.mae.cls_sub_voxel:
            preds["cls_low"] = low_head(cent, 2, "cls_pred_low")
            preds["cls_med"] = head(s_med * 2, "cls_pred_med")(cent)\
                .reshape(B, V, s_med, 2)
        return preds


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def _bce_with_logits(logits, target):
    """Elementwise binary cross-entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _slot_sort_to_low(voxel):
    """Static table ``perm[slot_sort] = slot_low`` (numpy int32 [s_low]).

    ``slot_sort`` is the canonical med-major relabeling of the reference's
    row-major ``slot_low`` (``ops.voxelize.sub_voxel_slots``); both are
    functions of the in-pillar (z, y, x) only, so the mapping is a fixed
    bijection."""
    import numpy as np
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    fz, fy, fx = rz // mz, ry // my, rx // mx
    z, y, x = np.meshgrid(np.arange(rz), np.arange(ry), np.arange(rx),
                          indexing="ij")
    slot_low = (z * ry * rx + y * rx + x).reshape(-1)
    slot_med = ((z // fz) * (my * mx) + (y // fy) * mx + (x // fx)).reshape(-1)
    intra = ((z % fz) * (fy * fx) + (y % fy) * fx + (x % fx)).reshape(-1)
    s_sort = slot_med * (fz * fy * fx) + intra
    out = np.zeros(rz * ry * rx, np.int32)
    out[s_sort] = slot_low
    return out


def pretrain_loss(preds: dict, targets: GeoMAETargets, scene: Scene,
                  keep: jnp.ndarray, cfg: PretrainConfig) -> dict:
    """Masked multi-term loss (``forward_loss``, ``..._ssl.py:838-902``).

    * centroid MSE per sub-voxel (mean over 3 dims, mean over masked &
      occupied sub-voxels) at low/med/top, weights 10/8/10;
    * normal MSE on masked pillars, weight 4 (logged as ``loss_curv_around``
      to match the reference's misleading key);
    * occupancy BCE over 2 logits vs one-hot at low/med, weights 5/2, mean
      over every element of masked rows (mmdet ``CrossEntropyLoss
      (use_sigmoid=True)`` semantics).

    Every term is elementwise over the dense target tables (targets carry
    occupancy + centroids per (pillar, slot)), so the backward is
    elementwise too — the loss adds no gathers/scatters/sorts to the
    differentiated graph.
    """
    m = cfg.mae
    table = scene.table
    mask_rows = table.valid & ~keep                  # [B, V] masked pillars

    f32 = lambda x: x.astype(jnp.float32)

    def _sub_reg(pred, occ, tgt):
        err = jnp.mean(jnp.square(f32(pred) - tgt), axis=-1)   # [B, V, S]
        sel = occ & mask_rows[:, :, None]
        cnt = jnp.maximum(jnp.sum(sel), 1)
        return jnp.sum(jnp.where(sel, err, 0)) / cnt

    def _dense_reg(pred, tgt, sel):
        err = jnp.mean(jnp.square(f32(pred) - f32(tgt)), axis=-1)
        cnt = jnp.maximum(jnp.sum(sel), 1)
        return jnp.sum(jnp.where(sel, err, 0)) / cnt

    losses = dict(
        loss_centroid_low=_sub_reg(preds["reg_low"], targets.low_occ,
                                   targets.low_tgt) * m.loss_ratio_low,
        loss_centroid_med=_sub_reg(preds["reg_med"], targets.med_occ,
                                   targets.med_tgt) * m.loss_ratio_med,
        loss_centroid_top=_dense_reg(preds["reg_top"], targets.centroid_top,
                                     mask_rows) * m.loss_ratio_top,
        loss_curv_around=_dense_reg(preds["nor_top"], targets.normal,
                                    mask_rows) * m.loss_ratio_nor,
    )

    if m.cls_sub_voxel:
        def _cls(logits, occ):
            lg = f32(logits)                          # [B, V, S, 2]
            t = occ.astype(jnp.float32)
            bce = _bce_with_logits(lg[..., 0], 1.0 - t) \
                + _bce_with_logits(lg[..., 1], t)
            num = jnp.sum(jnp.where(mask_rows[:, :, None], bce, 0))
            denom = jnp.maximum(jnp.sum(mask_rows) * occ.shape[-1] * 2, 1)
            return num / denom

        losses["loss_cls_low"] = _cls(
            preds["cls_low"], targets.low_occ) * m.cls_loss_ratio_low
        losses["loss_cls_med"] = _cls(
            preds["cls_med"], targets.med_occ) * m.cls_loss_ratio_med
    losses["loss"] = sum(losses.values())
    return losses
