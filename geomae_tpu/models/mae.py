"""GeoMAE pretrainer: masked geometric target prediction.

TPU-native rebuild of ``MultiSubVoxelDynamicVoxelNetSSL``
(``/root/reference/mmdet3d/models/detectors/multi_sub_voxel_dynamic_voxelnet_ssl.py``)
+ ``MultiMAESSTSPChoose``
(``mmdet3d/models/backbones/multi_mae_sst_spearate_top_only.py``).

Key re-designs (semantics preserved, layout TPU-first):

* Sub-voxel centroids are scattered **directly** into the
  ``[V, num_slots, 3]`` target layout with a single segment-mean keyed by
  ``pillar_row * num_slots + slot`` — the reference instead materializes
  separate low/med voxel tables and hashes them back
  (``get_multi_voxel_id_to_tensor_id_ori``, ``..._ssl.py:674-722``).
* The 3x3-neighborhood med-centroid gather for normals/curvature uses 9
  shifted dense-grid lookups (``ops/voxelize.neighbor_rows``) instead of
  spconv's ``get_indice_pairs_implicit_gemm`` (``..._ssl.py:192-207``).
* Per-voxel ``torch.svd`` becomes a closed-form symmetric 3x3 eigensolver
  (``ops/eig3``).
* Masked rows keep their table position: the decoder input is
  ``where(keep, encoder_out, mask_token)`` instead of appending masked rows
  after visible ones and slicing at ``masked_start_id`` (backbone
  ``:239-280``) — equivalent because pretrain windows are drop-free.
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
from ..ops.voxelize import Scene, VoxelTable, neighbor_rows
from ..ops.windows import make_layouts, positional_embedding, window_ids
from .sst import SSTStack, prepare_shift_data
from .vfe import DynamicScatterVFE

INT32_MAX = jnp.iinfo(jnp.int32).max


class GeoMAETargets(NamedTuple):
    """All-[B, V, ...] geometric targets; (z, y, x) coordinate order."""

    centroid_low: jnp.ndarray    # [B, V, S_low, 3] normalized, 0 where empty
    occ_low: jnp.ndarray         # [B, V, S_low] bool
    centroid_med: jnp.ndarray    # [B, V, S_med, 3]
    occ_med: jnp.ndarray         # [B, V, S_med] bool
    centroid_top: jnp.ndarray    # [B, V, 3]
    normal: jnp.ndarray          # [B, V, 3]
    curv: jnp.ndarray            # [B, V, 3] (unsupervised in shipped config)


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------


def _slot_coords(coords, slot, ratio):
    """Integer sub-voxel coords (z, y, x) from pillar coords + slot index."""
    rz, ry, rx = ratio
    sz = slot // (ry * rx)
    sy = (slot // rx) % ry
    sx = slot % rx
    z = sz  # single-z pillar grid: pillar z == 0
    y = coords[..., 0:1] * ry + sy
    x = coords[..., 1:2] * rx + sx
    return z, y, x


def _normalize_sub_voxel(cent_zyx, coords, ratio, voxel, level_size_zyx):
    """(c - (coor * size + origin)) / size per sub-voxel
    (``normalize_centroid_sub_voxel``, ``..._ssl.py:626-641``)."""
    V, S = cent_zyx.shape[0], cent_zyx.shape[1]
    slot = jnp.arange(S, dtype=jnp.int32)[None, :]
    z, y, x = _slot_coords(coords, slot, ratio)
    coor = jnp.stack(jnp.broadcast_arrays(
        z.astype(jnp.float32), y.astype(jnp.float32),
        x.astype(jnp.float32)), axis=-1)  # [V, S, 3] zyx
    r = voxel.point_cloud_range
    origin = jnp.array([r[2], r[1], r[0]], jnp.float32)
    size = jnp.asarray(level_size_zyx, jnp.float32)
    return (cent_zyx - (coor * size + origin)) / size


def compute_targets(scene: Scene, cfg: PretrainConfig) -> GeoMAETargets:
    """Pure target computation for one sample (vmap over batch).

    One SORTED segment-sum produces the low-resolution per-slot (z, y, x)
    sums + counts; the med and top sums derive by reshape-reductions (a med
    sub-voxel is exactly a 2x2x2 block of low sub-voxels, and the pillar is
    all of them) — so the reference's three voxelize+unique+scatter passes
    (``..._ssl.py:173-187``) collapse into one segmented scan.
    """
    table = scene.table
    voxel = cfg.voxel
    ny, nx = voxel.grid_size
    v_cap = table.valid.shape[0]
    s_low, s_med = voxel.num_slots_low, voxel.num_slots_med
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    p2v = table.point2voxel
    zyx = scene.points[:, :3][:, ::-1].astype(jnp.float32)

    seg_low = p2v * s_low + scene.slot_low
    seg_low = jnp.where(p2v < v_cap, seg_low, v_cap * s_low)
    # center coordinates on their global mean so the cumsum inside the
    # sorted segment-sum stays a bounded random walk (fp32 precision)
    nvalid = jnp.maximum(jnp.sum(scene.valid), 1)
    mu = jnp.sum(jnp.where(scene.valid[:, None], zyx, 0), 0) / nvalid
    zyx_c = zyx - mu
    sums4 = scatter.segment_sum(
        jnp.concatenate([zyx_c, jnp.ones_like(zyx[:, :1])], -1),
        seg_low, v_cap * s_low, scene.valid, sorted_ids=True)
    sums4 = sums4.reshape(v_cap, s_low, 4)

    # low slot layout is (sz, sy, sx) row-major; med slot = components // 2
    fz, fy, fx = rz // mz, ry // my, rx // mx
    med4 = sums4.reshape(v_cap, mz, fz, my, fy, mx, fx, 4).sum((2, 4, 6))
    med4 = med4.reshape(v_cap, s_med, 4)
    top4 = sums4.sum(1)

    def _finish(s4):
        cnt = s4[..., 3]
        mean = s4[..., :3] / jnp.maximum(cnt, 1.0)[..., None] + mu
        return jnp.where((cnt > 0)[..., None], mean, 0.0), cnt > 0

    c_low, occ_low = _finish(sums4)
    c_med, occ_med = _finish(med4)
    c_top, _ = _finish(top4)

    # ---- normals & curvature from RAW (unnormalized) med centroids --------
    nbr = neighbor_rows(table.coords, table.valid, ny, nx, v_cap)   # [V, 9]
    med_nbr = scatter.gather_rows(
        c_med.reshape(v_cap, s_med * 3), nbr.reshape(-1)).reshape(
        v_cap, 9, s_med, 3)
    occ_nbr = scatter.gather_rows(
        occ_med.astype(jnp.float32), nbr.reshape(-1)).reshape(
        v_cap, 9, s_med) > 0
    X = jnp.where(occ_nbr[..., None], med_nbr - c_top[:, None, None, :], 0.0)
    X = X.reshape(v_cap, 9 * s_med, 3)
    cov = jnp.einsum("vki,vkj->vij", X, X)
    normal, curv = normal_and_curvature(cov)

    # ---- normalization into per-sub-voxel local frames --------------------
    vx, vy, vz = voxel.voxel_size
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    c_low = _normalize_sub_voxel(c_low, table.coords, (rz, ry, rx), voxel,
                                 (vz / rz, vy / ry, vx / rx))
    c_med = _normalize_sub_voxel(c_med, table.coords, (mz, my, mx), voxel,
                                 (vz / mz, vy / my, vx / mx))
    c_top = _normalize_sub_voxel(c_top[:, None, :], table.coords, (1, 1, 1),
                                 voxel, (vz, vy, vx))[:, 0, :]

    c_low = jnp.where(occ_low[..., None], c_low, 0.0)
    c_med = jnp.where(occ_med[..., None], c_med, 0.0)
    vmask = table.valid
    c_top = jnp.where(vmask[:, None], c_top, 0.0)
    normal = jnp.where(vmask[:, None], normal, 0.0)
    curv = jnp.where(vmask[:, None], curv, 0.0)

    return GeoMAETargets(centroid_low=c_low, occ_low=occ_low,
                         centroid_med=c_med, occ_med=occ_med,
                         centroid_top=c_top, normal=normal, curv=curv)


def compute_targets_batch(scene: Scene, cfg: PretrainConfig):
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
    rank = jnp.argsort(jnp.argsort(r, axis=1), axis=1)
    n_valid = jnp.sum(valid, axis=1, keepdims=True)
    len_keep = jnp.floor(n_valid * (1.0 - mask_ratio)).astype(jnp.int32)
    return (rank < len_keep) & valid


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

    ``__call__`` returns full-[B, V] predictions; the loss selects masked
    rows.  Heads mirror the reference (backbone ``:117-130``):
    ``decoder_pred_{low,med,top}`` (centroids), ``decoder_pred_density_top``
    (normal; config ``top=True`` only), ``cls_pred_{low,med}`` (occupancy).
    """

    cfg: PretrainConfig

    @nn.compact
    def __call__(self, scene: Scene, keep: jnp.ndarray, train: bool = True):
        cfg = self.cfg
        table = scene.table
        C = cfg.sst.d_model
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V = keep.shape
        vis_cap = cfg.caps.max_visible
        s_low, s_med = cfg.voxel.num_slots_low, cfg.voxel.num_slots_med

        voxel_feats = DynamicScatterVFE(cfg.vfe, cfg.voxel, dtype,
                                        name="voxel_encoder")(scene, train)

        # ---- encoder over compacted visible tokens ------------------------
        vis_idx, vis_valid = jax.vmap(
            lambda k: compact_visible(k, vis_cap))(keep)
        take = lambda x: jnp.take_along_axis(
            x, vis_idx.reshape(B, vis_cap, *([1] * (x.ndim - 2))), axis=1)
        vis_feats = jnp.where(vis_valid[..., None], take(voxel_feats), 0.0)
        vis_coords = take(table.coords)

        enc_layouts = make_layouts(vis_coords, vis_valid, cfg.sst, cfg.voxel)
        enc_pos = [positional_embedding(
            jax.vmap(lambda c, m, ss=s: window_ids(
                c, m, ss, cfg.sst, cfg.voxel)[1])(vis_coords, vis_valid),
            cfg.sst) for s in cfg.sst.shifts]
        enc_data = prepare_shift_data(enc_layouts, enc_pos, vis_valid)
        x = vis_feats.astype(dtype)
        x = SSTStack(cfg.sst, cfg.mae.encoder_blocks, dtype,
                     name="encoder")(x, enc_data)

        # scatter encoder outputs back to table rows
        def _scatter(xs, idx, ok):
            tgt = jnp.zeros((V, C), xs.dtype)
            return tgt.at[jnp.where(ok, idx, V)].set(xs, mode="drop")
        enc_full = jax.vmap(_scatter)(x, vis_idx, vis_valid)

        # ---- decoder over all (visible ∪ masked) pillars -------------------
        mask_token = self.param("mask_token",
                                nn.initializers.xavier_uniform(), (1, C))
        dec_in = jnp.where(keep[..., None], enc_full,
                           mask_token.astype(dtype))
        dec_in = jnp.where(table.valid[..., None], dec_in, 0.0)

        dec_layouts = make_layouts(table.coords, table.valid, cfg.sst,
                                   cfg.voxel)
        dec_pos = []
        for s in cfg.sst.shifts:
            ciw = jax.vmap(lambda c, m, ss=s: window_ids(
                c, m, ss, cfg.sst, cfg.voxel)[1])(table.coords, table.valid)
            dec_pos.append(positional_embedding(ciw, cfg.sst))
        dec_data = prepare_shift_data(dec_layouts, dec_pos, table.valid)

        cent = SSTStack(cfg.sst, cfg.mae.decoder_blocks, dtype,
                        name="decoder_centroid")(dec_in, dec_data)
        dens = SSTStack(cfg.sst, cfg.mae.decoder_blocks, dtype,
                        name="decoder_density")(dec_in, dec_data)

        xavier = nn.initializers.xavier_uniform()
        head = lambda n, name: nn.Dense(n, dtype=dtype, kernel_init=xavier,
                                        name=name)
        preds = dict(
            reg_low=head(s_low * 3, "decoder_pred_low")(cent)
            .reshape(B, V, s_low, 3),
            reg_med=head(s_med * 3, "decoder_pred_med")(cent)
            .reshape(B, V, s_med, 3),
            reg_top=head(3, "decoder_pred_top")(cent),
            nor_top=head(3, "decoder_pred_density_top")(dens),
        )
        if cfg.mae.cls_sub_voxel:
            preds["cls_low"] = head(s_low * 2, "cls_pred_low")(cent)\
                .reshape(B, V, s_low, 2)
            preds["cls_med"] = head(s_med * 2, "cls_pred_med")(cent)\
                .reshape(B, V, s_med, 2)
        return preds


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def _masked_mean(x, mask):
    num = jnp.sum(jnp.where(mask, x, 0.0))
    den = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    return num / den


def _bce_with_logits(logits, target):
    """Elementwise binary cross-entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def pretrain_loss(preds: dict, targets: GeoMAETargets, valid: jnp.ndarray,
                  keep: jnp.ndarray, cfg: PretrainConfig) -> dict:
    """Masked multi-term loss (``forward_loss``, ``..._ssl.py:838-902``).

    * centroid MSE per sub-voxel (mean over 3 dims, mean over masked &
      occupied slots) at low/med/top, weights 10/8/10;
    * normal MSE on masked pillars, weight 4 (logged as ``loss_curv_around``
      to match the reference's misleading key);
    * occupancy BCE over 2 logits vs one-hot at low/med, weights 5/2,
      mean over every element of masked rows (mmdet ``CrossEntropyLoss
      (use_sigmoid=True)`` semantics).
    """
    m = cfg.mae
    mask_rows = valid & ~keep                       # masked real pillars

    f32 = lambda x: x.astype(jnp.float32)

    def _reg(pred, tgt, sel):
        err = jnp.mean(jnp.square(f32(pred) - f32(tgt)), axis=-1)
        return _masked_mean(err, sel)

    sel_low = mask_rows[..., None] & targets.occ_low
    sel_med = mask_rows[..., None] & targets.occ_med
    losses = dict(
        loss_centroid_low=_reg(preds["reg_low"], targets.centroid_low,
                               sel_low) * m.loss_ratio_low,
        loss_centroid_med=_reg(preds["reg_med"], targets.centroid_med,
                               sel_med) * m.loss_ratio_med,
        loss_centroid_top=_reg(preds["reg_top"], targets.centroid_top,
                               mask_rows) * m.loss_ratio_top,
        loss_curv_around=_reg(preds["nor_top"], targets.normal,
                              mask_rows) * m.loss_ratio_nor,
    )
    if m.cls_sub_voxel:
        def _cls(logits, occ):
            onehot = jnp.stack([1.0 - f32(occ), f32(occ)], axis=-1)
            bce = _bce_with_logits(f32(logits), onehot)
            sel = jnp.broadcast_to(mask_rows[..., None, None], bce.shape)
            return _masked_mean(bce, sel)
        losses["loss_cls_low"] = _cls(preds["cls_low"], targets.occ_low) \
            * m.cls_loss_ratio_low
        losses["loss_cls_med"] = _cls(preds["cls_med"], targets.occ_med) \
            * m.cls_loss_ratio_med
    losses["loss"] = sum(losses.values())
    return losses
