"""Classic voxel/pillar encoders of the reference zoo.

Rebuilds the non-GeoMAE encoders of ``mmdet3d/models/voxel_encoders``:
``HardSimpleVFE`` / ``DynamicSimpleVFE`` (``voxel_encoder.py:19-89``) and
``PillarFeatureNet`` / ``DynamicPillarFeatureNet`` (``pillar_encoder.py:12,
154``), plus ``PointPillarsScatter`` (``middle_encoders/pillar_scatter.py:
9``) which is :func:`geomae_tpu.models.second.recover_bev` re-exported.
These feed the SECOND-family detectors (``VoxelNet``/``DynamicVoxelNet``
with classic backbones).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VFEConfig, VoxelConfig
from ..ops import scatter
from ..ops.voxelize import Scene
from .second import recover_bev  # noqa: F401  (PointPillarsScatter)
from .norm import MaskedBatchNorm
from .vfe import _gather_b, _seg_mean_b, _seg_max_b, torch_linear_init


def hard_simple_vfe(voxels: jnp.ndarray, num_points: jnp.ndarray,
                    num_features: int = 4) -> jnp.ndarray:
    """Mean of points per voxel over a hard-voxelized [V, T, D] buffer
    (``HardSimpleVFE``, reference ``voxel_encoder.py:19-55``)."""
    s = jnp.sum(voxels[..., :num_features], axis=-2)
    return s / jnp.maximum(num_points, 1)[..., None].astype(s.dtype)


def dynamic_simple_vfe(scene: Scene, num_features: int = 4):
    """Per-voxel mean over the dynamic table (``DynamicSimpleVFE``,
    ``voxel_encoder.py:58-89``).  Batched Scene input."""
    table = scene.table
    v_cap = table.valid.shape[-1]
    mean = _seg_mean_b(scene.points[..., :num_features], table.point2voxel,
                       v_cap, scene.valid, table.valid)
    return jnp.where(table.valid[..., None], mean, 0.0)


class HardVFE(nn.Module):
    """VFE over dense hard-voxelized buffers (``HardVFE``, reference
    ``voxel_encoder.py:422-585``; point layers = ``VFELayer``,
    ``voxel_encoders/utils.py:31-90``): decorate each point with the
    cluster-center offset / pillar-center offset / radial distance, then
    Linear(no bias) -> BN -> ReLU -> in-voxel max per layer, broadcasting
    the max back (``cat_max``) on all but the last layer.

    Inputs are batched: ``voxels`` [B, V, T, D] zero-padded buffers from
    :func:`geomae_tpu.ops.voxelize.hard_voxelize`, ``num_points`` [B, V],
    ``coords`` [B, V, 2] (y, x).  The image fusion layer is scoped out
    (camera modality, SURVEY §7).
    """

    cfg: VFEConfig
    voxel: VoxelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, num_points: jnp.ndarray,
                 coords: jnp.ndarray, train: bool = True):
        B, V, T, D = voxels.shape
        mask = (jnp.arange(T)[None, None, :]
                < num_points[..., None])                  # [B, V, T]
        xyz = voxels[..., :3]
        feats = [voxels]
        if self.cfg.with_cluster_center:
            mean = (jnp.sum(xyz, axis=-2, keepdims=True)
                    / jnp.maximum(num_points, 1)[..., None, None]
                    .astype(xyz.dtype))
            feats.append(xyz - mean)
        if self.cfg.with_voxel_center:
            r = self.voxel.point_cloud_range
            vx, vy, vz = self.voxel.voxel_size
            cy = coords[..., 0:1].astype(voxels.dtype)
            cx = coords[..., 1:2].astype(voxels.dtype)
            feats.append(jnp.stack([
                voxels[..., 0] - (cx * vx + vx / 2 + r[0]),
                voxels[..., 1] - (cy * vy + vy / 2 + r[1]),
                voxels[..., 2] - (vz / 2 + r[2])], -1))
        if self.cfg.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, -1)
        x = jnp.where(mask[..., None], x, 0.0).astype(self.dtype)

        for i, ch in enumerate(self.cfg.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         kernel_init=torch_linear_init,
                         name=f"vfe_{i}_linear")(x)
            x = MaskedBatchNorm(ch, self.cfg.bn_momentum, self.cfg.bn_eps,
                                name=f"vfe_{i}_norm")(x, mask, train)
            # NOTE: like the reference, only the INPUT decorations are
            # masked — the in-voxel max sees relu(BN(linear(0))) for the
            # padded rows (voxel_encoder.py:575 masks once, before layers)
            x = nn.relu(x)
            vmax = jnp.max(x, axis=-2)                    # [B, V, ch]
            if i != len(self.cfg.feat_channels) - 1:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(vmax[..., None, :], x.shape)], -1)
        return vmax


class PillarFeatureNet(nn.Module):
    """PointPillars encoder: decorated point features -> PFN layers ->
    per-pillar max (``pillar_encoder.py:12-150``).  This dynamic variant
    subsumes both ``PillarFeatureNet`` (hard) and
    ``DynamicPillarFeatureNet`` — with a VoxelTable the two coincide.
    """

    cfg: VFEConfig
    voxel: VoxelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scene: Scene, train: bool = True):
        table = scene.table
        points, point_valid = scene.points, scene.valid
        v_cap = table.valid.shape[-1]
        p2v = table.point2voxel
        xyz = points[..., :3]
        feats = [points]
        if self.cfg.with_cluster_center:
            vmean = _seg_mean_b(xyz, p2v, v_cap, point_valid, table.valid)
            feats.append(xyz - _gather_b(vmean, p2v))
        if self.cfg.with_voxel_center:
            r = self.voxel.point_cloud_range
            vx, vy, vz = self.voxel.voxel_size
            cy = table.coords[..., 0].astype(points.dtype)
            cx = table.coords[..., 1].astype(points.dtype)
            px = _gather_b(cx[..., None], p2v)[..., 0]
            py = _gather_b(cy[..., None], p2v)[..., 0]
            feats.append(jnp.stack([
                points[..., 0] - (px * vx + vx / 2 + r[0]),
                points[..., 1] - (py * vy + vy / 2 + r[1]),
                points[..., 2] - (vz / 2 + r[2])], -1))
        if self.cfg.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, -1)
        x = jnp.where(point_valid[..., None], x, 0.0).astype(self.dtype)

        for i, ch in enumerate(self.cfg.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         kernel_init=torch_linear_init,
                         name=f"pfn_{i}_linear")(x)
            x = MaskedBatchNorm(ch, self.cfg.bn_momentum, self.cfg.bn_eps,
                                name=f"pfn_{i}_norm")(x, point_valid, train)
            x = nn.relu(x)
            vmax = _seg_max_b(x, p2v, v_cap, point_valid, table.valid)
            if i != len(self.cfg.feat_channels) - 1:
                x = jnp.concatenate([x, _gather_b(vmax, p2v)], -1)
        return jnp.where(table.valid[..., None], vmax, 0.0)
