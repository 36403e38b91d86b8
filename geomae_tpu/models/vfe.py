"""DynamicScatterVFE — pillar feature encoder.

TPU-native rebuild of the reference encoder
(``/root/reference/mmdet3d/models/voxel_encoders/voxel_encoder.py:309-419``
with ``DynamicVFELayer`` at ``voxel_encoders/utils.py:107-146``):

  point features [x y z intensity dt]
    + cluster-center offset (segment-mean gather-back)
    + pillar-center offset                          -> 11 ch
  -> Linear(11, 64, no bias) + SyncBN + ReLU        -> point feats
  -> segment-max -> gather-back concat              -> 128 ch
  -> Linear(128, 128, no bias) + SyncBN + ReLU
  -> segment-max                                    -> voxel feats [V, 128]

The torch_scatter CUDA reduces become masked ``jax.ops.segment_*`` calls
over the canonical pillar-sorted point order (``ops/voxelize.build_scene``),
so they lower to segmented scans rather than sort+scatter.  BN statistics
are global over the sharded batch (= NaiveSyncBN).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VFEConfig, VoxelConfig
from ..ops import scatter
from ..ops.voxelize import Scene
from .norm import MaskedBatchNorm

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _seg_mean_b(data, seg, num, valid):
    return jax.vmap(lambda d, s, v: scatter.segment_mean(
        d, s, num, v, sorted_ids=True)[0])(data, seg, valid)


def _seg_max_b(data, seg, num, valid):
    return jax.vmap(lambda d, s, v: scatter.segment_max(
        d, s, num, v, sorted_ids=True))(data, seg, valid)


def _gather_b(table, idx):
    return jax.vmap(scatter.gather_rows)(table, idx)


class DynamicVFELayer(nn.Module):
    """Linear (no bias) + masked SyncBN + ReLU (reference utils.py:107-146)."""

    out_channels: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     kernel_init=torch_linear_init, name="linear")(x)
        x = MaskedBatchNorm(self.out_channels, self.bn_momentum,
                            self.bn_eps, name="norm")(x, mask, train)
        return nn.relu(x)


class DynamicScatterVFE(nn.Module):
    """Args to ``__call__``: a batched :class:`Scene` (points sorted).
    Returns voxel features [B, V, feat_channels[-1]] (0 where invalid).
    """

    cfg: VFEConfig
    voxel: VoxelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scene: Scene, train: bool = True) -> jnp.ndarray:
        table = scene.table
        points, point_valid = scene.points, scene.valid
        v_cap = table.valid.shape[-1]
        p2v = table.point2voxel
        xyz = points[..., :3]

        feats = [points]
        if self.cfg.with_cluster_center:
            vmean = _seg_mean_b(xyz, p2v, v_cap, point_valid)
            feats.append(xyz - _gather_b(vmean, p2v))
        if self.cfg.with_voxel_center:
            r = self.voxel.point_cloud_range
            vx, vy, vz = self.voxel.voxel_size
            cy = table.coords[..., 0]
            cx = table.coords[..., 1]
            px = _gather_b(cx[..., None].astype(points.dtype), p2v)[..., 0]
            py = _gather_b(cy[..., None].astype(points.dtype), p2v)[..., 0]
            fc = jnp.stack([
                points[..., 0] - (px * vx + (vx / 2 + r[0])),
                points[..., 1] - (py * vy + (vy / 2 + r[1])),
                points[..., 2] - (vz / 2 + r[2]),   # single-z pillar grid
            ], axis=-1)
            feats.append(fc)
        if self.cfg.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(point_valid[..., None], x, 0.0).astype(self.dtype)

        chans = list(self.cfg.feat_channels)
        for i, ch in enumerate(chans):
            x = DynamicVFELayer(ch, self.cfg.bn_eps, self.cfg.bn_momentum,
                                self.dtype, name=f"vfe_{i}")(
                                    x, point_valid, train)
            vmax = _seg_max_b(x, p2v, v_cap, point_valid)
            if i != len(chans) - 1:
                x = jnp.concatenate([x, _gather_b(vmax, p2v)], axis=-1)

        return jnp.where(table.valid[..., None], vmax, 0.0)
