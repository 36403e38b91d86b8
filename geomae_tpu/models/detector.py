"""DynamicVoxelNet — the SST detection fine-tune model.

Rebuilds the reference fine-tune stack (SURVEY.md §3.2):
``DynamicVoxelNet.extract_feat`` (``/root/reference/mmdet3d/models/
detectors/dynamic_voxelnet.py:39-54``) = dynamic voxelize ->
DynamicScatterVFE -> SSTInputLayer (here: band window layouts) -> 6 SST
blocks -> recover_bev -> SECOND stages -> SECONDFPN -> Anchor3DHead.

The SST encoder sub-tree is named ``encoder`` and the VFE
``voxel_encoder`` so GeoMAE pretrain checkpoints drop in by name
(reference ``load_from`` semantics, ``configs/pre_sst/...6x_1e-5.py:280``).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import FinetuneConfig
from ..ops.voxelize import Scene, build_scene_batch
from ..ops.windows import make_layouts
from .anchor_head import Anchor3DHead, HeadOutputs
from .second import SECONDFPN, SECONDStages, recover_bev
from .sst import SSTStack, prepare_shift_data
from .vfe import DynamicScatterVFE


class DynamicVoxelNet(nn.Module):
    cfg: FinetuneConfig

    @nn.compact
    def __call__(self, scene: Scene, train: bool = True,
                 voxel_feats: jnp.ndarray | None = None) -> HeadOutputs:
        """``voxel_feats`` (optional [B, V, C]) bypasses the VFE (used by
        full-model parity tests; params identical either way)."""
        cfg = self.cfg
        table = scene.table
        dtype = jnp.dtype(cfg.compute_dtype)
        ny, nx = cfg.voxel.grid_size

        feats = voxel_feats
        if feats is None:
            feats = DynamicScatterVFE(cfg.vfe, cfg.voxel, dtype,
                                      name="voxel_encoder")(scene, train)

        layouts = make_layouts(table.coords, table.valid, cfg.sst, cfg.voxel)
        shift_data = prepare_shift_data(layouts, None, table.valid,
                                        cfg.sst, cfg.voxel)

        x = feats.astype(dtype)
        x = SSTStack(cfg.sst, cfg.num_blocks, dtype, name="encoder")(
            x, shift_data)

        bev = recover_bev(x, table.coords, table.valid, ny, nx)
        stages = SECONDStages(cfg.second, dtype, name="second")(bev, train)
        fpn = SECONDFPN(cfg.fpn, dtype, name="neck")(stages, train)
        if cfg.head_type == "center":
            from .center_head import CenterHead
            return CenterHead(cfg.center_head, dtype, name="bbox_head")(
                fpn, train)
        return Anchor3DHead(cfg.head, dtype, name="bbox_head")(fpn)


class VoxelNet(nn.Module):
    """Hard-voxelization single-stage detector (reference
    ``mmdet3d/models/detectors/voxelnet.py:13-48``): hard voxelize ->
    voxel encoder -> PointPillarsScatter BEV -> SECOND -> FPN -> head.

    ``encoder="pillar"`` uses :class:`PillarFeatureNet` (the PointPillars
    composition — with a sorted VoxelTable the dynamic and hard encoders
    coincide, see ``pillar_encoders.py``); ``encoder="simple"`` runs the
    reference ``HardSimpleVFE`` mean over dense ``[V, T, D]`` buffers from
    :func:`geomae_tpu.ops.voxelize.hard_voxelize`.  The sparse-conv middle
    encoder of the SECOND config family is scoped out (SURVEY §7); the BEV
    scatter stands in as the middle encoder.
    """

    cfg: FinetuneConfig
    encoder: str = "pillar"
    max_points_per_voxel: int = 32

    @nn.compact
    def __call__(self, scene: Scene, train: bool = True) -> HeadOutputs:
        cfg = self.cfg
        table = scene.table
        dtype = jnp.dtype(cfg.compute_dtype)
        ny, nx = cfg.voxel.grid_size

        if self.encoder == "simple":
            from .pillar_encoders import hard_simple_vfe
            from ..ops.voxelize import hard_voxelize
            voxels, npts = jax.vmap(
                lambda s: hard_voxelize(s, self.max_points_per_voxel))(scene)
            feats = hard_simple_vfe(voxels, npts).astype(dtype)
        else:
            from .pillar_encoders import PillarFeatureNet
            feats = PillarFeatureNet(cfg.vfe, cfg.voxel, dtype,
                                     name="voxel_encoder")(scene, train)

        bev = recover_bev(feats.astype(dtype), table.coords, table.valid,
                          ny, nx)
        stages = SECONDStages(cfg.second, dtype, name="second")(bev, train)
        fpn = SECONDFPN(cfg.fpn, dtype, name="neck")(stages, train)
        if cfg.head_type == "center":
            from .center_head import CenterHead
            return CenterHead(cfg.center_head, dtype, name="bbox_head")(
                fpn, train)
        return Anchor3DHead(cfg.head, dtype, name="bbox_head")(fpn)


def extract_scene(cfg: FinetuneConfig, points, point_valid) -> Scene:
    return build_scene_batch(points, point_valid, cfg.voxel,
                             cfg.caps.max_voxels)
