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


_SEG_CHUNK = 512


def _use_pallas(P: int) -> bool:
    """Default ON on TPU (GEOMAE_PALLAS_SEGREDUCE=0 disables): the
    one-pass reduce kernels measure sum 2.9 ms / max 4.4 ms at
    [4, 262k, 128] on v5e once the one-hot is built in natural [T, out]
    orientation (the transposed construction forced a sublane->lane
    relayout of the id vector per grid step — 31 us/step, the entire
    former 71/104 ms cost).  The scan path remains the CPU/fallback."""
    import os
    if os.environ.get("GEOMAE_PALLAS_SEGREDUCE") == "0":
        return False
    from .sst import _is_tpu_backend
    return _is_tpu_backend() and P % _SEG_CHUNK == 0


def _gather_use_pallas(P: int) -> bool:
    """The gather kernel's grid steps are independent (no accumulator
    chain), pipeline fully, and measure 0.9 ms — default ON on TPU
    (GEOMAE_PALLAS_GATHER=0 disables)."""
    import os
    if os.environ.get("GEOMAE_PALLAS_GATHER") == "0":
        return False
    from .sst import _is_tpu_backend
    return _is_tpu_backend() and P % _SEG_CHUNK == 0


def _mean_bcast_b(data, seg, num, valid):
    """Per-point segment-mean broadcast (one fused pallas call on TPU;
    reduce + gather-back elsewhere).  Sentinel/invalid rows return 0."""
    if _use_pallas(data.shape[1]):
        from ..ops.pallas_segreduce import segment_broadcast_pallas
        d = jnp.where(valid[..., None], data, 0).astype(jnp.float32)
        return segment_broadcast_pallas(d, seg, num, "mean",
                                        _SEG_CHUNK).astype(data.dtype)

    def one(d, s, v):
        m, _ = scatter.segment_mean(jnp.where(v[:, None], d, 0), s, num, v,
                                    sorted_ids=True)
        return scatter.take_rows_sorted(m, s)
    return jax.vmap(one)(data, seg, valid)


def _pallas_max_dtype_ok(dtype) -> bool:
    """Pallas max kernels only for bf16 payloads: they route values
    through MXU dots whose f32 operands truncate to bf16, so f32 maxima
    come back inexact on real hardware — silently breaking the
    argmax-equality VJP (interpret-mode tests compute exact f32 and
    cannot catch it).  bf16-born payloads are bit-exact through the same
    dots.  Tests monkeypatch this under interpret mode."""
    return jnp.dtype(dtype) == jnp.bfloat16


def _max_bcast_b(data, seg, num, valid):
    """Per-point segment-max broadcast; invalid/empty rows return 0."""
    if _use_pallas(data.shape[1]) and _pallas_max_dtype_ok(data.dtype):
        from ..ops.pallas_segreduce import segment_broadcast_pallas
        neutral = jnp.asarray(-3.0e38, data.dtype)
        d = jnp.where(valid[..., None], data, neutral)
        out = segment_broadcast_pallas(d, seg, num, "max", _SEG_CHUNK)
        return jnp.where(valid[..., None], out, 0).astype(data.dtype)

    def one(d, s, v):
        m = scatter.segment_max(d, s, num, v, sorted_ids=True)
        return scatter.take_rows_sorted(m, s)
    return jax.vmap(one)(data, seg, valid)


def _seg_mean_b(data, seg, num, valid, row_valid):
    """Batched masked segment mean over ASCENDING ids.

    On TPU this is one Pallas pass (``ops.pallas_segreduce``); elsewhere the
    scan-based path.  Invalid points contribute 0 via masking (their ids
    route to the trailing suffix anyway).  ``row_valid`` zeroes rows the
    kernel never writes (it only initializes rows up to the last closed
    segment; trailing rows are HBM garbage by contract)."""
    if _use_pallas(data.shape[1]):
        from ..ops.pallas_segreduce import segment_reduce_pallas
        d = jnp.where(valid[..., None], data, 0).astype(jnp.float32)
        ones = valid[..., None].astype(jnp.float32)
        s4 = segment_reduce_pallas(jnp.concatenate([d, ones], -1), seg, num,
                                   False, _SEG_CHUNK)
        cnt = jnp.maximum(s4[..., -1:], 1.0)
        out = (s4[..., :-1] / cnt).astype(data.dtype)
        return jnp.where(row_valid[..., None], out, 0)
    return jax.vmap(lambda d, s, v: scatter.segment_mean(
        d, s, num, v, sorted_ids=True)[0])(data, seg, valid)


def _seg_max_b(data, seg, num, valid, row_valid):
    """Batched masked segment max; empty/garbage rows become 0 like
    ``ops.scatter.segment_max(empty_value=0)`` so the gather-back concat
    never feeds non-finite values into the next Dense layer.

    bf16-only on the Pallas route (:func:`_pallas_max_dtype_ok`); f32
    payloads take the exact scan path."""
    if _use_pallas(data.shape[1]) and _pallas_max_dtype_ok(data.dtype):
        from ..ops.pallas_segreduce import segment_reduce_pallas
        neutral = jnp.asarray(-3.0e38, data.dtype)
        d = jnp.where(valid[..., None], data, neutral)
        out = segment_reduce_pallas(d, seg, num, True, _SEG_CHUNK)
        return jnp.where(row_valid[..., None], out.astype(data.dtype), 0)
    return jax.vmap(lambda d, s, v: scatter.segment_max(
        d, s, num, v, sorted_ids=True))(data, seg, valid)


def _gather_b(table, idx):
    """Broadcast table rows back to (sorted) points.  One-pass Pallas
    window-gather on TPU — measured 0.9 ms at [4, 262k, 128] on v5e (its
    grid steps are independent, so the pipeline overlaps DMA + routing
    matmuls; XLA row gathers run ~25 M rows/s).  Sentinel ids (== table
    length) return 0 on both paths.  On CPU ``take_rows_sorted`` gives
    the gather a cumsum-based backward (idx = p2v ascending)."""
    if _gather_use_pallas(idx.shape[1]):
        from ..ops.pallas_segreduce import segment_gather_pallas
        return segment_gather_pallas(table, idx, _SEG_CHUNK)
    return jax.vmap(scatter.take_rows_sorted)(table, idx)


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
            # fused mean+broadcast: the cluster center arrives per POINT in
            # one pallas call (the [V, 3] table never round-trips HBM)
            pmean = _mean_bcast_b(xyz, p2v, v_cap, point_valid)
            feats.append(xyz - pmean)
        if self.cfg.with_voxel_center:
            # pillar centers ELEMENTWISE from each point's own coords —
            # identical to the table row's coords (same floor + clamp
            # formula, ops/voxelize.low_voxel_coords), no gather needed
            from ..ops.voxelize import low_voxel_coords
            _, ry, rx = self.voxel.sub_voxel_ratio_low
            low = jax.vmap(lambda p: low_voxel_coords(p, self.voxel))(
                points[..., :3])
            # overflow/sentinel rows mirror the old table-gather semantics
            # (gather at sentinel returned 0 coords)
            incap = (p2v < v_cap)
            py = jnp.where(incap, low[..., 1] // ry, 0).astype(points.dtype)
            px = jnp.where(incap, low[..., 2] // rx, 0).astype(points.dtype)
            r = self.voxel.point_cloud_range
            vx, vy, vz = self.voxel.voxel_size
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
        # the decorations are parameter-free functions of the scene: no
        # gradient flows upstream, so cut the (pallas-backed) backward of
        # the mean/gather chain out of the step graph entirely
        x = jax.lax.stop_gradient(x)

        chans = list(self.cfg.feat_channels)
        for i, ch in enumerate(chans):
            x = DynamicVFELayer(ch, self.cfg.bn_eps, self.cfg.bn_momentum,
                                self.dtype, name=f"vfe_{i}")(
                                    x, point_valid, train)
            if i != len(chans) - 1:
                # fused max+broadcast (one call instead of reduce+gather)
                x = jnp.concatenate(
                    [x, _max_bcast_b(x, p2v, v_cap, point_valid)], axis=-1)
            else:
                vmax = _seg_max_b(x, p2v, v_cap, point_valid, table.valid)

        return jnp.where(table.valid[..., None], vmax, 0.0)
