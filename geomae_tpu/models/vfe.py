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

# Profiling-only knob (tools/profile_vfe_r5.py): trace-time choice of a
# VFE stage to SKIP (wrong outputs, variant-delta timing only).
_VFE_SKIP: str | None = None


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


def _use_transposed(P: int, dtype) -> bool:
    """Channel-major [B, C, P] pipeline gate (GEOMAE_VFE_T=0 disables).

    TPU tiles the two minor dims to (8, 128): a row-major [B, P, C<=16]
    point tensor pads C to 128 LANES, so [4, 262144, 3] f32 physically
    occupies 537 MB and the VFE's decoration chain measured 23.5 ms of
    pure padding traffic on v5e (tools/profile_vfe.py, round 4).  The
    transposed path puts C on sublanes (pad 3 -> 8) and P on lanes, uses
    the ``ops/pallas_segreduce_t`` kernels, and needs bf16 compute for
    the exact max routing (same condition as :func:`_pallas_max_dtype_ok`).
    """
    import os
    if os.environ.get("GEOMAE_VFE_T") == "0":
        return False
    from .sst import _is_tpu_backend
    return _is_tpu_backend() and P % _SEG_CHUNK == 0


class MaskedBatchNormT(nn.Module):
    """Channel-major twin of :class:`~geomae_tpu.models.norm.MaskedBatchNorm`
    — identical param/batch_stats tree, ``x`` is [B, C, P], mask [B, P]."""

    features: int
    momentum: float = 0.01
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,),
                                                  jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,),
                                                jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        xf = x.astype(jnp.float32)
        if train:
            m = mask.astype(jnp.float32)[:, None, :]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xm = xf * m
            mean = jnp.sum(xm, axis=(0, 2)) / cnt
            var = jnp.maximum(
                jnp.sum(xm * xf, axis=(0, 2)) / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        a = (scale * inv).astype(x.dtype)[None, :, None]
        b = ((bias - mean * scale * inv)
             .astype(x.dtype))[None, :, None]
        return x * a + b


class TransposedDense(nn.Module):
    """Channel-major Dense twin — same param tree as ``nn.Dense`` (kernel
    [Cin, Cout] at ``<name>/kernel``), input/output [B, C, P]."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kern = self.param("kernel", torch_linear_init,
                          (x.shape[1], self.features))
        return jnp.einsum("co,bcp->bop", kern.astype(self.dtype),
                          x.astype(self.dtype))


class DynamicVFELayerT(nn.Module):
    """Channel-major twin of :class:`DynamicVFELayer` (same param tree)."""

    out_channels: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = TransposedDense(self.out_channels, self.dtype,
                            name="linear")(x)
        x = MaskedBatchNormT(self.out_channels, self.bn_momentum,
                             self.bn_eps, name="norm")(x, mask, train)
        return nn.relu(x)


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

        if (_use_transposed(points.shape[1], self.dtype)
                and jnp.dtype(self.dtype) == jnp.bfloat16):
            return self._forward_t(scene, train)

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

    def _forward_t(self, scene: Scene, train: bool) -> jnp.ndarray:
        """Channel-major pipeline (see :func:`_use_transposed`): identical
        math/params to the row-major branch, point tensors as [B, C, P]."""
        from ..ops.pallas_segreduce_t import (segment_broadcast_t,
                                              segment_reduce_t)

        table = scene.table
        v_cap = table.valid.shape[-1]
        p2v = table.point2voxel
        pv = scene.valid
        pvn = pv[:, None, :]
        pts_t = jnp.swapaxes(scene.points, 1, 2)       # [B, 5, P]
        xyz_t = pts_t[:, :3]

        feats = [pts_t]
        if self.cfg.with_cluster_center:
            d = jnp.where(pvn, xyz_t, 0.0).astype(jnp.float32)
            if _VFE_SKIP == "mean":
                pmean = d + 1.0
            else:
                pmean = segment_broadcast_t(d, p2v, v_cap, "mean",
                                            _SEG_CHUNK)
            feats.append(xyz_t - pmean.astype(pts_t.dtype))
        if self.cfg.with_voxel_center:
            # per-axis low_voxel_coords formula (ops/voxelize.py:84-95)
            r = self.voxel.point_cloud_range
            vx, vy, vz = self.voxel.voxel_size
            _, ry, rx = self.voxel.sub_voxel_ratio_low
            ny, nx = self.voxel.grid_size
            px_t, py_t = pts_t[:, 0:1], pts_t[:, 1:2]
            lx = jnp.clip(jnp.floor(
                (px_t.astype(jnp.float32) - r[0]) / (vx / rx)
            ).astype(jnp.int32), 0, nx * rx - 1)
            ly = jnp.clip(jnp.floor(
                (py_t.astype(jnp.float32) - r[1]) / (vy / ry)
            ).astype(jnp.int32), 0, ny * ry - 1)
            incap = (p2v < v_cap)[:, None, :]
            pyc = jnp.where(incap, ly // ry, 0).astype(pts_t.dtype)
            pxc = jnp.where(incap, lx // rx, 0).astype(pts_t.dtype)
            fc = jnp.concatenate([
                px_t - (pxc * vx + (vx / 2 + r[0])),
                py_t - (pyc * vy + (vy / 2 + r[1])),
                pts_t[:, 2:3] - (vz / 2 + r[2]),
            ], axis=1)
            feats.append(fc)
        if self.cfg.with_distance:
            feats.append(jnp.linalg.norm(xyz_t, axis=1, keepdims=True))
        x = jnp.concatenate(feats, axis=1)
        x = jnp.where(pvn, x, 0.0).astype(self.dtype)
        x = jax.lax.stop_gradient(x)

        neutral = jnp.asarray(-3.0e38, self.dtype)
        chans = list(self.cfg.feat_channels)
        for i, ch in enumerate(chans):
            x = DynamicVFELayerT(ch, self.cfg.bn_eps, self.cfg.bn_momentum,
                                 self.dtype, name=f"vfe_{i}")(x, pv, train)
            if i != len(chans) - 1:
                d = jnp.where(pvn, x, neutral)
                if _VFE_SKIP == "maxb":
                    mb = d + 1.0
                else:
                    mb = segment_broadcast_t(d, p2v, v_cap, "max",
                                             _SEG_CHUNK)
                mb = jnp.where(pvn, mb, 0).astype(self.dtype)
                x = jnp.concatenate([x, mb], axis=1)
            else:
                d = jnp.where(pvn, x, neutral)
                if _VFE_SKIP == "final":
                    vmax = d[:, :, :v_cap].astype(jnp.float32)
                else:
                    vmax = segment_reduce_t(d, p2v, v_cap, True,
                                            _SEG_CHUNK)
                vmax = jnp.where(table.valid[:, None, :], vmax, 0.0)

        return jnp.swapaxes(vmax, 1, 2).astype(self.dtype)


# The reference's canvas-based ``DynamicVFE`` (``voxel_encoder.py:93-305``)
# and ``DynamicScatterVFE`` (``:309-419``) are the same encoder: the
# subclass docstring says "Same with DynamicVFE but use torch_scatter to
# avoid construct canvas in map_voxel_center_to_point".  The canvas is
# purely a gather-back mechanism (scatter voxel row ids into a dense
# (b, z, y, x) canvas, gather per point); our sorted-segment broadcast
# implements the identical mapping, so one class serves both registry
# names.  Only consumer of the canvas variant: the experimental
# SwinSparseFormer ``occ.py`` config.
DynamicVFE = DynamicScatterVFE
