"""Masked segment reductions — the TPU-native replacement for the
reference's CUDA ``DynamicScatter`` / ``scatter_v2``
(``/root/reference/mmdet3d/ops/voxel/scatter_points.py:9-107``,
``mmdet3d/ops/sst/sst_ops.py:8-39``).

Everything is static-shape: segment ids live in ``[0, num_segments)`` and
invalid elements are routed to a trash row at ``num_segments`` which is
sliced off.

Performance note: XLA lowers an *unsorted* TPU scatter-add to an internal
sort, so every reduction here takes ``sorted_ids=True`` when the caller's
ids are ascending — which they are throughout this framework, because
``ops.voxelize.build_scene`` returns points in canonical (pillar, slot)
order.  Routing invalid elements to the trailing trash row preserves
sortedness (invalid points are a suffix of the sorted scene).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _route_invalid(seg_ids: jnp.ndarray, valid: jnp.ndarray | None,
                   num_segments: int) -> jnp.ndarray:
    """Send invalid / out-of-range ids to the trash segment ``num_segments``."""
    seg_ids = seg_ids.astype(jnp.int32)
    ok = (seg_ids >= 0) & (seg_ids < num_segments)
    if valid is not None:
        ok = ok & valid
    return jnp.where(ok, seg_ids, num_segments)


def segment_sum(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid: jnp.ndarray | None = None,
                sorted_ids: bool = False) -> jnp.ndarray:
    """Masked segment sum.  ``data``: [N, ...]; ``seg_ids``: [N]."""
    ids = _route_invalid(seg_ids, valid, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1,
                              indices_are_sorted=sorted_ids)
    return out[:num_segments]


def segment_count(seg_ids: jnp.ndarray, num_segments: int,
                  valid: jnp.ndarray | None = None,
                  sorted_ids: bool = False) -> jnp.ndarray:
    """Number of valid elements per segment, int32 [num_segments]."""
    ids = _route_invalid(seg_ids, valid, num_segments)
    ones = jnp.ones(seg_ids.shape, dtype=jnp.int32)
    out = jax.ops.segment_sum(ones, ids, num_segments=num_segments + 1,
                              indices_are_sorted=sorted_ids)
    return out[:num_segments]


def segment_mean(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                 valid: jnp.ndarray | None = None,
                 sorted_ids: bool = False):
    """Masked segment mean.  Returns ``(mean, count)``; empty segments are 0.

    Matches ``get_centroid_per_voxel`` (reference ``..._ssl.py:728-768``):
    scatter-add then divide by count.  Sum and count fuse into ONE scatter
    by appending a ones column.
    """
    data = data.astype(jnp.float32)   # bf16 counts overflow past 256
    ones = jnp.ones(data.shape[:-1] + (1,), jnp.float32)
    s = segment_sum(jnp.concatenate([data, ones], -1), seg_ids, num_segments,
                    valid, sorted_ids)
    c = s[..., -1]
    denom = jnp.maximum(c, 1.0)
    mean = s[..., :-1] / denom[..., None]
    return mean, c.astype(jnp.int32)


def segment_max(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid: jnp.ndarray | None = None,
                empty_value: float = 0.0,
                sorted_ids: bool = False) -> jnp.ndarray:
    """Masked segment max; empty segments get ``empty_value``.

    Matches ``scatter_v2(..., mode='max')`` semantics used by the VFE
    (reference ``voxel_encoder.py:400-412``).
    """
    ids = _route_invalid(seg_ids, valid, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1,
                              indices_are_sorted=sorted_ids)
    out = out[:num_segments]
    c = segment_count(seg_ids, num_segments, valid, sorted_ids)
    nonempty = (c > 0).reshape(c.shape + (1,) * (out.ndim - 1))
    return jnp.where(nonempty, out, jnp.asarray(empty_value, out.dtype))


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                fill: float = 0.0) -> jnp.ndarray:
    """Gather rows of ``table`` [S, ...] at ``idx`` [N]; idx outside
    ``[0, S)`` returns ``fill`` (broadcast to the row)."""
    S = table.shape[0]
    ok = (idx >= 0) & (idx < S)
    safe = jnp.clip(idx, 0, S - 1)
    rows = table[safe]
    mask = ok.reshape(ok.shape + (1,) * (rows.ndim - 1))
    return jnp.where(mask, rows, jnp.asarray(fill, rows.dtype))
