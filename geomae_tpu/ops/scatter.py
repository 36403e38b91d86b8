"""Masked segment reductions — the TPU-native replacement for the
reference's CUDA ``DynamicScatter`` / ``scatter_v2``
(``/root/reference/mmdet3d/ops/voxel/scatter_points.py:9-107``,
``mmdet3d/ops/sst/sst_ops.py:8-39``).

Everything is static-shape: segment ids live in ``[0, num_segments)`` and
invalid elements are routed to a trash row at ``num_segments`` which is
sliced off.  XLA lowers ``jax.ops.segment_*`` to scatter-adds that run well
on TPU; no sort is required for the reductions themselves.
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
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked segment sum.  ``data``: [N, ...]; ``seg_ids``: [N]."""
    ids = _route_invalid(seg_ids, valid, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(seg_ids: jnp.ndarray, num_segments: int,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Number of valid elements per segment, int32 [num_segments]."""
    ids = _route_invalid(seg_ids, valid, num_segments)
    ones = jnp.ones(seg_ids.shape, dtype=jnp.int32)
    out = jax.ops.segment_sum(ones, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                 valid: jnp.ndarray | None = None):
    """Masked segment mean.  Returns ``(mean, count)``; empty segments are 0.

    Matches ``get_centroid_per_voxel`` (reference ``..._ssl.py:728-768``):
    scatter-add then divide by count.
    """
    s = segment_sum(data, seg_ids, num_segments, valid)
    c = segment_count(seg_ids, num_segments, valid)
    denom = jnp.maximum(c, 1).astype(s.dtype)
    mean = s / denom.reshape(denom.shape + (1,) * (s.ndim - 1))
    return mean, c


def segment_max(data: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid: jnp.ndarray | None = None,
                empty_value: float = 0.0) -> jnp.ndarray:
    """Masked segment max; empty segments get ``empty_value``.

    Matches ``scatter_v2(..., mode='max')`` semantics used by the VFE
    (reference ``voxel_encoder.py:400-412``).
    """
    ids = _route_invalid(seg_ids, valid, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    c = segment_count(seg_ids, num_segments, valid)
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
