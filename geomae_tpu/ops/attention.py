"""Band-masked windowed attention.

The compute core of SST's ``WindowAttention``
(``/root/reference/mmdet3d/models/sst/sst_basic_block.py:26-61``), re-designed
for TPU.  The reference scatters tokens into per-drop-level
``[num_win, max_tokens, C]`` buffers and runs ``nn.MultiheadAttention`` per
bucket; here tokens are *sorted by window id* (see ``ops/windows.py``) and
each tile of 128 sorted queries attends to a band of neighboring tiles,
masked to same-window pairs.  Since a window holds <=144 tokens, a band of
±2 tiles (±256 positions) always covers the whole window, so this is exact
windowed attention with zero drops — and it keeps tokens flat in HBM
(no gather/scatter into window buffers per layer).

v0 is pure ``jnp.einsum`` (XLA fuses well at these sizes); a fused Pallas
kernel with the same signature lives in ``ops/pallas_attention.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_TILE = 128
DEFAULT_NBANDS = 2
_PAD_WIN = -1  # band padding sentinel; never equals a real window id
_NEG = -1e9


def _band_gather(x: jnp.ndarray, tile: int, nbands: int, fill) -> jnp.ndarray:
    """[B, V, ...] -> [B, nt, (2*nbands+1)*tile, ...] band view (copies)."""
    B, V = x.shape[:2]
    nt = V // tile
    w = 2 * nbands + 1
    pad = nbands * tile
    pad_widths = [(0, 0), (pad, pad)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad_widths, constant_values=fill)
    parts = [
        xp[:, o * tile: o * tile + V].reshape((B, nt, tile) + x.shape[2:])
        for o in range(w)
    ]
    return jnp.concatenate(parts, axis=2)


def band_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   win_id: jnp.ndarray,
                   key_valid: jnp.ndarray | None = None,
                   tile: int = DEFAULT_TILE,
                   nbands: int = DEFAULT_NBANDS) -> jnp.ndarray:
    """Windowed attention over window-sorted tokens.

    Args:
      q, k, v: [B, V, H, D] in *sorted* order (same layout).
      win_id:  int32 [B, V] — window id per sorted position; padding rows
               hold INT32_MAX.
      key_valid: optional bool [B, V] — extra key mask (e.g. MAE visibility).
      tile, nbands: band geometry; (2*nbands)*tile must be >= the max window
               occupancy (144 for 12x12 pillar windows).

    Returns: [B, V, H, D].  Rows whose key set is empty return 0.
    """
    B, V, H, D = q.shape
    assert V % tile == 0, f"V={V} must be a multiple of tile={tile}"
    nt = V // tile
    scale = 1.0 / (D ** 0.5)

    q_t = q.reshape(B, nt, tile, H, D)
    k_b = _band_gather(k, tile, nbands, 0)
    v_b = _band_gather(v, tile, nbands, 0)
    win_q = win_id.reshape(B, nt, tile)
    win_k = _band_gather(win_id, tile, nbands, _PAD_WIN)

    mask = win_q[:, :, :, None] == win_k[:, :, None, :]
    if key_valid is not None:
        kv_b = _band_gather(key_valid, tile, nbands, False)
        mask = mask & kv_b[:, :, None, :]

    scores = jnp.einsum("bnqhd,bnkhd->bnhqk", q_t, k_b,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[:, :, None], scores, _NEG)
    scores = scores - jax.lax.stop_gradient(
        jnp.max(scores, axis=-1, keepdims=True))
    # keep the [.., q, k] weight buffer in the compute dtype (bf16 on TPU)
    # and normalize AFTER the AV matmul — halves the largest transient and
    # lets XLA fuse the exp into the einsum epilogue.
    w = jnp.exp(scores).astype(v.dtype)
    w = jnp.where(mask[:, :, None], w, 0)
    denom = jnp.sum(w.astype(jnp.float32), axis=-1)        # [B, nt, H, q]
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", w, v_b,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(denom, 1e-20).transpose(0, 1, 3, 2)[..., None]
    return out.reshape(B, V, H, D).astype(v.dtype)
