"""SST transformer blocks over band-sorted windows.

Rebuild of ``BasicShiftBlock`` / ``EncoderLayer`` / ``WindowAttention``
(``/root/reference/mmdet3d/models/sst/sst_basic_block.py:13-147``) on top of
the band attention core (``ops/attention.py``).  Matching the reference:

* positional embedding is added to q and k only, not v (``:47-52``);
* post-norm residual layout: x + attn -> LN -> x + FFN -> LN (``:94-100``);
* each ``BasicShiftBlock`` runs two EncoderLayers alternating the
  non-shifted / shifted window layout (``:129-145``);
* GELU FFN, LayerNorm eps 1e-5 (torch defaults), dropout 0 (config).

Tokens stay flat [B, V, C]; per layer we gather into the shift's
window-sorted order, attend within the band, and scatter back via the
inverse permutation — instead of the reference's flat2window/window2flat
scatters into per-drop-level buffers.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import SSTConfig
from ..ops.attention import band_attention
from ..ops.windows import WindowLayout
from .norm import FastLayerNorm


def _take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: x [B, V, ...], idx [B, V]."""
    if x.ndim == idx.ndim:
        return jnp.take_along_axis(x, idx, axis=1)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)), axis=1)


def _permute(x: jnp.ndarray, perm: jnp.ndarray,
             inv_perm: jnp.ndarray) -> jnp.ndarray:
    """Batched permutation/injection gather with inverse-gather backward.

    ``gather_injective`` reads 0 at INT32_MAX sentinels, which makes the
    same helper serve both the band layout (true permutations) and the
    tile-packed layout (injections into a [V_pack] slot space with
    holes)."""
    from ..ops.scatter import gather_injective
    return jax.vmap(gather_injective)(x, perm, inv_perm)


def _take_idx(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched int index-table gather: sentinel (INT32_MAX) propagates."""
    V = tab.shape[1]
    safe = jnp.minimum(idx, V - 1)
    got = jnp.take_along_axis(tab, safe, axis=1)
    return jnp.where(idx == INT32_MAX, INT32_MAX, got)


def prepare_shift_data(layouts: Sequence[WindowLayout],
                       pos_embeds: Sequence[jnp.ndarray],
                       key_valid: jnp.ndarray,
                       sst: SSTConfig | None = None,
                       voxel=None):
    """Per-shift sorted tensors + COMPOSED inter-layer permutations.

    Tokens stay in window-sorted order BETWEEN layers: each block enters
    in the last shift's order, every layer applies one composed
    permutation from the previous layer's order (``x_b = x_a[inv_a[
    perm_b]]``), and only the stack boundary permutes row-order tokens in
    and out.  This halves the permutation gathers of the
    permute-attend-unpermute layout (each [4, 20480, 128] permute is
    ~0.8 ms on v5e; the reference instead scatters into per-window
    buffers every layer, ``sst_ops.flat2window``).

    Args:
      layouts: per-shift batched WindowLayouts.
      pos_embeds: per-shift [B, V, C] in row order, or None — then the
        embedding is computed AFTER sorting from each layout's 2-channel
        ``coors_in_win`` (requires ``sst``); permuting 2 coord channels
        and embedding elementwise beats permuting 128 embedded channels.
      key_valid: [B, V] bool in row order (valid & visible tokens).
    Returns dict(layers=[per-shift dicts], entry=(perm, inv),
    cross=[per-layer (perm, inv) or None]).
    """
    from ..ops.scatter import gather_rows
    from ..ops.windows import positional_embedding
    layers = []
    for s_i, lay in enumerate(layouts):
        # sentinel-safe gathers (tile-packed layouts have hole slots):
        # holes read coords 0 / key_valid False — they match no query
        # window, so the attention mask removes them regardless
        ciw_sorted = jax.vmap(gather_rows)(lay.coors_in_win, lay.perm)
        if pos_embeds is None:
            pos_sorted = positional_embedding(ciw_sorted, sst)
        else:
            pos_sorted = jax.vmap(gather_rows)(pos_embeds[s_i], lay.perm)
        kv_sorted = jax.vmap(gather_rows)(
            key_valid[..., None].astype(jnp.float32), lay.perm)[..., 0] > 0.5
        S = lay.win_id.shape[-1]
        iota = jnp.arange(S, dtype=jnp.int32)
        extent = jnp.max(jnp.where(lay.win_id != INT32_MAX, iota + 1, 0),
                         axis=-1).astype(jnp.int32)      # [B] last real +1
        layers.append(dict(
            win_id=lay.win_id,
            pos_sorted=pos_sorted,
            key_valid_sorted=kv_sorted,
            extent=extent,
        ))
    n = len(layers)
    last = (2 - 1) % n            # order blocks start from (= s_{1%n})
    entry = (layouts[last].perm, layouts[last].inv_perm)

    def compose(a, b):            # tokens in order a -> order b
        if a is b:
            return None
        perm = _take_idx(a.inv_perm, b.perm)
        inv = _take_idx(b.inv_perm, a.perm)
        return (perm, inv)

    orders = [layouts[0], layouts[1 % n]]
    cross = [compose(orders[-1], orders[0]), compose(orders[0], orders[1])]
    return dict(layers=layers, entry=entry, cross=cross)


INT32_MAX = jnp.iinfo(jnp.int32).max


def _is_tpu_backend() -> bool:
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in d.platform.lower() or "TPU" in getattr(
        d, "device_kind", "")


def _tilepack_pad_tile(band_layout: str, V: int):
    """(pad, tile) for the banded attention kernels.

    With the tile-packed layout pad=0 requires tile == PACK_TILE: packing
    aligns windows to PACK_TILE boundaries only, so any other tile can
    split a window across tiles and the pad-0 band would drop attention
    mass.  Shapes are static, so these are trace-time asserts."""
    from ..ops.pallas_attention import DEFAULT_PAD
    from ..ops.windows import PACK_TILE
    if band_layout == "tilepack":
        if V % PACK_TILE != 0:
            raise ValueError(
                f"tilepack requires the packed slot space ({V}) to be a "
                f"multiple of PACK_TILE={PACK_TILE}; pick max_voxels so "
                f"2*V divides {PACK_TILE}")
        return 0, PACK_TILE
    return DEFAULT_PAD, (256 if V % 256 == 0 else 128)


def _select_attention(impl: str, layer_data: dict | None = None):
    """Pick the attention backend: "qkv" (band kernels with in-kernel
    q/k/v projections — what "auto" resolves to on TPU; measured v5e
    round 4: 13.34 vs 13.13 band / 12.14 xla-ffn samples/s on the full
    step), "pallas"/"band" (band kernels, projections in XLA — the
    quarantined fallback), or None (einsum).  The bin-packed variant
    (round 3) measured slower twice and was deleted."""
    if impl == "einsum":
        return None
    if impl == "qkv" or (impl == "auto" and _is_tpu_backend()):
        from ..ops.pallas_attention_qkv import band_attention_qkv
        return "qkv", band_attention_qkv
    if impl in ("pallas", "band"):
        from ..ops.pallas_attention import band_attention_pallas
        return "band", band_attention_pallas
    return None


def _use_fused_ffn(cfg: SSTConfig, V: int, C: int) -> bool:
    """Fused post-attention block gate: gelu only, 128-aligned shapes;
    "auto" resolves to the TPU backend (interpret mode drives CPU tests
    via ``ffn_impl="fused"``)."""
    if cfg.ffn_impl == "xla" or cfg.activation != "gelu":
        return False
    if C % 128 != 0 or V % 128 != 0:
        return False
    if cfg.ffn_impl == "fused":
        return True
    # measured v5e (round 4, bench.py full step): fused 13.13 vs xla
    # 12.14 samples/s -> "auto" resolves to the fused block on TPU
    return _is_tpu_backend()


class _DenseParams(nn.Module):
    """Declares Dense-compatible params (kernel/bias) without applying
    them — the fused block consumes weights directly."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _GroupedDenseParams(nn.Module):
    groups: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (self.groups, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros,
                       (self.groups, self.features))
        return k, b


class _LNParams(nn.Module):
    features: int
    groups: int = 0      # 0: ungrouped [C]; else [G, C]

    @nn.compact
    def __call__(self):
        shape = ((self.groups, self.features) if self.groups
                 else (self.features,))
        return (self.param("scale", nn.initializers.ones, shape),
                self.param("bias", nn.initializers.zeros, shape))


class WindowMHA(nn.Module):
    """Multi-head attention with torch ``nn.MultiheadAttention`` param
    layout (fused qkv projection + out projection).

    With ``fuse_ffn`` the out-projection params are declared (same tree
    path) but NOT applied; the raw attention output and (Wo, bo) are
    returned for the fused post-attention block."""

    d_model: int
    nhead: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    fuse_ffn: bool = False
    band_layout: str = "band"

    @nn.compact
    def __call__(self, x_s: jnp.ndarray, layer_data: dict) -> jnp.ndarray:
        """``x_s`` arrives ALREADY in this layer's window-sorted order
        (the block applies the composed inter-layer permutation)."""
        B, V, C = x_s.shape
        H = self.nhead
        D = C // H
        pos = layer_data["pos_sorted"].astype(x_s.dtype)
        fused = _select_attention(self.attention_impl, layer_data)
        # Mosaic tiling: needs 128-lane channel dim (+ whole tiles: band)
        if fused is not None and (C % 128 != 0 or
                                  (fused[0] in ("band", "qkv")
                                   and V % 128 != 0)):
            fused = None
        if fused is not None and fused[0] == "qkv":
            from ..ops.pallas_attention import DEFAULT_PAD
            # tilepack: windows never straddle PACK_TILE boundaries, so the
            # overlap band (pad) vanishes — score width 256 instead of 640.
            # pad=0 is only sound when the attention tile IS the packing
            # tile: a smaller tile would split size-256 windows across
            # tiles and silently drop attention mass (ADVICE r4).
            pad, tile = _tilepack_pad_tile(self.band_layout, V)
            # in-kernel projections: declare Dense-compatible params only
            dp = lambda name: _DenseParams(C, C, name=name)()
            wq, bq = dp("q_proj")
            wk, bk = dp("k_proj")
            wv, bv = dp("v_proj")
            out = fused[1](x_s, pos, wq[None], bq[None], wk[None], bk[None],
                           wv[None], bv[None], layer_data["win_id"],
                           layer_data["key_valid_sorted"], H, tile,
                           pad, not _is_tpu_backend())
            if self.fuse_ffn:
                wo, bo = _DenseParams(C, C, name="out_proj")()
                return out, (wo, bo)
            return nn.Dense(C, dtype=self.dtype, name="out_proj",
                            kernel_init=nn.initializers.xavier_uniform())(out)
        qk_in = x_s + pos

        # torch fuses q,k,v into one in_proj; we keep three kernels (same
        # math: q,k see x+pos, v sees x — reference sst_basic_block.py:45-52)
        q = nn.Dense(C, dtype=self.dtype, name="q_proj",
                     kernel_init=nn.initializers.xavier_uniform())(qk_in)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj",
                     kernel_init=nn.initializers.xavier_uniform())(qk_in)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj",
                     kernel_init=nn.initializers.xavier_uniform())(x_s)

        q = q.reshape(B, V, H, D)
        k = k.reshape(B, V, H, D)
        v = v.reshape(B, V, H, D)
        if fused is not None:
            # tile 256 measured 2.5x faster than 128 on v5e (fewer grid
            # steps, larger matmuls/DMAs); 512 regresses (VPU-heavy tiles)
            tile = 256 if V % 256 == 0 else 128
            out = fused[1](q, k, v, layer_data["win_id"],
                           layer_data["key_valid_sorted"], tile)
        else:
            out = band_attention(q, k, v, layer_data["win_id"],
                                 key_valid=layer_data["key_valid_sorted"])
        out = out.reshape(B, V, C)
        if self.fuse_ffn:
            wo, bo = _DenseParams(C, C, name="out_proj")()
            return out, (wo, bo)
        return nn.Dense(C, dtype=self.dtype, name="out_proj",
                        kernel_init=nn.initializers.xavier_uniform())(out)


class EncoderLayer(nn.Module):
    """Attention + FFN with post-norm residuals (reference ``:84-102``).
    Operates on tokens in THIS layer's window-sorted order (residuals,
    LN and FFN are per-token, so order is free)."""

    cfg: SSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer_data: dict) -> jnp.ndarray:
        c = self.cfg
        B, V, C = x.shape
        fused = _use_fused_ffn(c, V, C)
        a = WindowMHA(c.d_model, c.nhead, self.dtype, c.attention_impl,
                      fuse_ffn=fused, band_layout=c.band_layout,
                      name="win_attn")(x, layer_data)
        if fused:
            raw, (wo, bo) = a
            s1, t1 = _LNParams(C, name="norm1")()
            w1, b1 = _DenseParams(C, c.dim_feedforward, name="linear1")()
            w2, b2 = _DenseParams(c.dim_feedforward, C, name="linear2")()
            s2, t2 = _LNParams(C, name="norm2")()
            from ..ops.pallas_ffn import post_attention_block
            tile = 256 if V % 256 == 0 else 128
            g = lambda p: p[None]
            return post_attention_block(
                x, raw, g(wo), g(bo), g(s1), g(t1), g(w1), g(b1), g(w2),
                g(b2), g(s2), g(t2), layer_data.get("extent"), 1e-5, tile,
                not _is_tpu_backend())
        # custom-VJP LayerNorm: f32 statistics, compute-dtype residual
        # stream, compact backward residuals (models/norm.py)
        x = FastLayerNorm(epsilon=1e-5, name="norm1")(x + a)
        # torch F.gelu is the exact erf form; flax defaults to the tanh
        # approximation — exact keeps forward parity with the reference
        act = ((lambda t: nn.gelu(t, approximate=False))
               if c.activation == "gelu" else nn.relu)
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear1")(x)
        h = nn.Dense(c.d_model, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear2")(act(h))
        return FastLayerNorm(epsilon=1e-5, name="norm2")(x + h)


class BasicShiftBlock(nn.Module):
    """Two encoder layers: non-shifted then shifted windows.

    Enters (and leaves) with tokens in the LAST shift's sorted order;
    each layer applies the composed permutation from the previous
    layer's order (half the gathers of permute-attend-unpermute)."""

    cfg: SSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, shift_datas) -> jnp.ndarray:
        layers = shift_datas["layers"]
        n = len(layers)
        for i in range(2):
            cross = shift_datas["cross"][i]
            if cross is not None:
                x = _permute(x, cross[0], cross[1])
            x = EncoderLayer(self.cfg, self.dtype, name=f"encoder_{i}")(
                x, layers[i % n])
        return x


# ---------------------------------------------------------------------------
# grouped variants: G independent branches batched through ONE stack
# ---------------------------------------------------------------------------
#
# The GeoMAE decoder runs TWO parameter-independent SST stacks over the
# SAME tokens (reference backbone :236-303).  Running them as separate
# stacks doubles every kernel launch; here the branch axis rides the
# batch ([G*B, V, C]) so attention/permutes/LN see one double-size call,
# and only the projections carry per-branch parameters (einsum with a
# leading group axis).


class GroupedDense(nn.Module):
    """Per-branch Dense over ``x`` [G*B, V, Cin] with kernel [G, Cin, F]."""

    groups: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        GB, V, C = x.shape
        G = self.groups
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (G, C, self.features))
        b = self.param("bias", nn.initializers.zeros, (G, self.features))
        xg = x.reshape(G, GB // G, V, C)
        y = jnp.einsum("gbvc,gcf->gbvf", xg, k.astype(self.dtype),
                       optimize=True) + b.astype(self.dtype)[:, None, None]
        return y.reshape(GB, V, self.features)


class GroupedLayerNorm(nn.Module):
    """Per-branch LayerNorm over [G*B, V, C] (scale/bias [G, C])."""

    groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .norm import fast_layer_norm

        GB, V, C = x.shape
        G = self.groups
        scale = self.param("scale", nn.initializers.ones, (G, C))
        bias = self.param("bias", nn.initializers.zeros, (G, C))
        y = fast_layer_norm(x.reshape(G, GB // G, V, C),
                            scale[:, None, None], bias[:, None, None],
                            self.epsilon)
        return y.reshape(GB, V, C)


class GroupedWindowMHA(nn.Module):
    """WindowMHA with per-branch projections; attention itself is
    parameter-free, so the fused kernel sees one [G*B] batch."""

    groups: int
    d_model: int
    nhead: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    fuse_ffn: bool = False
    band_layout: str = "band"

    @nn.compact
    def __call__(self, x_s: jnp.ndarray, layer_data: dict) -> jnp.ndarray:
        GB, V, C = x_s.shape
        H = self.nhead
        D = C // H
        G = self.groups
        pos = layer_data["pos_sorted"].astype(x_s.dtype)
        fused = _select_attention(self.attention_impl, layer_data)
        if fused is not None and (C % 128 != 0 or
                                  (fused[0] in ("band", "qkv")
                                   and V % 128 != 0)):
            fused = None
        if fused is not None and fused[0] == "qkv":
            pad, tile = _tilepack_pad_tile(self.band_layout, V)
            # tokens are group-major [G*B, V, C]; weights ride [G, C, C]
            gp = lambda name: _GroupedDenseParams(G, C, C, name=name)()
            wq, bq = gp("q_proj")
            wk, bk = gp("k_proj")
            wv, bv = gp("v_proj")
            out = fused[1](x_s, pos, wq, bq, wk, bk, wv, bv,
                           layer_data["win_id"],
                           layer_data["key_valid_sorted"], H, tile,
                           pad, not _is_tpu_backend())
            if self.fuse_ffn:
                wo, bo = _GroupedDenseParams(G, C, C, name="out_proj")()
                return out, (wo, bo)
            return GroupedDense(G, C, self.dtype, name="out_proj")(out)
        qk_in = x_s + pos
        dense = lambda name: GroupedDense(G, C, self.dtype, name=name)
        q = dense("q_proj")(qk_in).reshape(GB, V, H, D)
        k = dense("k_proj")(qk_in).reshape(GB, V, H, D)
        v = dense("v_proj")(x_s).reshape(GB, V, H, D)
        if fused is not None:
            tile = 256 if V % 256 == 0 else 128
            out = fused[1](q, k, v, layer_data["win_id"],
                           layer_data["key_valid_sorted"], tile)
        else:
            out = band_attention(q, k, v, layer_data["win_id"],
                                 key_valid=layer_data["key_valid_sorted"])
        if self.fuse_ffn:
            wo, bo = _GroupedDenseParams(G, C, C, name="out_proj")()
            return out.reshape(GB, V, C), (wo, bo)
        return dense("out_proj")(out.reshape(GB, V, C))


class GroupedEncoderLayer(nn.Module):
    cfg: SSTConfig
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer_data: dict) -> jnp.ndarray:
        c = self.cfg
        G = self.groups
        GB, V, C = x.shape
        fused = _use_fused_ffn(c, V, C)
        a = GroupedWindowMHA(G, c.d_model, c.nhead, self.dtype,
                             c.attention_impl, fuse_ffn=fused,
                             band_layout=c.band_layout,
                             name="win_attn")(x, layer_data)
        if fused:
            raw, (wo, bo) = a
            s1, t1 = _LNParams(C, groups=G, name="norm1")()
            w1, b1 = _GroupedDenseParams(G, C, c.dim_feedforward,
                                         name="linear1")()
            w2, b2 = _GroupedDenseParams(G, c.dim_feedforward, C,
                                         name="linear2")()
            s2, t2 = _LNParams(C, groups=G, name="norm2")()
            from ..ops.pallas_ffn import post_attention_block
            tile = 256 if V % 256 == 0 else 128
            return post_attention_block(
                x, raw, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2,
                layer_data.get("extent"), 1e-5, tile, not _is_tpu_backend())
        x = GroupedLayerNorm(G, epsilon=1e-5, name="norm1")(x + a)
        act = ((lambda t: nn.gelu(t, approximate=False))
               if c.activation == "gelu" else nn.relu)
        h = GroupedDense(G, c.dim_feedforward, self.dtype, name="linear1")(x)
        h = GroupedDense(G, c.d_model, self.dtype, name="linear2")(act(h))
        return GroupedLayerNorm(G, epsilon=1e-5, name="norm2")(x + h)


class GroupedBasicShiftBlock(nn.Module):
    cfg: SSTConfig
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, shift_datas) -> jnp.ndarray:
        layers = shift_datas["layers"]
        n = len(layers)
        for i in range(2):
            cross = shift_datas["cross"][i]
            if cross is not None:
                x = _permute(x, cross[0], cross[1])
            x = GroupedEncoderLayer(self.cfg, self.groups, self.dtype,
                                    name=f"encoder_{i}")(x, layers[i % n])
        return x


class _GroupedScanBody(nn.Module):
    cfg: SSTConfig
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, shift_datas):
        x = GroupedBasicShiftBlock(self.cfg, self.groups, self.dtype,
                                   name="block")(x, shift_datas)
        return x, None


def tile_shift_data(shift_datas, groups: int):
    """Tile per-batch shift data along the batch axis for a grouped stack
    (every branch shares the same window layout)."""
    def tile(a):
        return jnp.concatenate([a] * groups, axis=0)

    return dict(
        layers=[{k: tile(v) for k, v in lay.items()}
                for lay in shift_datas["layers"]],
        entry=tuple(tile(a) for a in shift_datas["entry"]),
        cross=[None if c is None else tuple(tile(a) for a in c)
               for c in shift_datas["cross"]],
    )


class SSTStackPair(nn.Module):
    """G parameter-independent SSTStacks over the same tokens, batched.

    ``__call__(x, shift_datas)`` takes row-order tokens [B, V, C] and the
    UNtiled shift data; returns [G, B, V, C] (branch-major)."""

    cfg: SSTConfig
    num_blocks: int
    groups: int = 2
    dtype: jnp.dtype = jnp.float32
    remat: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, shift_datas) -> jnp.ndarray:
        B, V, C = x.shape
        G = self.groups
        if self.num_blocks == 0:
            return jnp.broadcast_to(x[None], (G, B, V, C))
        data = tile_shift_data(shift_datas, G)
        xg = jnp.concatenate([x] * G, axis=0)
        remat = self.cfg.remat_blocks if self.remat is None else self.remat
        body = (nn.remat(_GroupedScanBody, prevent_cse=False) if remat
                else _GroupedScanBody)
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.num_blocks,
        )
        ep, ei = data["entry"]
        xg = _permute(xg, ep, ei)
        xg, _ = scan(self.cfg, G, self.dtype, name="blocks")(xg, data)
        xg = _permute(xg, ei, ep)
        return xg.reshape(G, B, V, C)


class _ScanBody(nn.Module):
    """Scan step: one BasicShiftBlock; carry = token features."""

    cfg: SSTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, shift_datas):
        x = BasicShiftBlock(self.cfg, self.dtype, name="block")(
            x, shift_datas)
        return x, None


class SSTStack(nn.Module):
    """A stack of BasicShiftBlocks sharing pre-sorted shift data.

    Blocks run under ``nn.scan`` with stacked parameters — XLA traces and
    compiles ONE block body instead of unrolling N copies, which cuts the
    full-model compile from ~8 min to tens of seconds at 16 blocks and
    keeps the step graph small.  Each block is optionally rematerialized
    (``nn.remat``): attention internals are recomputed in the backward
    pass instead of stored (the reference exposes the same trade via
    ``checkpoint_blocks``)."""

    cfg: SSTConfig
    num_blocks: int
    dtype: jnp.dtype = jnp.float32
    remat: bool | None = None     # None: follow cfg.remat_blocks

    @nn.compact
    def __call__(self, x: jnp.ndarray, shift_datas) -> jnp.ndarray:
        if self.num_blocks == 0:
            return x
        remat = self.cfg.remat_blocks if self.remat is None else self.remat
        body = nn.remat(_ScanBody, prevent_cse=False) if remat else _ScanBody
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.num_blocks,
        )
        # row order -> the blocks' entry order, once for the whole stack
        ep, ei = shift_datas["entry"]
        x = _permute(x, ep, ei)
        x, _ = scan(self.cfg, self.dtype, name="blocks")(x, shift_datas)
        return _permute(x, ei, ep)
