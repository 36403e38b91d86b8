"""Fused q/k/v-projection band attention vs XLA projections + einsum
band attention (interpret mode on CPU).

The kernel computes q=(x+pos)@Wq+bq, k=(x+pos)@Wk+bk, v=x@Wv+bv in VMEM
and must match projecting in XLA then calling the reference einsum
``band_attention`` — forward, dx, and every weight gradient.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.ops.attention import band_attention
from geomae_tpu.ops.pallas_attention_qkv import band_attention_qkv

INT_MAX = np.iinfo(np.int32).max


def make_case(rng, B=2, V=256, C=32, win_size=5, G=1):
    x = rng.normal(size=(B, V, C)).astype(np.float32)
    pos = rng.normal(size=(B, V, C)).astype(np.float32)
    win = np.zeros((B, V), np.int32)
    for b in range(B):
        n_valid = int(rng.integers(V // 2, V))
        ids, w = [], 0
        while len(ids) < n_valid:
            occ = int(rng.integers(1, win_size + 1))
            ids.extend([w] * occ)
            w += 1
        win[b, :n_valid] = ids[:n_valid]
        win[b, n_valid:] = INT_MAX
    kv = (rng.random((B, V)) > 0.3) & (win != INT_MAX)
    ws = {}
    for name in ("wq", "wk", "wv"):
        ws[name] = (rng.normal(size=(G, C, C)) / np.sqrt(C)).astype(
            np.float32)
        ws["b" + name[1]] = rng.normal(size=(G, C)).astype(np.float32) * 0.1
    return (jnp.asarray(x), jnp.asarray(pos), jnp.asarray(win),
            jnp.asarray(kv), {k: jnp.asarray(v) for k, v in ws.items()})


def ref_attention(x, pos, ws, win, kv, H):
    """XLA projections (grouped) + einsum band attention."""
    B, V, C = x.shape
    G = ws["wq"].shape[0]
    xg = x.reshape(G, B // G, V, C)
    pg = pos.reshape(G, B // G, V, C)
    qk_in = xg + pg
    proj = lambda t, w, b: (jnp.einsum("gbvc,gcd->gbvd", t, w)
                            + b[:, None, None]).reshape(B, V, C)
    q = proj(qk_in, ws["wq"], ws["bq"]).reshape(B, V, H, C // H)
    k = proj(qk_in, ws["wk"], ws["bk"]).reshape(B, V, H, C // H)
    v = proj(xg, ws["wv"], ws["bv"]).reshape(B, V, H, C // H)
    return band_attention(q, k, v, win, key_valid=kv, tile=64,
                          nbands=2).reshape(B, V, C)


@pytest.mark.parametrize("G", [1, 2])
def test_qkv_forward_matches(rng, G):
    x, pos, win, kv, ws = make_case(rng, G=G)
    H = 4
    ref = ref_attention(x, pos, ws, win, kv, H)
    got = band_attention_qkv(x, pos, ws["wq"], ws["bq"], ws["wk"], ws["bk"],
                             ws["wv"], ws["bv"], win, kv, H, 64, 128, True)
    valid_q = np.asarray(win) != INT_MAX
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(ref)[valid_q],
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("G", [1, 2])
def test_qkv_gradients_match(rng, G):
    x, pos, win, kv, ws = make_case(rng, B=2, V=128, C=16, G=G)
    H = 2
    valid = (np.asarray(win) != INT_MAX)[..., None]

    def loss_ref(x_, ws_):
        o = ref_attention(x_, pos, ws_, win, kv, H)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    def loss_pal(x_, ws_):
        o = band_attention_qkv(x_, pos, ws_["wq"], ws_["bq"], ws_["wk"],
                               ws_["bk"], ws_["wv"], ws_["bv"], win, kv,
                               H, 64, 128, True)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=3e-4, atol=3e-5)
    for k in sorted(ws):
        np.testing.assert_allclose(np.asarray(gw_p[k]), np.asarray(gw_r[k]),
                                   rtol=3e-4, atol=3e-4, err_msg=k)


def test_sst_stack_qkv_matches_einsum(rng):
    """Full SSTStack forward equality: einsum path vs the fused-QKV band
    kernels (interpret mode), same params."""
    from geomae_tpu.config import geomae_pretrain_nus, replace
    from geomae_tpu.ops.windows import (make_layouts, positional_embedding,
                                        window_ids)
    from geomae_tpu.models.sst import SSTStack, prepare_shift_data

    cfg = geomae_pretrain_nus()
    B, V, C = 1, 384, 128
    coords = np.stack([rng.integers(0, 30, (B, V)),
                       rng.integers(0, 30, (B, V))], -1).astype(np.int32)
    valid = rng.random((B, V)) > 0.2
    x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))

    outs = {}
    for impl in ("einsum", "qkv"):
        sst = replace(cfg.sst, attention_impl=impl)
        lays = make_layouts(jnp.asarray(coords), jnp.asarray(valid), sst,
                            cfg.voxel)
        pos = []
        for s in sst.shifts:
            ciw = jax.vmap(lambda c, m, ss=s: window_ids(
                c, m, ss, sst, cfg.voxel)[1])(jnp.asarray(coords),
                                              jnp.asarray(valid))
            pos.append(positional_embedding(ciw, sst))
        data = prepare_shift_data(lays, pos, jnp.asarray(valid), sst,
                                  cfg.voxel)
        stack = SSTStack(sst, 1, jnp.float32)
        params = stack.init(jax.random.PRNGKey(0), x, data)["params"]
        assert jax.tree.structure(params) is not None
        outs[impl] = np.asarray(stack.apply({"params": params}, x, data))
    np.testing.assert_allclose(outs["qkv"][np.asarray(valid)],
                               outs["einsum"][np.asarray(valid)],
                               rtol=5e-4, atol=5e-5)


def test_merged_backward_matches_split(rng, monkeypatch):
    """The one-pass merged backward (default) must equal the legacy
    split dq/dkv pair bit-for-bit up to bf16 accumulation order."""
    x, pos, win, kv, ws = make_case(rng, B=2, V=192, C=16, G=1)
    H = 2

    def loss(x_, ws_):
        o = band_attention_qkv(x_, pos, ws_["wq"], ws_["bq"], ws_["wk"],
                               ws_["bk"], ws_["wv"], ws_["bv"], win, kv,
                               H, 64, 128, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    monkeypatch.setenv("GEOMAE_ATTN_BWD", "split")
    gx_s, gw_s = jax.grad(loss, argnums=(0, 1))(x, ws)
    monkeypatch.delenv("GEOMAE_ATTN_BWD")
    gx_m, gw_m = jax.grad(loss, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx_m, np.float32),
                               np.asarray(gx_s, np.float32),
                               rtol=2e-2, atol=2e-3)
    for k in sorted(ws):
        np.testing.assert_allclose(np.asarray(gw_m[k]), np.asarray(gw_s[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)


def test_tilepack_layout_matches_band(rng):
    """Tile-packed layout (pad=0 attention) == band layout, both einsum
    and qkv kernels, same params — the layout is a pure reordering."""
    from geomae_tpu.config import geomae_pretrain_nus, replace
    from geomae_tpu.ops.windows import make_layouts
    from geomae_tpu.models.sst import SSTStack, prepare_shift_data

    cfg = geomae_pretrain_nus()
    B, V, C = 1, 384, 128
    coords = np.stack([rng.integers(0, 30, (B, V)),
                       rng.integers(0, 30, (B, V))], -1).astype(np.int32)
    valid = rng.random((B, V)) > 0.2
    x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))

    outs = {}
    for layout, impl in (("band", "einsum"), ("tilepack", "einsum"),
                         ("tilepack", "qkv")):
        sst = replace(cfg.sst, attention_impl=impl, band_layout=layout,
                      ffn_impl="xla")
        lays = make_layouts(jnp.asarray(coords), jnp.asarray(valid), sst,
                            cfg.voxel)
        data = prepare_shift_data(lays, None, jnp.asarray(valid), sst,
                                  cfg.voxel)
        stack = SSTStack(sst, 1, jnp.float32)
        params = stack.init(jax.random.PRNGKey(0), x, data)["params"]
        outs[(layout, impl)] = np.asarray(
            stack.apply({"params": params}, x, data))
    v = np.asarray(valid)
    base = outs[("band", "einsum")][v]
    np.testing.assert_allclose(outs[("tilepack", "einsum")][v], base,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[("tilepack", "qkv")][v], base,
                               rtol=5e-4, atol=5e-5)


def test_tilepack_gradients_match_band(rng):
    """Stack gradients through the tile-packed layout (qkv kernels +
    fused FFN with extent skip, pad=0) == band einsum gradients."""
    from geomae_tpu.config import geomae_pretrain_nus, replace
    from geomae_tpu.ops.windows import make_layouts
    from geomae_tpu.models.sst import SSTStack, prepare_shift_data

    cfg = geomae_pretrain_nus()
    B, V, C = 1, 384, 128
    coords = np.stack([rng.integers(0, 30, (B, V)),
                       rng.integers(0, 30, (B, V))], -1).astype(np.int32)
    valid = rng.random((B, V)) > 0.2
    x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
    vmask = jnp.asarray(valid)[..., None]

    grads = {}
    for layout, impl, ffn in (("band", "einsum", "xla"),
                              ("tilepack", "qkv", "fused")):
        sst = replace(cfg.sst, attention_impl=impl, band_layout=layout,
                      ffn_impl=ffn)
        lays = make_layouts(jnp.asarray(coords), jnp.asarray(valid), sst,
                            cfg.voxel)
        data = prepare_shift_data(lays, None, jnp.asarray(valid), sst,
                                  cfg.voxel)
        stack = SSTStack(sst, 1, jnp.float32)
        params = stack.init(jax.random.PRNGKey(0), x, data)["params"]

        def loss(p, x_):
            y = stack.apply({"params": p}, x_, data)
            return jnp.sum(jnp.where(vmask, y, 0.0) ** 2)

        grads[layout] = jax.grad(loss, argnums=(0, 1))(params, x)
    gp_b, gx_b = grads["band"]
    gp_t, gx_t = grads["tilepack"]
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_b),
                               rtol=2e-3, atol=2e-4)
    flat_b = jax.tree_util.tree_leaves_with_path(gp_b)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(gp_t))
    for path, g in flat_b:
        np.testing.assert_allclose(np.asarray(flat_t[path]), np.asarray(g),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=str(path))
