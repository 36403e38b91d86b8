"""Fused post-attention block vs the XLA EncoderLayer tail (interpret
mode on CPU): forward, input grads, and in-kernel weight-grad
accumulation, grouped and ungrouped."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.models.norm import fast_layer_norm
from geomae_tpu.ops.pallas_ffn import post_attention_block


def ref_block(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, eps=1e-5):
    """The exact XLA chain of models/sst.EncoderLayer after attention:
    per-group Dense (compute dtype) + fast_layer_norm, group-major."""
    B, V, C = x.shape
    G = wo.shape[0]
    dt = x.dtype
    xg = x.reshape(G, B // G, V, C)
    ag = attn.reshape(G, B // G, V, C)

    def dense(t, w, b):
        y = jnp.einsum("gbvc,gcf->gbvf", t, w.astype(dt)) + \
            b.astype(dt)[:, None, None]
        return y

    o = dense(ag, wo, bo)
    xm = fast_layer_norm(xg + o, s1[:, None, None], t1[:, None, None], eps)
    h = dense(xm, w1, b1)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dt)
    o2 = dense(h, w2, b2)
    y = fast_layer_norm(xm + o2, s2[:, None, None], t2[:, None, None], eps)
    return y.reshape(B, V, C)


def make_case(rng, B=2, V=128, C=128, F=256, G=1, dtype=jnp.float32):
    def arr(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    x = arr(B, V, C).astype(dtype)
    attn = arr(B, V, C).astype(dtype)
    ws = dict(
        wo=arr(G, C, C) * 0.1, bo=arr(G, C) * 0.1,
        s1=1.0 + arr(G, C) * 0.1, t1=arr(G, C) * 0.1,
        w1=arr(G, C, F) * 0.1, b1=arr(G, F) * 0.1,
        w2=arr(G, F, C) * 0.1, b2=arr(G, C) * 0.1,
        s2=1.0 + arr(G, C) * 0.1, t2=arr(G, C) * 0.1,
    )
    return x, attn, ws


ORDER = ["wo", "bo", "s1", "t1", "w1", "b1", "w2", "b2", "s2", "t2"]


@pytest.mark.parametrize("G", [1, 2])
def test_forward_matches_xla(rng, G):
    x, attn, ws = make_case(rng, B=2 * G, G=G)
    args = [ws[k] for k in ORDER]
    ref = ref_block(x, attn, *args)
    got = post_attention_block(x, attn, *args, None, 1e-5, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("G", [1, 2])
def test_grads_match_xla(rng, G):
    x, attn, ws = make_case(rng, B=2 * G, G=G)
    args = [ws[k] for k in ORDER]

    def loss_ref(x_, a_, *ws_):
        return jnp.sum(ref_block(x_, a_, *ws_).astype(jnp.float32) ** 2)

    def loss_pal(x_, a_, *ws_):
        y = post_attention_block(x_, a_, *ws_, None, 1e-5, 64, True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    nargs = 2 + len(args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(nargs)))(x, attn, *args)
    g_pal = jax.grad(loss_pal, argnums=tuple(range(nargs)))(x, attn, *args)
    names = ["x", "attn"] + ORDER
    for n, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=n)


def test_bf16_forward_close(rng):
    x, attn, ws = make_case(rng, B=2, dtype=jnp.bfloat16)
    args = [ws[k] for k in ORDER]
    ref = ref_block(x, attn, *args)
    got = post_attention_block(x, attn, *args, None, 1e-5, 64, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def _layer_data(rng, B, V, C, win_size=6):
    win = np.zeros((B, V), np.int32)
    for b in range(B):
        n_valid = int(rng.integers(V // 2, V))
        ids, w = [], 0
        while len(ids) < n_valid:
            occ = int(rng.integers(1, win_size + 1))
            ids.extend([w] * occ)
            w += 1
        win[b, :n_valid] = ids[:n_valid]
        win[b, n_valid:] = np.iinfo(np.int32).max
    kv = win != np.iinfo(np.int32).max
    pos = rng.normal(size=(B, V, C)).astype(np.float32)
    return dict(win_id=jnp.asarray(win), pos_sorted=jnp.asarray(pos),
                key_valid_sorted=jnp.asarray(kv))


def test_encoder_layer_fused_matches_xla(rng):
    """Whole EncoderLayer: the fused (interpret) path must match the XLA
    path bit-for-parameter (identical param trees => same init)."""
    import dataclasses

    from geomae_tpu.config import SSTConfig
    from geomae_tpu.models.sst import EncoderLayer, GroupedEncoderLayer

    B, V, C = 2, 128, 128
    x = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
    data = _layer_data(rng, B, V, C)
    for G in (0, 2):
        cfg_x = SSTConfig(attention_impl="einsum", ffn_impl="xla")
        cfg_f = dataclasses.replace(cfg_x, ffn_impl="fused")
        if G:
            xg = jnp.concatenate([x, x * 0.5], axis=0)
            dg = {k: jnp.concatenate([v] * G, axis=0)
                  for k, v in data.items()}
            mx = GroupedEncoderLayer(cfg_x, G)
            mf = GroupedEncoderLayer(cfg_f, G)
            px = mx.init(jax.random.PRNGKey(7), xg, dg)
            pf = mf.init(jax.random.PRNGKey(7), xg, dg)
            yx = mx.apply(px, xg, dg)
            yf = mf.apply(pf, xg, dg)
        else:
            mx = EncoderLayer(cfg_x)
            mf = EncoderLayer(cfg_f)
            px = mx.init(jax.random.PRNGKey(7), x, data)
            pf = mf.init(jax.random.PRNGKey(7), x, data)
            yx = mx.apply(px, x, data)
            yf = mf.apply(pf, x, data)
        # identical param trees (names, shapes) is itself part of the
        # contract: checkpoints must round-trip across ffn_impl
        tx = jax.tree_util.tree_structure(px)
        tf = jax.tree_util.tree_structure(pf)
        assert tx == tf
        for a, b in zip(jax.tree_util.tree_leaves(px),
                        jax.tree_util.tree_leaves(pf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                                   rtol=3e-5, atol=3e-5)


def test_nv_extent_skip(rng):
    """Tiles at/after nv produce zero outputs and zero grads; the real
    prefix matches the unskipped run exactly."""
    x, attn, ws = make_case(rng, B=2, V=256, G=1)
    args = [ws[k] for k in ORDER]
    nv = jnp.array([128, 192], jnp.int32)

    full = post_attention_block(x, attn, *args, None, 1e-5, 64, True)
    skip = post_attention_block(x, attn, *args, nv, 1e-5, 64, True)
    for b, n in enumerate([128, 192]):
        np.testing.assert_array_equal(np.asarray(skip)[b, :n],
                                      np.asarray(full)[b, :n])
        assert np.all(np.asarray(skip)[b, n:] == 0.0)

    def loss(x_, nv_):
        y = post_attention_block(x_, attn, *args, nv_, 1e-5, 64, True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gx_s = jax.grad(loss)(x, nv)
    gx_f = jax.grad(loss)(x, None)
    for b, n in enumerate([128, 192]):
        np.testing.assert_array_equal(np.asarray(gx_s)[b, :n],
                                      np.asarray(gx_f)[b, :n])
        assert np.all(np.asarray(gx_s)[b, n:] == 0.0)
