"""Pallas band attention vs the einsum reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.ops.attention import band_attention
from geomae_tpu.ops.pallas_attention import band_attention_pallas


def make_case(rng, B=2, V=256, H=4, D=8, win_size=5):
    q = rng.normal(size=(B, V, H, D)).astype(np.float32)
    k = rng.normal(size=(B, V, H, D)).astype(np.float32)
    v = rng.normal(size=(B, V, H, D)).astype(np.float32)
    # sorted window ids with variable occupancy; tail = INT32_MAX padding
    win = np.zeros((B, V), np.int32)
    for b in range(B):
        n_valid = rng.integers(V // 2, V)
        ids, cur, w = [], 0, 0
        while len(ids) < n_valid:
            occ = rng.integers(1, win_size + 1)
            ids.extend([w] * occ)
            w += 1
        win[b, :n_valid] = ids[:n_valid]
        win[b, n_valid:] = np.iinfo(np.int32).max
    kv = (rng.random((B, V)) > 0.3) & (win != np.iinfo(np.int32).max)
    return map(jnp.asarray, (q, k, v, win, kv))


def test_pallas_matches_einsum(rng):
    q, k, v, win, kv = make_case(rng)
    ref = band_attention(q, k, v, win, key_valid=kv, tile=64, nbands=2)
    got = band_attention_pallas(q, k, v, win, kv, tile=64, pad=128,
                                interpret=True)
    valid_q = np.asarray(win) != np.iinfo(np.int32).max
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(ref)[valid_q], rtol=2e-4,
                               atol=2e-5)


def test_pallas_gradients_match(rng):
    q, k, v, win, kv = make_case(rng, B=1, V=128, H=2, D=8)

    def loss_ref(q_, k_, v_):
        o = band_attention(q_, k_, v_, win, key_valid=kv, tile=64, nbands=2)
        return jnp.sum(jnp.where(
            (win != np.iinfo(np.int32).max)[..., None, None], o, 0.0) ** 2)

    def loss_pal(q_, k_, v_):
        o = band_attention_pallas(q_, k_, v_, win, kv, tile=64, pad=128,
                                  interpret=True)
        return jnp.sum(jnp.where(
            (win != np.iinfo(np.int32).max)[..., None, None], o, 0.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_pad_not_tile_multiple(rng):
    """pad is independent of tile (only >= max window span, mult of 8)."""
    q, k, v, win, kv = make_case(rng, B=1, V=256, H=2, D=8, win_size=5)
    ref = band_attention(q, k, v, win, key_valid=kv, tile=64, nbands=1)
    got = band_attention_pallas(q, k, v, win, kv, tile=64, pad=24,
                                interpret=True)
    valid_q = np.asarray(win) != np.iinfo(np.int32).max
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(ref)[valid_q], rtol=2e-4,
                               atol=2e-5)


def test_empty_row_gradients_are_zero_and_finite(rng):
    """A valid query whose window has NO valid keys: out = 0 and the
    gradient w.r.t. q at that row is exactly 0 (the stored normalizer is
    0 there; without the inv_l guard the bias-form backward would blow
    up as exp(0)/eps)."""
    q, k, v, win, kv = make_case(rng, B=1, V=128, H=2, D=8)
    kv = np.asarray(kv).copy()
    win_n = np.asarray(win)
    # kill ALL keys of the first row's window
    kv[0, win_n[0] == win_n[0, 0]] = False
    kv = jnp.asarray(kv)

    def loss(q_, k_, v_):
        o = band_attention_pallas(q_, k_, v_, win, kv, tile=64, pad=128,
                                  interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2 + o.astype(jnp.float32))

    o = band_attention_pallas(q, k, v, win, kv, tile=64, pad=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(o)[0, 0], 0.0, atol=1e-7)
    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(gq)[0, 0], 0.0, atol=1e-7)
