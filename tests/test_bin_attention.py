"""Bin-packed attention vs the einsum reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.ops.attention import band_attention
from geomae_tpu.ops.pallas_binattn import bin_attention
from geomae_tpu.ops.windows import bin_pack

INT32_MAX = np.iinfo(np.int32).max


def make_case(rng, B=2, V=256, H=4, D=8, win_max=20, tile=128):
    q = rng.normal(size=(B, V, H, D)).astype(np.float32)
    k = rng.normal(size=(B, V, H, D)).astype(np.float32)
    v = rng.normal(size=(B, V, H, D)).astype(np.float32)
    win = np.zeros((B, V), np.int32)
    for b in range(B):
        n_valid = int(rng.integers(V // 2, V))
        ids, w = [], 0
        while len(ids) < n_valid:
            occ = int(rng.integers(1, win_max + 1))
            ids.extend([w] * occ)
            w += 1
        win[b, :n_valid] = ids[:n_valid]
        win[b, n_valid:] = INT32_MAX
    w_cap = V
    nb_cap = V // max(tile - win_max + 1, 1) + 2
    rel, starts, lens, nb = jax.vmap(
        lambda ws: bin_pack(ws, w_cap, nb_cap, tile))(jnp.asarray(win))
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(win), rel, starts, lens, nb)


def test_bin_pack_invariants(rng):
    _, _, _, win, rel, starts, lens, nb = make_case(rng, B=3, V=300,
                                                    win_max=30, tile=64)
    win, rel, starts, lens, nb = map(np.asarray,
                                     (win, rel, starts, lens, nb))
    for b in range(win.shape[0]):
        valid = win[b] != INT32_MAX
        nv = valid.sum()
        s = starts[b][: nb[b]]
        assert (np.diff(s) > 0).all()
        # bins tile the valid prefix with <= tile rows each
        ends = np.append(s[1:], nv)
        fills = ends - s
        assert (fills >= 1).all() and (fills <= 64).all()
        assert (lens[b][: nb[b]] == fills).all()
        assert (lens[b][nb[b]:] == 0).all()
        assert s[0] == 0 and ends[-1] == nv
        # every row's window range sits inside its bin and brackets the row
        for r in range(nv):
            bin_i = np.searchsorted(s, r, side="right") - 1
            rs, re = rel[b, r]
            assert 0 <= rs <= r - s[bin_i] < re <= 64
            # all rows in [rs, re) share the window
            rows = np.arange(s[bin_i] + rs, s[bin_i] + re)
            assert (win[b, rows] == win[b, r]).all()
            # and no same-window row exists outside the range
            assert (win[b] == win[b, r]).sum() == re - rs
        assert (rel[b, nv:] == 0).all()


@pytest.mark.parametrize("win_max,tile", [(20, 128), (100, 128)])
def test_bin_matches_einsum(rng, win_max, tile):
    q, k, v, win, rel, starts, lens, nb = make_case(rng, win_max=win_max,
                                                    tile=tile)
    kv = win != INT32_MAX
    ref = band_attention(q, k, v, win, key_valid=kv, tile=64,
                         nbands=(win_max + 63) // 64)
    got = bin_attention(q, k, v, rel, starts, lens, nb, tile, True)
    valid_q = np.asarray(win) != INT32_MAX
    np.testing.assert_allclose(np.asarray(got)[valid_q],
                               np.asarray(ref)[valid_q], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[~valid_q], 0.0, atol=0)


def test_bin_gradients_match(rng):
    q, k, v, win, rel, starts, lens, nb = make_case(rng, B=1, V=192, H=2,
                                                    D=8, win_max=24, tile=64)
    kv = win != INT32_MAX
    mask = (np.asarray(win) != INT32_MAX)[..., None, None]

    def loss_ref(q_, k_, v_):
        o = band_attention(q_, k_, v_, win, key_valid=kv, tile=64, nbands=1)
        return jnp.sum(jnp.where(mask, o, 0.0) ** 2)

    def loss_bin(q_, k_, v_):
        o = bin_attention(q_, k_, v_, rel, starts, lens, nb, 64, True)
        return jnp.sum(jnp.where(mask, o, 0.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_bin = jax.grad(loss_bin, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_bin):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_bin_model_layer_parity(rng):
    """WindowMHA with impl='bin' (interpret unavailable off-TPU, so call
    the op directly through prepared shift data) equals the einsum path
    on a realistic layout."""
    from geomae_tpu.config import geomae_pretrain_nus
    from geomae_tpu.ops.windows import make_layouts, bin_pack_batch

    cfg = geomae_pretrain_nus()
    B, V = 2, 384
    ny, nx = cfg.voxel.grid_size
    coords = np.stack([rng.integers(0, 40, (B, V)),
                       rng.integers(0, 40, (B, V))], -1).astype(np.int32)
    valid = rng.random((B, V)) > 0.2
    lays = make_layouts(jnp.asarray(coords), jnp.asarray(valid), cfg.sst,
                        cfg.voxel)
    lay = lays[0]
    rel, starts, lens, nb = bin_pack_batch(lay.win_id, cfg.sst, cfg.voxel,
                                           tile=256)
    H, D = 4, 8
    q = jnp.asarray(rng.normal(size=(B, V, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, V, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, V, H, D)).astype(np.float32))
    kv = lay.win_id != INT32_MAX
    ref = band_attention(q, k, v, lay.win_id, key_valid=kv)
    got = bin_attention(q, k, v, rel, starts, lens, nb, 256, True)
    vq = np.asarray(kv)
    np.testing.assert_allclose(np.asarray(got)[vq], np.asarray(ref)[vq],
                               rtol=2e-4, atol=2e-5)
