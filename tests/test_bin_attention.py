"""Bin-packed padded-layout attention vs the einsum reference (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.ops.attention import band_attention
from geomae_tpu.ops.pallas_binattn import bin_attention
from geomae_tpu.ops.windows import bin_pack

INT32_MAX = np.iinfo(np.int32).max


def make_win(rng, B, V, win_max):
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
    return win


def pack(win, win_max, tile):
    B, V = win.shape
    w_cap = V
    nb_cap = V // max(tile - win_max + 1, 1) + 2
    vp = V + 8 * nb_cap
    outs = jax.vmap(lambda w: bin_pack(w, w_cap, nb_cap, vp, tile))(
        jnp.asarray(win))
    return outs, vp


def test_bin_pack_invariants(rng):
    win = make_win(rng, 3, 300, 30)
    (to_pos, to_sorted, rel, starts, lens, nb), vp = pack(win, 30, 64)
    to_pos, to_sorted, rel, starts, lens, nb = map(
        np.asarray, (to_pos, to_sorted, rel, starts, lens, nb))
    for b in range(win.shape[0]):
        valid = win[b] != INT32_MAX
        nv = valid.sum()
        s = starts[b][: nb[b]]
        ln = lens[b][: nb[b]]
        assert (s % 8 == 0).all() and (ln % 8 == 0).all()
        assert (ln >= 8).all() and (ln <= 64).all()
        assert (s[1:] == s[:-1] + ln[:-1]).all() and s[0] == 0
        assert (lens[b][nb[b]:] == 0).all()
        # real rows: injection round-trips, padded rows: sentinels
        pos = to_pos[b][:nv]
        assert (np.sort(pos) == pos).all()          # order-preserving
        assert (to_pos[b][nv:] == INT32_MAX).all()
        assert (to_sorted[b][pos] == np.arange(nv)).all()
        pad_mask = np.ones(vp, bool)
        pad_mask[pos] = False
        assert (to_sorted[b][pad_mask] == INT32_MAX).all()
        assert (rel[b][pad_mask] == 0).all()
        # per real row: the delta-encoded range brackets the row inside
        # its 8-aligned bin (rel = (off - start, end - off))
        for r in range(nv):
            p = pos[r]
            bin_i = np.searchsorted(s, p, side="right") - 1
            off = p - s[bin_i]
            rs, re = off - rel[b, p, 0], off + rel[b, p, 1]
            assert 0 <= rs <= off < re <= ln[bin_i]
            assert rel[b, p, 0] <= 144 and rel[b, p, 1] <= 144
            rows = to_sorted[b][s[bin_i] + rs: s[bin_i] + re]
            assert (win[b, rows] == win[b, r]).all()
            assert (win[b] == win[b, r]).sum() == re - rs


def to_padded(x, to_sorted, fill_rng):
    """Scatter sorted rows into padded positions; pads get random garbage
    (the kernels must mask them by construction)."""
    B, V = x.shape[:2]
    vp = to_sorted.shape[1]
    out = fill_rng.normal(size=(B, vp) + x.shape[2:]).astype(np.float32)
    ts = np.asarray(to_sorted)
    for b in range(B):
        real = ts[b] != INT32_MAX
        out[b][real] = np.asarray(x)[b][ts[b][real]]
    return jnp.asarray(out)


@pytest.mark.parametrize("win_max,tile", [(20, 128), (100, 128)])
def test_bin_matches_einsum(rng, win_max, tile):
    B, V, H, D = 2, 256, 4, 8
    win = make_win(rng, B, V, win_max)
    (to_pos, to_sorted, rel, starts, lens, nb), vp = pack(win, win_max, tile)
    q, k, v = (rng.normal(size=(B, V, H, D)).astype(np.float32)
               for _ in range(3))
    kv = jnp.asarray(win != INT32_MAX)
    ref = band_attention(*map(jnp.asarray, (q, k, v)), jnp.asarray(win),
                         key_valid=kv, tile=64, nbands=(win_max + 63) // 64)
    qp, kp, vp_ = (to_padded(x, to_sorted, rng) for x in (q, k, v))
    got = bin_attention(qp, kp, vp_, rel, starts, lens, nb, tile, True)
    got, ref, tp = np.asarray(got), np.asarray(ref), np.asarray(to_pos)
    for b in range(B):
        nv = (win[b] != INT32_MAX).sum()
        np.testing.assert_allclose(got[b][tp[b][:nv]], ref[b][:nv],
                                   rtol=2e-4, atol=2e-5)


def test_bin_gradients_match(rng):
    B, V, H, D, win_max, tile = 1, 192, 2, 8, 24, 64
    win = make_win(rng, B, V, win_max)
    (to_pos, to_sorted, rel, starts, lens, nb), vp = pack(win, win_max, tile)
    q, k, v = (jnp.asarray(rng.normal(size=(B, V, H, D)).astype(np.float32))
               for _ in range(3))
    kv = jnp.asarray(win != INT32_MAX)
    nv = int((win[0] != INT32_MAX).sum())
    tp = jnp.asarray(np.asarray(to_pos)[:, :nv])         # real positions
    g = jnp.asarray(rng.normal(size=(B, nv, H, D)).astype(np.float32))

    def loss_ref(q_, k_, v_):
        o = band_attention(q_, k_, v_, jnp.asarray(win), key_valid=kv,
                           tile=64, nbands=1)
        return jnp.sum(o[:, :nv] * g)

    ts = jnp.asarray(np.where(np.asarray(to_sorted) == INT32_MAX, 0,
                              np.asarray(to_sorted)))

    def loss_bin(q_, k_, v_):
        # gather into padded layout INSIDE the diff region so grads map back
        pad = lambda x: jnp.take_along_axis(
            x, ts[:, :, None, None].repeat(H, 2).repeat(D, 3), axis=1)
        o = bin_attention(pad(q_), pad(k_), pad(v_), rel, starts, lens, nb,
                          tile, True)
        o_real = jnp.take_along_axis(
            o, tp[:, :, None, None].repeat(H, 2).repeat(D, 3), axis=1)
        return jnp.sum(o_real * g)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_bin = jax.grad(loss_bin, argnums=(0, 1, 2))(q, k, v)
    valid = np.asarray(win[0] != INT32_MAX)
    for a, b in zip(g_ref, g_bin):
        np.testing.assert_allclose(np.asarray(b)[0][valid],
                                   np.asarray(a)[0][valid],
                                   rtol=2e-4, atol=2e-5)


def test_prepare_bin_data_roundtrip(rng):
    """Entry/exit maps round-trip real rows through the padded stream, and
    the stacked cross maps compose to the same end-to-end result."""
    from geomae_tpu.config import geomae_pretrain_nus, replace
    from geomae_tpu.ops.windows import (make_layouts, positional_embedding,
                                        window_ids)
    from geomae_tpu.models.sst import prepare_shift_data, _permute

    cfg = geomae_pretrain_nus()
    sst = replace(cfg.sst, attention_impl="bin")
    B, V = 2, 384
    coords = np.stack([rng.integers(0, 40, (B, V)),
                       rng.integers(0, 40, (B, V))], -1).astype(np.int32)
    valid = rng.random((B, V)) > 0.2
    lays = make_layouts(jnp.asarray(coords), jnp.asarray(valid), sst,
                        cfg.voxel)
    pos = []
    for s in sst.shifts:
        ciw = jax.vmap(lambda c, m, ss=s: window_ids(
            c, m, ss, sst, cfg.voxel)[1])(jnp.asarray(coords),
                                          jnp.asarray(valid))
        pos.append(positional_embedding(ciw, sst))
    data = prepare_shift_data(lays, pos, jnp.asarray(valid), sst, cfg.voxel)
    x = jnp.asarray(rng.normal(size=(B, V, 8)).astype(np.float32))
    ep, ei = data["entry"]
    xs = _permute(x, ep, ei)                     # row order -> padded
    assert xs.shape[1] > V                       # padded stream
    back = _permute(xs, ei, ep)                  # padded -> row order
    np.testing.assert_allclose(np.asarray(back)[np.asarray(valid)],
                               np.asarray(x)[np.asarray(valid)], rtol=1e-6)
    # cross maps: last-shift order -> shift-0 -> shift-1 (== last) is the
    # identity on real rows
    cr0, cr1 = data["cross"]
    if cr0 is not None and cr1 is not None:
        xb = _permute(xs, cr0[0], cr0[1])
        xa = _permute(xb, cr1[0], cr1[1])
        vrows = np.asarray(jnp.take_along_axis(
            jnp.asarray(valid), ep.clip(0, V - 1), 1)) & (
                np.asarray(ep) != INT32_MAX)
        np.testing.assert_allclose(np.asarray(xa)[vrows],
                                   np.asarray(xs)[vrows], rtol=1e-6)


def test_stack_bin_vs_einsum(rng):
    """A full SSTStack produces the same output under the bin-packed
    padded pipeline (interpret mode) as under the einsum path."""
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
    for impl in ("einsum", "bin"):
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
        outs[impl] = np.asarray(stack.apply({"params": params}, x, data))
    np.testing.assert_allclose(outs["bin"][np.asarray(valid)],
                               outs["einsum"][np.asarray(valid)],
                               rtol=5e-4, atol=5e-5)
