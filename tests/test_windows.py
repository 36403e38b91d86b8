"""Window layout + band attention correctness vs per-window brute force."""
import jax
import jax.numpy as jnp
import numpy as np

from geomae_tpu.config import SSTConfig, VoxelConfig
from geomae_tpu.ops import windows as W
from geomae_tpu.ops.attention import band_attention

VOX = VoxelConfig(point_cloud_range=(-15.36, -15.36, -5.0, 15.36, 15.36, 3.0),
                  voxel_size=(0.256, 0.256, 8.0))  # 120x120 grid
SST = SSTConfig(d_model=16, nhead=2)


def random_table(rng, V, n_real):
    ny, nx = VOX.grid_size
    cells = rng.choice(ny * nx, size=n_real, replace=False)
    coords = np.zeros((V, 2), np.int32)
    coords[:n_real, 0] = cells // nx
    coords[:n_real, 1] = cells % nx
    valid = np.zeros(V, bool)
    valid[:n_real] = True
    return jnp.asarray(coords), jnp.asarray(valid)


def test_window_ids_match_reference_formula(rng):
    coords, valid = random_table(rng, 256, 200)
    ny, nx = VOX.grid_size
    win_y, win_x = SST.window_shape[1], SST.window_shape[0]
    for shift in SST.shifts:
        win, ciw = W.window_ids(coords, valid, shift, SST, VOX)
        c = np.asarray(coords)
        sx = 0 if shift[0] == 0 else win_x - shift[0]
        sy = 0 if shift[1] == 0 else win_y - shift[1]
        x, y = c[:, 1] + sx, c[:, 0] + sy
        max_num_win_y = int(np.ceil(ny / win_y)) + 1
        want = (x // win_x) * max_num_win_y + (y // win_y)
        v = np.asarray(valid)
        np.testing.assert_array_equal(np.asarray(win)[v], want[v])
        np.testing.assert_array_equal(np.asarray(ciw)[v, 0], (x % win_x)[v])
        np.testing.assert_array_equal(np.asarray(ciw)[v, 1], (y % win_y)[v])


def test_layout_roundtrip(rng):
    coords, valid = random_table(rng, 256, 180)
    lay = W.make_layout(coords, valid, (6, 6), SST, VOX)
    perm, inv = np.asarray(lay.perm), np.asarray(lay.inv_perm)
    np.testing.assert_array_equal(perm[inv], np.arange(256))
    # sorted win ids ascending, invalid last
    wid = np.asarray(lay.win_id)
    assert np.all(np.diff(wid.astype(np.int64)) >= 0)


def brute_window_attention(q, k, v, win, key_valid):
    """Per-window dense softmax attention oracle (numpy)."""
    V, H, D = q.shape
    out = np.zeros_like(q)
    for w in np.unique(win):
        rows = np.where(win == w)[0]
        krows = rows[key_valid[rows]]
        if len(krows) == 0:
            continue
        for h in range(H):
            s = q[rows, h] @ k[krows, h].T / np.sqrt(D)
            s = s - s.max(-1, keepdims=True)
            p = np.exp(s)
            p = p / p.sum(-1, keepdims=True)
            out[rows, h] = p @ v[krows, h]
    return out


def test_band_attention_vs_bruteforce(rng):
    V, H, D = 256, 2, 8
    coords, valid = random_table(rng, V, 200)
    lay = W.make_layout(coords, valid, (0, 0), SST, VOX)
    q = rng.normal(size=(V, H, D)).astype(np.float32)
    k = rng.normal(size=(V, H, D)).astype(np.float32)
    v = rng.normal(size=(V, H, D)).astype(np.float32)
    key_valid = (rng.random(V) > 0.5) & np.asarray(valid)

    perm = np.asarray(lay.perm)
    win_sorted = np.asarray(lay.win_id)
    kv_sorted = key_valid[perm]
    got = band_attention(
        jnp.asarray(q[perm])[None], jnp.asarray(k[perm])[None],
        jnp.asarray(v[perm])[None], jnp.asarray(win_sorted)[None],
        key_valid=jnp.asarray(kv_sorted)[None], tile=64, nbands=3)
    got = np.asarray(got)[0]

    want_sorted = brute_window_attention(q[perm], k[perm], v[perm],
                                         win_sorted, kv_sorted)
    vmask = np.asarray(valid)[perm] & np.array(
        [kv_sorted[win_sorted == w].any() for w in win_sorted])
    np.testing.assert_allclose(got[vmask], want_sorted[vmask],
                               rtol=2e-4, atol=2e-5)


def test_band_covers_full_window(rng):
    """A completely full 12x12 window (144 tokens) must attend globally."""
    win_y, win_x = 12, 12
    V = 256
    coords = np.zeros((V, 2), np.int32)
    # one full window at (y, x) in [24, 36)
    idx = 0
    for y in range(24, 36):
        for x in range(24, 36):
            coords[idx] = (y, x)
            idx += 1
    valid = np.zeros(V, bool)
    valid[:idx] = True
    lay = W.make_layout(jnp.asarray(coords), jnp.asarray(valid), (0, 0),
                        SST, VOX)
    H, D = 1, 4
    q = rng.normal(size=(V, H, D)).astype(np.float32)
    k = rng.normal(size=(V, H, D)).astype(np.float32)
    v = rng.normal(size=(V, H, D)).astype(np.float32)
    perm = np.asarray(lay.perm)
    got = np.asarray(band_attention(
        jnp.asarray(q[perm])[None], jnp.asarray(k[perm])[None],
        jnp.asarray(v[perm])[None], jnp.asarray(lay.win_id)[None],
        key_valid=jnp.asarray(valid[perm])[None], tile=128, nbands=2))[0]
    want = brute_window_attention(q[perm], k[perm], v[perm],
                                  np.asarray(lay.win_id), valid[perm])
    m = valid[perm]
    np.testing.assert_allclose(got[m], want[m], rtol=2e-4, atol=2e-5)


def test_pos_embed_properties():
    sst = SSTConfig(d_model=128, nhead=8)
    ciw = jnp.stack(jnp.meshgrid(jnp.arange(12), jnp.arange(12),
                                 indexing="ij"), -1).reshape(-1, 2)
    pe = np.asarray(W.positional_embedding(ciw, sst))
    assert pe.shape == (144, 128)
    assert np.all(np.isfinite(pe)) and np.all(np.abs(pe) <= 1.0)
    # distinct positions -> distinct embeddings
    assert len(np.unique(pe.round(5), axis=0)) == 144


def test_composed_shift_permutations(rng):
    """prepare_shift_data's entry/cross permutations compose to the same
    per-shift sorted views as direct permutation by each layout."""
    import jax
    import jax.numpy as jnp

    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.models.sst import _permute, _take, prepare_shift_data
    from geomae_tpu.ops.windows import make_layouts

    voxel = VoxelConfig(point_cloud_range=(-5.12, -5.12, -5, 5.12, 5.12, 3),
                        voxel_size=(0.256, 0.256, 8.0))
    sst = SSTConfig(d_model=8, nhead=2, window_shape=(12, 12),
                    shifts=((0, 0), (6, 6)))
    V = 256
    coords = jnp.asarray(
        rng.integers(0, 40, (1, V, 2)).astype(np.int32))
    valid = jnp.asarray(np.arange(V)[None] < 200)
    lays = make_layouts(coords, valid, sst, voxel)
    pos = [jnp.zeros((1, V, 8), jnp.float32) for _ in sst.shifts]
    data = prepare_shift_data(lays, pos, valid)

    x = jnp.asarray(rng.normal(size=(1, V, 8)).astype(np.float32))
    ep, ei = data["entry"]
    x_entry = _permute(x, ep, ei)              # row -> s1 order
    # cross[0]: s1 -> s0; must equal direct row -> s0
    c0 = data["cross"][0]
    got_s0 = _permute(x_entry, c0[0], c0[1])
    want_s0 = _take(x, lays[0].perm)
    np.testing.assert_allclose(np.asarray(got_s0), np.asarray(want_s0))
    # cross[1]: s0 -> s1; must equal direct row -> s1
    c1 = data["cross"][1]
    got_s1 = _permute(got_s0, c1[0], c1[1])
    np.testing.assert_allclose(np.asarray(got_s1),
                               np.asarray(_take(x, lays[1].perm)))
    # exit restores row order
    back = _permute(got_s1, ei, ep)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_packed_layout_properties(rng):
    """Tile-packed layout: every real token exactly once, windows
    contiguous AND never straddling a 256 boundary, inverse consistent."""
    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.ops.windows import (PACK_TILE, make_layouts_packed,
                                        window_ids)

    sst = SSTConfig()
    voxel = VoxelConfig(point_cloud_range=(-50.0, -50.0, -5.0, 50.0, 50.0,
                                           3.0), voxel_size=(0.25, 0.25, 8.0))
    V, B = 1024, 2
    coords = rng.integers(0, 400, (B, V, 2)).astype(np.int32)
    valid = rng.random((B, V)) < 0.8
    lays = make_layouts_packed(jnp.asarray(coords), jnp.asarray(valid),
                               sst, voxel)
    assert len(lays) == len(sst.shifts)
    for s_i, lay in enumerate(lays):
        perm = np.asarray(lay.perm)
        inv = np.asarray(lay.inv_perm)
        win_p = np.asarray(lay.win_id)
        assert perm.shape == (B, 2 * V)
        for b in range(B):
            real = perm[b][perm[b] != np.iinfo(np.int32).max]
            want = np.where(valid[b])[0]
            assert sorted(real.tolist()) == sorted(want.tolist())
            # inverse consistency
            for r in want:
                assert perm[b, inv[b, r]] == r
            # window contiguity + no 256-straddle + win_id correctness
            win_row, _ = window_ids(jnp.asarray(coords[b]),
                                    jnp.asarray(valid[b]),
                                    sst.shifts[s_i], sst, voxel)
            win_row = np.asarray(win_row)
            slots = np.where(perm[b] != np.iinfo(np.int32).max)[0]
            np.testing.assert_array_equal(win_p[b, slots],
                                          win_row[perm[b, slots]])
            for w in np.unique(win_row[want]):
                ws = slots[win_p[b, slots] == w]
                assert ws.max() - ws.min() + 1 == len(ws)  # contiguous
                assert ws.min() // PACK_TILE == ws.max() // PACK_TILE
