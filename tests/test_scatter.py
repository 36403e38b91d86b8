import jax
import jax.numpy as jnp
import numpy as np

from geomae_tpu.ops import scatter


def test_segment_mean_max_vs_numpy(rng):
    N, S, C = 300, 17, 4
    data = rng.normal(size=(N, C)).astype(np.float32)
    ids = rng.integers(-2, S + 3, size=N).astype(np.int32)  # incl. out-of-range
    valid = rng.random(N) > 0.2

    mean, cnt = scatter.segment_mean(jnp.asarray(data), jnp.asarray(ids), S,
                                     jnp.asarray(valid))
    mx = scatter.segment_max(jnp.asarray(data), jnp.asarray(ids), S,
                             jnp.asarray(valid), empty_value=-7.0)
    for s in range(S):
        sel = (ids == s) & valid & (ids >= 0) & (ids < S)
        if sel.sum():
            np.testing.assert_allclose(np.asarray(mean)[s],
                                       data[sel].mean(0), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(mx)[s],
                                       data[sel].max(0), rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(mean)[s], 0.0)
            np.testing.assert_array_equal(np.asarray(mx)[s], -7.0)
        assert np.asarray(cnt)[s] == sel.sum()


def test_sorted_segment_ops_vs_numpy(rng):
    N, S, C = 500, 40, 3
    ids = np.sort(rng.integers(0, S, size=N)).astype(np.int32)
    data = rng.normal(size=(N, C)).astype(np.float32) + 5.0  # biased: tests centering
    valid = rng.random(N) > 0.15
    # invalid elements must be a suffix to preserve sortedness contract?
    # no — validity may interleave; ids stay ascending either way.
    mean, cnt = scatter.segment_mean(jnp.asarray(data), jnp.asarray(ids), S,
                                     jnp.asarray(valid), sorted_ids=True)
    mx = scatter.segment_max(jnp.asarray(data), jnp.asarray(ids), S,
                             jnp.asarray(valid), empty_value=-3.0,
                             sorted_ids=True)
    s = scatter.segment_sum(jnp.asarray(data), jnp.asarray(ids), S,
                            jnp.asarray(valid), sorted_ids=True)
    c2 = scatter.segment_count(jnp.asarray(ids), S, jnp.asarray(valid),
                               sorted_ids=True)
    for seg in range(S):
        sel = (ids == seg) & valid
        assert np.asarray(cnt)[seg] == sel.sum() == np.asarray(c2)[seg]
        if sel.sum():
            np.testing.assert_allclose(np.asarray(mean)[seg],
                                       data[sel].mean(0), rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(s)[seg],
                                       data[sel].sum(0), rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(mx)[seg],
                                       data[sel].max(0), rtol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(mean)[seg], 0.0)
            np.testing.assert_array_equal(np.asarray(mx)[seg], -3.0)


def test_sorted_segment_grad(rng):
    """Gradients flow through the sorted max/mean paths."""
    N, S, C = 64, 8, 4
    ids = np.sort(rng.integers(0, S, size=N)).astype(np.int32)
    data = rng.normal(size=(N, C)).astype(np.float32)
    valid = np.ones(N, bool)

    def f(x):
        mx = scatter.segment_max(x, jnp.asarray(ids), S, jnp.asarray(valid),
                                 sorted_ids=True)
        mean, _ = scatter.segment_mean(x, jnp.asarray(ids), S,
                                       jnp.asarray(valid), sorted_ids=True)
        return jnp.sum(mx ** 2) + jnp.sum(mean ** 2)

    g = jax.grad(f)(jnp.asarray(data))
    # finite-difference check on a few coordinates
    eps = 1e-3
    for (i, j) in [(0, 0), (10, 2), (63, 3)]:
        d2 = data.copy()
        d2[i, j] += eps
        d1 = data.copy()
        d1[i, j] -= eps
        fd = (float(f(jnp.asarray(d2))) - float(f(jnp.asarray(d1)))) / (2 * eps)
        assert abs(float(g[i, j]) - fd) < 5e-2, (i, j, float(g[i, j]), fd)


def test_gather_rows_fill():
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.array([0, 3, 4, -1, 2], jnp.int32)
    out = np.asarray(scatter.gather_rows(table, idx, fill=9.0))
    np.testing.assert_array_equal(out[0], [0, 1, 2])
    np.testing.assert_array_equal(out[1], [9, 10, 11])
    np.testing.assert_array_equal(out[2], [9, 9, 9])
    np.testing.assert_array_equal(out[3], [9, 9, 9])
    np.testing.assert_array_equal(out[4], [6, 7, 8])


def test_gather_injective_matches_take_rows(rng):
    """Forward == take_rows_sorted; backward == its (masked) transpose."""
    import jax
    from geomae_tpu.ops.scatter import gather_injective, take_rows_sorted

    V, S, C = 64, 24, 5
    INT32_MAX = np.iinfo(np.int32).max
    keep = rng.uniform(size=V) < 0.4
    rows = np.where(keep)[0].astype(np.int32)[:S]
    idx = np.full(S, INT32_MAX, np.int32)
    idx[:rows.size] = rows
    inv = np.full(V, INT32_MAX, np.int32)
    inv[rows] = np.arange(rows.size, dtype=np.int32)
    x = rng.normal(size=(V, C)).astype(np.float32)

    got = gather_injective(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(inv))
    want = take_rows_sorted(jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    g = rng.normal(size=(S, C)).astype(np.float32)

    def f_new(t):
        return jnp.sum(gather_injective(
            t, jnp.asarray(idx), jnp.asarray(inv)) * g)

    def f_ref(t):
        return jnp.sum(take_rows_sorted(t, jnp.asarray(idx)) * g)

    g_new = jax.grad(f_new)(jnp.asarray(x))
    g_ref = jax.grad(f_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    # expansion direction: gather by the inverse map, backward by idx
    y = rng.normal(size=(S, C)).astype(np.float32)
    got_e = gather_injective(jnp.asarray(y), jnp.asarray(inv),
                             jnp.asarray(idx))
    want_e = np.zeros((V, C), np.float32)
    want_e[rows] = y[:rows.size]
    np.testing.assert_allclose(np.asarray(got_e), want_e)
    ge = rng.normal(size=(V, C)).astype(np.float32)
    g_exp = jax.grad(lambda t: jnp.sum(gather_injective(
        t, jnp.asarray(inv), jnp.asarray(idx)) * ge))(jnp.asarray(y))
    want_g = np.zeros((S, C), np.float32)
    want_g[:rows.size] = ge[rows]
    np.testing.assert_allclose(np.asarray(g_exp), want_g)
