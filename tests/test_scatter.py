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


def test_gather_rows_fill():
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.array([0, 3, 4, -1, 2], jnp.int32)
    out = np.asarray(scatter.gather_rows(table, idx, fill=9.0))
    np.testing.assert_array_equal(out[0], [0, 1, 2])
    np.testing.assert_array_equal(out[1], [9, 10, 11])
    np.testing.assert_array_equal(out[2], [9, 9, 9])
    np.testing.assert_array_equal(out[3], [9, 9, 9])
    np.testing.assert_array_equal(out[4], [6, 7, 8])
