"""Pallas segmented reduce vs reference segment ops (interpret mode needs
real DMA semantics, so these run through the pure-callable path on CPU via
pallas interpret=... — here we instead compare against numpy directly using
the public wrapper with interpret enabled through force_tpu_interpret_mode).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geomae_tpu.ops.pallas_segreduce import segment_reduce_pallas


def make_case(rng, B=2, P=256, C=5, S=40):
    ids = np.sort(rng.integers(0, S, (B, P)), axis=1).astype(np.int32)
    # suffix padding: route last rows to the sentinel segment S
    for b in range(B):
        n = rng.integers(P // 2, P)
        ids[b, n:] = S
    x = rng.normal(size=(B, P, C)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(ids)


@pytest.mark.parametrize("is_max", [False, True])
def test_segreduce_matches_numpy(rng, is_max):
    B, P, C, S = 2, 256, 5, 40
    x, ids = make_case(rng, B, P, C, S)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(segment_reduce_pallas(x, ids, S, is_max, chunk=64))
    xn, idn = np.asarray(x), np.asarray(ids)
    for b in range(B):
        for s in range(S):
            sel = idn[b] == s
            if not sel.any():
                continue  # unwritten rows are garbage by contract
            want = xn[b][sel].max(0) if is_max else xn[b][sel].sum(0)
            np.testing.assert_allclose(out[b, s], want, rtol=1e-5,
                                       atol=1e-5)


def test_segreduce_grad_sum(rng):
    B, P, C, S = 1, 128, 3, 10
    x, ids = make_case(rng, B, P, C, S)

    def f(x_):
        with pltpu.force_tpu_interpret_mode():
            o = segment_reduce_pallas(x_, ids, S, False, chunk=64)
        # only occupied rows (others garbage)
        occ = jnp.zeros((B, S), bool)
        for s in range(S):
            occ = occ.at[:, s].set((ids == s).any(axis=1))
        return jnp.sum(jnp.where(occ[..., None], o, 0.0) ** 2)

    g = jax.grad(f)(x)
    # numeric check on a few coords
    eps = 1e-3
    xn = np.asarray(x)
    for (i, j) in [(0, 0), (50, 2), (127, 1)]:
        d1, d2 = xn.copy(), xn.copy()
        d1[0, i, j] -= eps
        d2[0, i, j] += eps
        fd = (float(f(jnp.asarray(d2))) - float(f(jnp.asarray(d1)))) / (2 * eps)
        assert abs(float(g[0, i, j]) - fd) < 5e-2, (i, j)
