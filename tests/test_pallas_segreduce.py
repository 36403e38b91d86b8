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


def test_segment_gather_matches_take(rng):
    from geomae_tpu.ops.pallas_segreduce import segment_gather_pallas
    B, P, S, C = 2, 256, 40, 5
    # dense ascending rank ids with sentinel suffix
    ids = np.sort(rng.integers(0, S, (B, P)), axis=1).astype(np.int32)
    for b in range(B):
        u = np.unique(ids[b])
        remap = {v: i for i, v in enumerate(u)}
        ids[b] = np.vectorize(remap.get)(ids[b])
        n = rng.integers(P // 2, P)
        ids[b, n:] = S
    table = rng.normal(size=(B, S, C)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(segment_gather_pallas(
            jnp.asarray(table), jnp.asarray(ids), 64))
    want = np.take_along_axis(
        np.pad(table, ((0, 0), (0, 1), (0, 0))),
        np.minimum(ids, S)[..., None], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_gather_bf16_aligned(rng):
    """bf16 tables take the 16-aligned dynamic-window path (packed
    sublanes make arbitrary dynamic offsets unprovable for Mosaic)."""
    from geomae_tpu.ops.pallas_segreduce import segment_gather_pallas
    B, P, S, C = 2, 256, 40, 5
    ids = np.sort(rng.integers(0, S, (B, P)), axis=1).astype(np.int32)
    for b in range(B):
        u = np.unique(ids[b])
        remap = {v: i for i, v in enumerate(u)}
        ids[b] = np.vectorize(remap.get)(ids[b])
        n = rng.integers(P // 2, P)
        ids[b, n:] = S
    table = rng.normal(size=(B, S, C)).astype(np.float32)
    tb = jnp.asarray(table).astype(jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(segment_gather_pallas(
            tb, jnp.asarray(ids), 64).astype(jnp.float32))
    want = np.take_along_axis(
        np.pad(np.asarray(tb.astype(jnp.float32)),
               ((0, 0), (0, 1), (0, 0))),
        np.minimum(ids, S)[..., None], axis=1)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)  # pure selection


def test_segment_gather_grad(rng):
    from geomae_tpu.ops.pallas_segreduce import segment_gather_pallas
    B, P, S, C = 1, 128, 10, 3
    ids = np.sort(rng.integers(0, S, (B, P)), axis=1).astype(np.int32)
    u = np.unique(ids[0]); remap = {v: i for i, v in enumerate(u)}
    ids[0] = np.vectorize(remap.get)(ids[0])
    ids[0, 100:] = S
    occupied = np.zeros((B, S), bool)
    for s in range(S):
        occupied[0, s] = (ids[0] == s).any()
    table = rng.normal(size=(B, S, C)).astype(np.float32)

    def f(t):
        t = jnp.where(jnp.asarray(occupied)[..., None], t, 0.0)
        o = segment_gather_pallas(t, jnp.asarray(ids), 64)
        return jnp.sum(o ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f)(jnp.asarray(table))
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    with pltpu.force_tpu_interpret_mode():
        for (s, c) in [(0, 0), (4, 2)]:
            d1, d2 = table.copy(), table.copy()
            d1[0, s, c] -= eps; d2[0, s, c] += eps
            fd = (float(f(jnp.asarray(d2)))
                  - float(f(jnp.asarray(d1)))) / (2 * eps)
            assert abs(float(g[0, s, c]) - fd) < 5e-2, (s, c)


def test_slot_outer_segment_sum(rng):
    from geomae_tpu.ops.pallas_segreduce import slot_outer_segment_sum_pallas
    B, P, S_SEG, NS, CV = 2, 256, 30, 16, 4
    seg = np.sort(rng.integers(0, S_SEG, (B, P)), axis=1).astype(np.int32)
    slot = rng.integers(0, NS, (B, P)).astype(np.int32)
    vals = rng.normal(size=(B, P, CV)).astype(np.float32)
    for b in range(B):  # sentinel suffix with zeroed vals
        n = rng.integers(P // 2, P)
        seg[b, n:] = S_SEG
        vals[b, n:] = 0
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(slot_outer_segment_sum_pallas(
            jnp.asarray(vals), jnp.asarray(slot), jnp.asarray(seg),
            NS, S_SEG, chunk=64))
    want = np.zeros((B, S_SEG, NS, CV), np.float32)
    for b in range(B):
        for t in range(P):
            if seg[b, t] < S_SEG:
                want[b, seg[b, t], slot[b, t]] += vals[b, t]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_segment_broadcast_matches_numpy(rng, op):
    from geomae_tpu.ops.pallas_segreduce import segment_broadcast_pallas
    B, P, C, S = 2, 256, 5, 40
    x, ids = make_case(rng, B, P, C, S)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(segment_broadcast_pallas(x, ids, S, op, chunk=64))
    xn, idn = np.asarray(x), np.asarray(ids)
    want = np.zeros_like(xn)
    for b in range(B):
        for s in range(S):
            sel = idn[b] == s
            if not sel.any():
                continue
            if op == "max":
                red = xn[b][sel].max(0)
            elif op == "mean":
                red = xn[b][sel].mean(0)
            else:
                red = xn[b][sel].sum(0)
            want[b, sel] = red
    # sentinel rows (ids == S) must read 0 — covered by want's zeros
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["mean", "max"])
def test_segment_broadcast_grad(rng, op):
    from geomae_tpu.ops.pallas_segreduce import segment_broadcast_pallas
    B, P, C, S = 1, 128, 3, 10
    x, ids = make_case(rng, B, P, C, S)

    def f(x_):
        with pltpu.force_tpu_interpret_mode():
            o = segment_broadcast_pallas(x_, ids, S, op, chunk=64)
        return jnp.sum(o ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    xn = np.asarray(x)
    for (i, j) in [(0, 0), (50, 2), (120, 1)]:
        d1, d2 = xn.copy(), xn.copy()
        d1[0, i, j] -= eps
        d2[0, i, j] += eps
        fd = (float(f(jnp.asarray(d2))) - float(f(jnp.asarray(d1)))) / (2 * eps)
        assert abs(float(g[0, i, j]) - fd) < 5e-2, (i, j, op)


def test_expand_rows_matches_scatter():
    """expand_rows_pallas == zeros.at[key].set for unique ascending keys
    (sentinel tail sums, but callers discard that row)."""
    from geomae_tpu.ops.pallas_segreduce import expand_rows_pallas

    rng = np.random.default_rng(7)
    B, V, C, n_cells = 2, 96, 13, 1600
    feats = (rng.normal(size=(B, V, C)) * 1000).astype(np.float32)
    keys = np.zeros((B, V), np.int32)
    for b in range(B):
        nv = int(rng.integers(40, 80))
        keys[b, :nv] = np.sort(rng.choice(n_cells, nv, replace=False))
        keys[b, nv:] = n_cells
    ref = np.zeros((B, n_cells + 1, C), np.float32)
    for b in range(B):
        for r in range(V):
            ref[b, keys[b, r]] += feats[b, r]
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(lambda f, k: expand_rows_pallas(
            f, k, n_cells, chunk=512))(jnp.asarray(feats),
                                       jnp.asarray(keys))
    # exact (hi/lo split) on real cells; the sentinel row is discarded
    np.testing.assert_array_equal(np.asarray(out)[:, :n_cells],
                                  ref[:, :n_cells])
