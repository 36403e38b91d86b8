"""End-to-end train step: loss decreases, state updates, sharding works."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_pretrain_config
from geomae_tpu.train.pretrain import (dummy_batch, init_state,
                                       make_train_step)


@pytest.mark.slow
def test_train_step_updates_and_learns():
    cfg = tiny_pretrain_config()
    state, tx = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, tx))
    batch = dummy_batch(cfg, batch_size=2, seed=11)

    key = jax.random.PRNGKey(42)
    first = None
    for i in range(8):
        state, losses = step(state, batch, key)  # fixed rng: same mask
        if first is None:
            first = float(losses["loss"])
    last = float(losses["loss"])
    assert int(state.step) == 8
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_multichip_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    # use the tiny config path indirectly: entry() uses reduced caps but the
    # full-size model; compile on CPU is slow, so just trace the fn instead.
    fn, args = ge.entry()
    shapes = jax.eval_shape(fn, *args)
    assert shapes.shape == ()


@pytest.mark.slow
def test_graft_entry_executes_full_size():
    """Actually RUN the full-size entry() on CPU (not just eval_shape) —
    catches runtime OOM / kernel regressions before they reach the TPU
    bench (VERDICT r1 weak #7)."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    val = float(jax.tree_util.tree_leaves(loss)[0])
    assert np.isfinite(val)
