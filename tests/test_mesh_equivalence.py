"""1-device vs 8-device numerical equivalence of the jitted train step.

VERDICT.md round-2 weak #8: the dryrun only smoke-tests the sharded
program.  Here the SAME global batch runs through the same train step on a
1-device mesh and an 8-device mesh; the losses and the SyncBN batch_stats
(global masked moments -> psum over shards) must agree to f32 reduction
tolerance.  This pins the collective semantics: a wrong pmean/psum scaling
or a per-shard (instead of global) BN statistic shifts these immediately.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from geomae_tpu.config import tiny_pretrain_config
from geomae_tpu.parallel.mesh import make_mesh
from geomae_tpu.train.pretrain import dummy_batch, init_state, make_train_step


@pytest.mark.slow
def test_train_step_1dev_vs_8dev_equivalence():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    cfg = tiny_pretrain_config()
    rng = jax.random.PRNGKey(0)
    state, tx = init_state(cfg, batch_size=8, rng=rng)
    step = make_train_step(cfg, tx)
    batch = dummy_batch(cfg, batch_size=8, seed=13)
    step_rng = jax.random.PRNGKey(7)

    results = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        jit_step = jax.jit(step, in_shardings=(repl, bsh, repl),
                           out_shardings=(repl, repl))
        new_state, losses = jit_step(jax.device_put(state, repl),
                                     jax.device_put(batch, bsh), step_rng)
        results[n] = (jax.device_get(losses),
                      jax.device_get(new_state.batch_stats),
                      jax.device_get(new_state.params))

    l1, bs1, p1 = results[1]
    l8, bs8, p8 = results[8]
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    # SyncBN moments: global masked mean/var must not depend on sharding
    flat1 = jax.tree_util.tree_leaves_with_path(bs1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(bs8))
    assert len(flat1) > 0
    for path, a in flat1:
        b = flat8[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))
    # updated params (post-AdamW) agree too — the gradient all-reduce is
    # a mean regardless of shard count
    n_close = 0
    tot = 0
    for (path, a) in jax.tree_util.tree_leaves_with_path(p1):
        b = dict(jax.tree_util.tree_leaves_with_path(p8))[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))
        n_close += 1
        tot += 1
    assert n_close == tot and tot > 10
