"""Trainer loop: logging, checkpoint/resume, schedules, optimizer."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import OptimConfig, tiny_pretrain_config
from geomae_tpu.train.optim import decay_mask, make_optimizer
from geomae_tpu.train.schedules import (cyclic_momentum_schedule,
                                        cyclic_schedule)


def test_cyclic_schedule_shape():
    s = cyclic_schedule(1e-5, (100.0, 1e-3), 0.1, 1000)
    assert abs(float(s(0)) - 1e-5) < 1e-9
    assert abs(float(s(100)) - 1e-3) < 1e-7          # peak = base * 100
    assert float(s(999)) < 1.1e-6                    # anneal to peak * 1e-3
    # monotone up then down
    ups = [float(s(i)) for i in range(0, 101, 10)]
    assert all(b >= a for a, b in zip(ups, ups[1:]))
    downs = [float(s(i)) for i in range(100, 1000, 100)]
    assert all(b <= a for a, b in zip(downs, downs[1:]))


def test_cyclic_momentum_schedule():
    s = cyclic_momentum_schedule(0.9, (0.85 / 0.95, 1.0), 0.4, 1000)
    assert abs(float(s(0)) - 0.9) < 1e-7
    assert abs(float(s(400)) - 0.9 * 0.85 / 0.95) < 1e-6
    assert abs(float(s(999)) - 0.9) < 1e-3


def test_decay_mask_excludes_norms():
    params = {
        "encoder": {"norm1": {"scale": jnp.ones(3), "bias": jnp.ones(3)},
                    "linear1": {"kernel": jnp.ones((3, 3)),
                                "bias": jnp.ones(3)}},
        "mask_token": jnp.ones((1, 4)),
    }
    m = decay_mask(params)
    assert m["encoder"]["norm1"]["scale"] is False
    assert m["encoder"]["linear1"]["kernel"] is True
    assert m["mask_token"] is False


def test_optimizer_clips_and_steps():
    cfg = OptimConfig(lr=1e-3, total_steps=100, grad_clip_norm=1.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    st = tx.init(params)
    huge = {"w": jnp.full((4,), 1e6)}
    upd, _ = tx.update(huge, st, params)
    # clipped to norm 1 then scaled by lr schedule — tiny update
    assert float(jnp.abs(upd["w"]).max()) < 1.0


@pytest.mark.slow
def test_trainer_checkpoint_resume(tmp_path):
    from geomae_tpu.train.pretrain import (dummy_batch, init_state,
                                           make_train_step)
    from geomae_tpu.train.trainer import Trainer

    cfg = tiny_pretrain_config()
    state, tx = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, tx)

    class Loader:
        def __iter__(self):
            for i in range(4):
                yield {k: np.asarray(v) for k, v in
                       dummy_batch(cfg, 2, seed=i).items()}

    from geomae_tpu.parallel.mesh import make_mesh
    wd = str(tmp_path / "run")
    tr = Trainer(step, state, Loader(), wd, total_steps=3, ckpt_interval=1,
                 mesh=make_mesh(2))
    final = tr.run()
    assert int(final.step) == 3
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))

    # resume: new trainer picks up at step 3 and runs to 5
    state2, tx2 = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    tr2 = Trainer(make_train_step(cfg, tx2), state2, Loader(), wd,
                  total_steps=5, ckpt_interval=1, mesh=make_mesh(2))
    assert int(tr2.state.step) == 3
    final2 = tr2.run()
    assert int(final2.step) == 5


@pytest.mark.slow
def test_trainer_eval_hook_fires_on_schedule(tmp_path):
    """The periodic-eval hook (reference EvalHook contract) fires every
    ``eval_interval`` steps plus once at the end."""
    import json

    from geomae_tpu.parallel.mesh import make_mesh
    from geomae_tpu.train.pretrain import (dummy_batch, init_state,
                                           make_eval_hook, make_train_step)
    from geomae_tpu.train.trainer import Trainer

    cfg = tiny_pretrain_config()
    state, tx = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, tx)

    class Loader:
        def __iter__(self):
            for i in range(8):
                yield {k: np.asarray(v) for k, v in
                       dummy_batch(cfg, 2, seed=i).items()}

    eval_batches = [{k: np.asarray(v) for k, v in
                     dummy_batch(cfg, 2, seed=99).items()}]
    calls = []
    hook = make_eval_hook(cfg)

    def eval_fn(st, loader):
        out = hook(st, loader)
        calls.append(dict(out))
        return out

    wd = str(tmp_path / "run_eval")
    tr = Trainer(step, state, Loader(), wd, total_steps=5, ckpt_interval=100,
                 mesh=make_mesh(2), eval_fn=eval_fn,
                 eval_loader=eval_batches, eval_interval=2)
    tr.run()
    # interval=2 over 5 steps -> evals at 2, 4, and the final step 5
    assert len(calls) == 3
    assert all(np.isfinite(c["loss"]) for c in calls)
    # val rows land in metrics.jsonl
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        modes = [json.loads(l).get("mode") for l in f if l.strip()]
    assert modes.count("val") == 3


def test_gather_results_single_process():
    from geomae_tpu.parallel.distributed import gather_results

    local = [dict(a=np.arange(3)), dict(a=np.arange(2))]
    out = gather_results(local)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0]["a"], np.arange(3))
