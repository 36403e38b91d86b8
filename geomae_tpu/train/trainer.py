"""Training loop: the TPU-native ``EpochBasedRunner`` + ``train_detector``
replacement (SURVEY.md §1 L5 / §3.1).

One jitted step over a data-parallel mesh; host-side prefetch loader;
checkpoint-every-N with auto-resume (crash => relaunch resumes, the
reference's failure-recovery contract, SURVEY.md §5); metrics logging.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh
from ..utils.logging import MetricsLogger, collect_env, get_root_logger
from .checkpoint import CheckpointManager
from .state import TrainState


class Trainer:
    """Drives any (state, batch[, rng]) -> (state, metrics) step function.

    Args:
      step_fn: the jittable train step.
      state: initial TrainState (replicated onto the mesh here).
      loader: iterable of host batches (re-iterated per epoch).
      work_dir: logs + checkpoints.
      with_rng: whether step_fn takes a per-step jax rng (pretrain does).
    """

    def __init__(self, step_fn: Callable, state: TrainState, loader,
                 work_dir: str, total_steps: int,
                 with_rng: bool = True, seed: int = 0,
                 log_interval: int = 50, ckpt_interval: int = 1000,
                 mesh=None, resume: bool = True,
                 eval_fn: Optional[Callable] = None, eval_loader=None,
                 eval_interval: int = 0):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        self.logger = get_root_logger(os.path.join(self.work_dir, "train.log"))
        self.metrics = MetricsLogger(self.work_dir, log_interval)
        self.loader = loader
        self.total_steps = total_steps
        self.with_rng = with_rng
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ckpt = CheckpointManager(os.path.join(self.work_dir, "ckpt"),
                                      save_interval_steps=ckpt_interval)

        repl = NamedSharding(self.mesh, P())
        bsh = NamedSharding(self.mesh, P("data"))
        in_shardings = (repl, bsh, repl) if with_rng else (repl, bsh)
        self.step_fn = jax.jit(step_fn, in_shardings=in_shardings,
                               out_shardings=(repl, repl),
                               donate_argnums=(0,))
        self._bsh = bsh

        # periodic evaluation hook — the reference's ``EvalHook`` driven by
        # ``evaluation = dict(interval=...)`` (``configs/mae_sst/...6x_1e-5
        # .py:291``); fires every ``eval_interval`` steps and once at the
        # end of training.
        self.eval_fn = eval_fn
        self.eval_loader = eval_loader
        self.eval_interval = eval_interval

        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            self.logger.info("resumed from step %d", int(state.step))
        self.state = jax.device_put(state, repl)
        self.rng = jax.random.PRNGKey(seed)
        for k, v in collect_env().items():
            self.logger.info("env %s: %s", k, v)

    def _prefetch(self, it, depth: int = 2):
        """Double-buffered device transfer (the reference's DataLoader
        worker prefetch, SURVEY.md §5 long-pole note).

        ``device_put`` only *enqueues* the H2D copy, so pushing the next
        batch before the current step's result is consumed overlaps the
        transfer with device compute instead of serializing behind it.
        """
        import collections
        q = collections.deque()
        for batch in it:
            q.append(jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._bsh), batch))
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    def run(self):
        step = int(self.state.step)
        while step < self.total_steps:
            made_progress = False
            for batch in self._prefetch(iter(self.loader)):
                made_progress = True
                if step >= self.total_steps:
                    break
                if self.with_rng:
                    self.rng, k = jax.random.split(self.rng)
                    self.state, metrics = self.step_fn(self.state, batch, k)
                else:
                    self.state, metrics = self.step_fn(self.state, batch)
                step += 1
                self.metrics.log(step, metrics)
                self.ckpt.save(self.state)
                if (self.eval_fn is not None and self.eval_interval
                        and step % self.eval_interval == 0):
                    self.evaluate(step)
            if not made_progress:
                raise RuntimeError(
                    "loader yielded no batches (dataset smaller than the "
                    "global batch?) — training cannot make progress")
        if self.eval_fn is not None and (
                not self.eval_interval or step % self.eval_interval):
            self.evaluate(step)
        self.ckpt.save(self.state, force=True)
        self.ckpt.wait()
        self.logger.info("training done at step %d", step)
        return self.state

    def evaluate(self, step: int) -> dict:
        """Run the eval hook and log its scalars under ``val/``."""
        results = self.eval_fn(self.state, self.eval_loader)
        scalars = {k: float(np.asarray(v)) for k, v in results.items()}
        self.metrics.log(step, scalars, prefix="val", force=True)
        self.logger.info(
            "eval @ step %d: %s", step,
            ", ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
        return results
