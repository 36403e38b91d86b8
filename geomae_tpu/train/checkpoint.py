"""Checkpoint / resume via orbax.

Replaces mmcv ``CheckpointHook`` + ``resume_from``/``load_from``
(``/root/reference/configs/_base_/default_runtime.py:1``, ``tools/train.py:
207-217``): full-state checkpoints (params + batch_stats + optimizer +
step) every N steps with retention, plus weights-only export for fine-tune
consumption (the ``publish_model`` analogue).

Layout note: SST stacks are ``nn.scan``-compiled, so block parameters live
under a stacked ``blocks/block/...`` subtree (leading axis = depth), not
per-block ``block_{i}`` subtrees.  Checkpoints written before that change
do not restore directly; ``train/torch_import.py`` contains the stacking
transform should a legacy tree ever need migrating (none are known to
exist — the layout predates any released checkpoint of this repo).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, metrics: Optional[dict] = None,
             force: bool = False):
        step = int(state.step)
        if step in (self.mgr.all_steps() or []):
            return  # already checkpointed (e.g. final save after interval)
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics=metrics, force=force)

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()


def save_weights(path: str, params: Any, batch_stats: Any = None):
    """Weights-only export (``publish_model`` analogue)."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr.save(os.path.abspath(path), payload)
    ckptr.wait_until_finished()


def _resolve_ckpt_dir(path: str) -> str:
    """Accept any of: a weights-only export, a trainer ckpt root (pick the
    latest step), or one step directory (descend into the ``default`` item).
    Mirrors the reference's ``load_from`` taking whatever ``work_dir``
    checkpoint the user points at."""
    path = os.path.abspath(path)
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_METADATA")):
        steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
        if steps:
            path = os.path.join(path, str(steps[-1]))
        if os.path.isdir(os.path.join(path, "default")):
            path = os.path.join(path, "default")
    return path


def load_weights(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(_resolve_ckpt_dir(path), target=template)
    return payload
