"""GeoMAE pretrain: init + jittable train/eval steps.

This is the TPU-native counterpart of the reference call stack
``EpochBasedRunner.train -> MultiSubVoxelDynamicVoxelNetSSL.forward_train``
(SURVEY.md §3.1): one pure function voxelizes, computes geometric targets,
samples the mask, runs the model, and returns the loss dict; ``jax.jit``
over a data-sharded mesh replaces DDP.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import PretrainConfig
from ..models.mae import (GeoMAE, compute_targets_batch, pretrain_loss,
                          sample_mask)
from ..ops.voxelize import build_scene_batch
from .optim import make_optimizer
from .state import TrainState


def build_model(cfg: PretrainConfig) -> GeoMAE:
    return GeoMAE(cfg)


def dummy_batch(cfg: PretrainConfig, batch_size: int, seed: int = 0) -> Dict:
    """A synthetic batch with plausible point statistics (for init/tests)."""
    rng = jax.random.PRNGKey(seed)
    P = cfg.caps.max_points
    r = cfg.voxel.point_cloud_range
    k1, k2 = jax.random.split(rng)
    lo = jnp.array([r[0], r[1], r[2], 0.0, 0.0])
    hi = jnp.array([r[3], r[4], r[5], 1.0, 0.45])
    pts = jax.random.uniform(k1, (batch_size, P, 5)) * (hi - lo) + lo
    n = jax.random.randint(k2, (batch_size,), P // 2, P)
    valid = jnp.arange(P)[None, :] < n[:, None]
    return dict(points=pts.astype(jnp.float32), point_valid=valid)


def forward(cfg: PretrainConfig, variables, batch, rng, train: bool):
    """Voxelize -> targets -> mask -> model.  Returns (losses, new_stats).

    When the loader pre-voxelized on host (``data.native_prep.
    build_scene_host``) the batch carries the scene arrays and the device
    skips the sort entirely.
    """
    model = build_model(cfg)
    if "p2v" in batch:
        from ..ops.voxelize import scene_from_arrays
        scene = scene_from_arrays(batch)
    else:
        scene = build_scene_batch(batch["points"], batch["point_valid"],
                                  cfg.voxel, cfg.caps.max_voxels)
        # materialize the sorted scene ONCE: without the barrier XLA fuses
        # the canonical sort's row gathers into each downstream consumer
        # (targets, VFE, loss), re-running them — measured 113 -> 91 ms on
        # the scene+targets slice alone (v5e)
        leaves, treedef = jax.tree_util.tree_flatten(scene)
        scene = jax.tree_util.tree_unflatten(
            treedef, jax.lax.optimization_barrier(tuple(leaves)))
    targets = jax.tree_util.tree_map(
        jax.lax.stop_gradient, compute_targets_batch(scene, cfg))
    keep = sample_mask(rng, scene.table.valid, cfg.mae.random_mask_ratio)

    if train:
        preds, mut = model.apply(variables, scene, keep,
                                 train=True, mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
    else:
        preds = model.apply(variables, scene, keep, train=False)
        new_stats = variables["batch_stats"]
    losses = pretrain_loss(preds, targets, scene, keep, cfg)
    return losses, new_stats


def init_state(cfg: PretrainConfig, batch_size: int,
               rng: jax.Array) -> Tuple[TrainState, object]:
    model = build_model(cfg)
    batch = dummy_batch(cfg, batch_size)
    # jit the setup: eager per-op dispatch is pathological on remote TPUs
    scene, keep = jax.jit(lambda p, v, k: (
        lambda s: (s, sample_mask(k, s.table.valid,
                                  cfg.mae.random_mask_ratio)))(
        build_scene_batch(p, v, cfg.voxel, cfg.caps.max_voxels)))(
        batch["points"], batch["point_valid"], rng)
    k_init, _ = jax.random.split(rng)
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(k_init, scene, keep)
    tx = make_optimizer(cfg.optim)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    return state, tx


def make_train_step(cfg: PretrainConfig, tx):
    """Returns jittable ``step(state, batch, rng) -> (state, metrics)``."""

    def loss_fn(params, batch_stats, batch, rng):
        losses, new_stats = forward(
            cfg, {"params": params, "batch_stats": batch_stats},
            batch, rng, train=True)
        return losses["loss"], (losses, new_stats)

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        new_state = state.apply_gradients(grads, tx, new_stats)
        return new_state, losses

    return train_step


def make_eval_step(cfg: PretrainConfig):
    def eval_step(state: TrainState, batch, rng):
        losses, _ = forward(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            batch, rng, train=False)
        return losses
    return eval_step


def make_eval_hook(cfg: PretrainConfig):
    """``eval_fn(state, loader) -> mean loss dict`` for the trainer's
    periodic-eval hook (the reference's EvalHook contract; VERDICT r1 #6).
    Deterministic mask rng so the metric is comparable across evals."""
    estep = jax.jit(make_eval_step(cfg))

    def hook(state, loader):
        sums: Dict[str, float] = {}
        n = 0
        rng = jax.random.PRNGKey(0)
        for batch in loader:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            losses = estep(state, batch, rng)
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    return hook
