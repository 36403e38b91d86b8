"""Optimizer assembly: AdamW + grad clip + cyclic schedules + norm-param
weight-decay exclusion.

Mirrors the reference's mmcv optimizer config (``configs/_base_/schedules/
cosine_2x.py``: AdamW lr 1e-5 wd 0.05 betas (0.9, 0.999), grad_clip
max_norm 10, ``paramwise_cfg custom_keys {'norm': decay_mult 0}``) on
optax primitives.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig
from .schedules import cyclic_momentum_schedule, cyclic_schedule

_NORM_KEYS = ("norm", "layernorm", "bn", "batch_stats", "scale", "bias",
              "mask_token")
# Reference paramwise_cfg matches parameter paths containing 'norm' — that
# covers all BN/LN modules (named 'norm'/'norm1'/'norm2').  flax LayerNorm
# params are {scale, bias} under module names containing 'norm'; we exclude
# by module-path substring 'norm' only, like the reference.


def _no_decay(path) -> bool:
    names = [getattr(k, "key", str(k)).lower() for k in path]
    return any("norm" in n for n in names) or "mask_token" in names


def decay_mask(params) -> Any:
    """True where weight decay applies."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [not _no_decay(p) for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, vals)


def make_optimizer(cfg: OptimConfig):
    lr = cyclic_schedule(cfg.lr, cfg.target_ratio, cfg.step_ratio_up,
                         cfg.total_steps)
    if cfg.momentum_ratio is not None:
        b1 = cyclic_momentum_schedule(cfg.betas[0], cfg.momentum_ratio,
                                      cfg.step_ratio_up, cfg.total_steps)
    else:
        b1 = None

    def _adamw(learning_rate, b1_val):
        return optax.adamw(
            learning_rate=learning_rate, b1=b1_val, b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
            mask=decay_mask if cfg.no_decay_norm else None)

    if b1 is None:
        inner = _adamw(lr, cfg.betas[0])
    else:
        inner = optax.inject_hyperparams(
            lambda learning_rate, b1_val: _adamw(learning_rate, b1_val)
        )(learning_rate=lr, b1_val=b1)

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        inner,
    )
