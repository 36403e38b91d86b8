"""Learning-rate / momentum schedules.

Reimplements mmcv's ``CyclicLrUpdaterHook`` / ``CyclicMomentumUpdaterHook``
semantics used by the GeoMAE configs (``configs/_base_/schedules/
cosine_2x.py`` and ``cyclic_20e.py``): one cycle, cosine annealing,
``target_ratio=(up, down)`` and ``step_ratio_up``.

For pretrain: lr ramps base -> base*100 over the first 10% of steps, then
anneals base*100 -> base*100*1e-3 over the rest.  Fine-tune additionally
cycles Adam's beta1 (0.9 -> 0.9*0.85/0.95 -> 0.9).
"""
from __future__ import annotations

import jax.numpy as jnp


def annealing_cos(start: float, end: float, pct):
    """Cosine interpolation from ``start`` to ``end`` as ``pct`` goes 0->1."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + 0.5 * (start - end) * cos_out


def cyclic_schedule(base: float, target_ratio, step_ratio_up: float,
                    total_steps: int):
    """Returns f(step) -> value implementing mmcv one-cycle cosine."""
    up_steps = max(int(total_steps * step_ratio_up), 1)
    hi = base * target_ratio[0]
    lo = hi * target_ratio[1]

    def sched(step):
        step = jnp.minimum(step, total_steps - 1).astype(jnp.float32)
        pct_up = jnp.clip(step / up_steps, 0.0, 1.0)
        pct_down = jnp.clip((step - up_steps) /
                            max(total_steps - up_steps, 1), 0.0, 1.0)
        up = annealing_cos(base, hi, pct_up)
        down = annealing_cos(hi, lo, pct_down)
        return jnp.where(step < up_steps, up, down)

    return sched


def cyclic_momentum_schedule(base: float, target_ratio, step_ratio_up: float,
                             total_steps: int):
    """Momentum cycles *down* first (mmcv momentum hook inverts the ramp)."""
    up_steps = max(int(total_steps * step_ratio_up), 1)
    lo = base * target_ratio[0]

    def sched(step):
        step = jnp.minimum(step, total_steps - 1).astype(jnp.float32)
        pct_up = jnp.clip(step / up_steps, 0.0, 1.0)
        pct_down = jnp.clip((step - up_steps) /
                            max(total_steps - up_steps, 1), 0.0, 1.0)
        down = annealing_cos(base, lo, pct_up)          # ramp down
        up = annealing_cos(lo, base * target_ratio[1], pct_down)
        return jnp.where(step < up_steps, down, up)

    return sched
