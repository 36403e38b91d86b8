"""Train state: params + batch_stats + optax state + step counter."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, grads, tx, new_batch_stats):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(step=self.step + 1, params=new_params,
                          batch_stats=new_batch_stats, opt_state=new_opt)
