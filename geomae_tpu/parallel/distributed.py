"""Multi-process (multi-host) result collection.

The reference gathers per-rank eval results with mmdet's
``collect_results_cpu`` before ``dataset.evaluate``
(``/root/reference/mmdet3d/apis/test.py:10`` + ``tools/test.py``).  The
TPU-native equivalent rides ``jax.experimental.multihost_utils``: each
process contributes its shard of host-side results and every process
receives the concatenation.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import numpy as np


def gather_results(local: Sequence[Any]) -> List[Any]:
    """All-gather a list of per-process results across JAX processes.

    Single-process runs return ``local`` unchanged.  Multi-process runs
    require every process to call with the same list LENGTH structure is
    not needed — lists are exchanged via flattened numpy payloads.
    """
    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils

    import pickle

    payload = np.frombuffer(pickle.dumps(list(local)), dtype=np.uint8)
    # pad to the max size across processes (allgather needs equal shapes)
    size = np.asarray([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(size).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[:payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)  # [P, max_size]
    out: List[Any] = []
    for p in range(gathered.shape[0]):
        out.extend(pickle.loads(gathered[p, :int(sizes[p])].tobytes()))
    return out


def gather_scalar_mean(x: float) -> float:
    """Mean of a host scalar across processes (single-process: identity)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([x], np.float64))
    return float(np.mean(vals))
