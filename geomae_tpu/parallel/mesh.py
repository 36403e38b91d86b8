"""Device mesh + shardings for data-parallel training.

The reference scales with NCCL DDP (``tools/dist_train.sh`` +
``MMDistributedDataParallel``; SURVEY.md §2.7).  The TPU-native equivalent:
one ``jax.sharding.Mesh`` over a ``data`` axis; batches shard their leading
dim, parameters replicate, and XLA inserts the gradient all-reduce (and the
SyncBN moment reductions) over ICI automatically.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) needs {n_devices} devices but the "
                f"{devs[0].platform} backend has only {len(devs)}. For a "
                "virtual multi-chip run set JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} BEFORE "
                "importing jax (dryrun_multichip does this via a subprocess).")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put every leaf with its leading dim over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
