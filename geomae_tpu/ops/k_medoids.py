"""Batched k-medoids clustering (TPU-native).

Reference: ``mmdet3d/ops/sst/k_medoids.py`` (pure torch, used by the
experimental SRA block).  Same algorithm, different shape: the
reference's ``update_medoids`` loops over clusters and zeroes rows /
columns of a cloned [B, N, N] matrix per cluster; here the per-cluster
member sums for ALL clusters come from one batched matmul
``dist @ one_hot(assignment)`` and the row masking is elementwise —
no clones, no data-dependent loops, everything under ``fori_loop`` with
static trip count so it jits.

Semantics matched exactly (same fixtures drive the reference code in
``tests/test_pointnet_ops.py``):

* initial medoids = the ``num_clusters`` smallest column sums of the
  row-normalized distance matrix;
* assignment = nearest current medoid (first-min tie break);
* medoid update = the in-cluster point minimizing total distance to its
  cluster; empty sums fall back to 1e6 exactly like the reference
  (including the single-member-cluster case where d(j,j) == 0);
* ``num_clusters >= num_samples`` short-circuits to
  ``[0..N) + padding_idx`` fill.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_initial_medoids(dist, num_clusters: int):
    """[B, N, N] -> [B, K] indices of the K smallest normalized scores."""
    norm = dist / (jnp.sum(dist, axis=-1, keepdims=True) + 1e-8)
    scores = jnp.sum(norm, axis=1)                       # [B, N]
    _, idx = jax.lax.top_k(-scores, num_clusters)
    return idx.astype(jnp.int32)


def assign_samples_to_medoids(dist, medoids):
    """Nearest-medoid assignment.

    Returns (assignment [B, N] int32, total min-distance [B]).
    """
    b, n, _ = dist.shape
    k = medoids.shape[1]
    d2m = jnp.take_along_axis(
        dist, jnp.broadcast_to(medoids[:, None, :], (b, n, k)), axis=2)
    assignment = jnp.argmin(d2m, axis=2).astype(jnp.int32)
    return assignment, jnp.sum(jnp.min(d2m, axis=2), axis=-1)


def update_medoids(dist, assignment, num_clusters: int):
    """New medoid per cluster = argmin_j sum_{s in cluster} d[j, s],
    restricted to in-cluster j; all-zero sums are pushed to 1e6."""
    a = jax.nn.one_hot(assignment, num_clusters, dtype=dist.dtype)
    sums = jnp.einsum("bjs,bsk->bjk", dist, a)           # [B, N, K]
    sums = jnp.where(a > 0, sums, 0.0)                   # row mask
    sums = jnp.where(sums == 0, 1e6, sums)
    return jnp.argmin(sums, axis=1).astype(jnp.int32)    # [B, K]


def k_medoids(dist, num_clusters: int, max_iter: int = 3,
              padding_idx: int = 0, init_medoids=None):
    """K-medoids over batched distance matrices.

    Args:
        dist: [B, N, N] pairwise distances.
        num_clusters: K (static).
        max_iter: update/assign rounds (static).
        padding_idx: fill value when K >= N.
        init_medoids: optional [B, K] override of the initial medoids
            (used by parity tests to pin the iteration start).

    Returns:
        [B, K] int32 medoid indices.
    """
    b, n, _ = dist.shape
    if num_clusters >= n:
        out = jnp.full((b, num_clusters), padding_idx, jnp.int32)
        return out.at[:, :n].set(jnp.arange(n, dtype=jnp.int32)[None])

    medoids = (init_medoids.astype(jnp.int32) if init_medoids is not None
               else select_initial_medoids(dist, num_clusters))
    assignment, _ = assign_samples_to_medoids(dist, medoids)

    def body(_, carry):
        medoids, assignment = carry
        medoids = update_medoids(dist, assignment, num_clusters)
        assignment, _ = assign_samples_to_medoids(dist, medoids)
        return medoids, assignment

    medoids, _ = jax.lax.fori_loop(0, max_iter, body,
                                   (medoids, assignment))
    return medoids
