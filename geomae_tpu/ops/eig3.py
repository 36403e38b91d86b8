"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

Replaces the reference's ``torch.svd`` over per-voxel covariance matrices
(``/root/reference/mmdet3d/models/detectors/multi_sub_voxel_dynamic_voxelnet_ssl.py:577-610``).
For a symmetric PSD covariance the singular vectors equal the eigenvectors,
so the surface normal is the eigenvector of the *smallest* eigenvalue and the
"curvature" vector is the (descending) eigenvalue spectrum.

A trigonometric closed form (Smith's algorithm) is used instead of an
iterative LAPACK-style solver: it is branch-free, vectorizes perfectly on
the VPU, and avoids jnp.linalg.eigh's generic batched path.  Sign of the
normal is arbitrary (as in the reference — parity tests compare |cos|).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def eigvals3x3_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], returned DESCENDING [..., 3]."""
    A = A.astype(jnp.float32)
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    Aq = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    Bn = Aq / p[..., None, None]
    detB = (
        Bn[..., 0, 0] * (Bn[..., 1, 1] * Bn[..., 2, 2] - Bn[..., 1, 2] * Bn[..., 2, 1])
        - Bn[..., 0, 1] * (Bn[..., 1, 0] * Bn[..., 2, 2] - Bn[..., 1, 2] * Bn[..., 2, 0])
        + Bn[..., 0, 2] * (Bn[..., 1, 0] * Bn[..., 2, 1] - Bn[..., 1, 1] * Bn[..., 2, 0])
    )
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    two_pi_3 = 2.0943951023931953
    e0 = q + 2.0 * p * jnp.cos(phi)                 # largest
    e2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)      # smallest
    e1 = 3.0 * q - e0 - e2
    degenerate = p2 <= _EPS
    evals = jnp.stack([e0, e1, e2], axis=-1)
    return jnp.where(degenerate[..., None], q[..., None] * jnp.ones(3), evals)


def smallest_eigvec3x3_sym(A: jnp.ndarray,
                           eval_min: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of symmetric [..., 3, 3].

    Uses the cross product of the two most independent rows of
    ``A - lambda_min I``; falls back to (0, 0, 1) for fully degenerate
    matrices (matching torch.svd of a zero matrix, whose V is the identity
    and therefore yields last column (0, 0, 1)).
    """
    A = A.astype(jnp.float32)
    M = A - eval_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)            # [..., 3, 3]
    norms = jnp.sum(cands * cands, axis=-1)                # [..., 3]
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                              .repeat(3, axis=-1), axis=-2)[..., 0, :]
    n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(vec).at[..., 2].set(1.0)
    ok = n2 > 1e-12
    vec = jnp.where(ok, vec / jnp.sqrt(jnp.maximum(n2, _EPS)), fallback)
    return vec


def normal_and_curvature(cov: jnp.ndarray, eps: float = 1e-9):
    """Surface normal + normalized curvature spectrum from covariance.

    Reference semantics (``cal_regular_voxel_nor_and_curv``, ``..._ssl.py:
    577-610``): normal = unit singular vector of the smallest singular
    value; curvature = (singular values + 1e-9) normalized to sum 1,
    descending.

    Args: cov [..., 3, 3] symmetric PSD.
    Returns: (normal [..., 3], curv [..., 3]).
    """
    evals = eigvals3x3_sym(cov)                     # descending
    evals = jnp.maximum(evals, 0.0)                 # PSD clamp
    normal = smallest_eigvec3x3_sym(cov, evals[..., 2])
    curv = evals + eps
    curv = curv / jnp.sum(curv, axis=-1, keepdims=True)
    return normal, curv
