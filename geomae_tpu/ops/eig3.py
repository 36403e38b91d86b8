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

The core operates on PACKED symmetric components ``[..., 6]`` ordered
(00, 11, 22, 01, 02, 12): a trailing ``[..., 3, 3]`` tensor tiles its two
minor dims to (8 sublanes, 128 lanes) on TPU — 114x physical padding —
so every intermediate stays a channel vector instead.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def pack_sym(A: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> packed [..., 6] (00, 11, 22, 01, 02, 12)."""
    return jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2],
                      A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]], axis=-1)


def eigvals_sym6(c: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of packed symmetric [..., 6], DESCENDING [..., 3]."""
    c = c.astype(jnp.float32)
    c00, c11, c22 = c[..., 0], c[..., 1], c[..., 2]
    c01, c02, c12 = c[..., 3], c[..., 4], c[..., 5]
    q = (c00 + c11 + c22) / 3.0
    a00, a11, a22 = c00 - q, c11 - q, c22 - q
    p2 = (a00 * a00 + a11 * a11 + a22 * a22
          + 2.0 * (c01 * c01 + c02 * c02 + c12 * c12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    # det(Aq / p) via packed components
    b00, b11, b22 = a00 / p, a11 / p, a22 / p
    b01, b02, b12 = c01 / p, c02 / p, c12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    two_pi_3 = 2.0943951023931953
    e0 = q + 2.0 * p * jnp.cos(phi)                 # largest
    e2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)      # smallest
    e1 = 3.0 * q - e0 - e2
    degenerate = p2 <= _EPS
    evals = jnp.stack([e0, e1, e2], axis=-1)
    return jnp.where(degenerate[..., None], q[..., None] * jnp.ones(3),
                     evals)


def smallest_eigvec_sym6(c: jnp.ndarray,
                         eval_min: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of packed symmetric
    [..., 6].

    Cross product of the two most independent rows of ``A - lambda_min I``
    (best of the three row-pair crosses, selected with where-chains — no
    gathers); falls back to (0, 0, 1) for fully degenerate matrices
    (matching torch.svd of a zero matrix, whose V is the identity and
    therefore yields last column (0, 0, 1))."""
    c = c.astype(jnp.float32)
    m00 = c[..., 0] - eval_min
    m11 = c[..., 1] - eval_min
    m22 = c[..., 2] - eval_min
    m01, m02, m12 = c[..., 3], c[..., 4], c[..., 5]
    # rows: r0 = (m00, m01, m02), r1 = (m01, m11, m12), r2 = (m02, m12, m22)
    def cross(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    c01 = cross(m00, m01, m02, m01, m11, m12)
    c02 = cross(m00, m01, m02, m02, m12, m22)
    c12 = cross(m01, m11, m12, m02, m12, m22)

    def n2(v):
        return v[0] * v[0] + v[1] * v[1] + v[2] * v[2]

    n01, n02, n12 = n2(c01), n2(c02), n2(c12)
    use02 = n02 > n01
    bx = jnp.where(use02, c02[0], c01[0])
    by = jnp.where(use02, c02[1], c01[1])
    bz = jnp.where(use02, c02[2], c01[2])
    bn = jnp.maximum(n02, n01)
    use12 = n12 > bn
    bx = jnp.where(use12, c12[0], bx)
    by = jnp.where(use12, c12[1], by)
    bz = jnp.where(use12, c12[2], bz)
    bn = jnp.maximum(n12, bn)
    ok = bn > 1e-12
    inv = 1.0 / jnp.sqrt(jnp.maximum(bn, _EPS))
    return jnp.stack([jnp.where(ok, bx * inv, 0.0),
                      jnp.where(ok, by * inv, 0.0),
                      jnp.where(ok, bz * inv, 1.0)], axis=-1)


def normal_and_curvature6(cov6: jnp.ndarray, eps: float = 1e-9):
    """Normal + curvature from PACKED symmetric covariance [..., 6]."""
    evals = eigvals_sym6(cov6)                      # descending
    evals = jnp.maximum(evals, 0.0)                 # PSD clamp
    normal = smallest_eigvec_sym6(cov6, evals[..., 2])
    curv = evals + eps
    curv = curv / jnp.sum(curv, axis=-1, keepdims=True)
    return normal, curv


# rank-4 wrappers (tests + non-hot callers)


def eigvals3x3_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], returned DESCENDING [..., 3]."""
    return eigvals_sym6(pack_sym(A.astype(jnp.float32)))


def smallest_eigvec3x3_sym(A: jnp.ndarray,
                           eval_min: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of symmetric [..., 3, 3]."""
    return smallest_eigvec_sym6(pack_sym(A.astype(jnp.float32)), eval_min)


def normal_and_curvature(cov: jnp.ndarray, eps: float = 1e-9):
    """Surface normal + normalized curvature spectrum from covariance.

    Reference semantics (``cal_regular_voxel_nor_and_curv``, ``..._ssl.py:
    577-610``): normal = unit singular vector of the smallest singular
    value; curvature = (singular values + 1e-9) normalized to sum 1,
    descending.

    Args: cov [..., 3, 3] symmetric PSD.
    Returns: (normal [..., 3], curv [..., 3]).
    """
    return normal_and_curvature6(pack_sym(cov), eps)
