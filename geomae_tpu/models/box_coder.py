"""DeltaXYZWLHR box coder (code_size 9 with velocities).

Rebuilds ``DeltaXYZWLHRBBoxCoder``
(``/root/reference/mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py:
8-90``): xy normalized by the anchor BEV diagonal, z (shifted bottom ->
center) by anchor height, dims as log ratios, rotation raw difference,
velocities plain differences.
"""
from __future__ import annotations

import jax.numpy as jnp


def encode(gt, anchors):
    """gt, anchors: [..., 9] (x y z_bottom w l h yaw vx vy) -> deltas."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xg, yg, zg, wg, lg, hg, rg = [gt[..., i] for i in range(7)]
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la**2 + wa**2)
    out = [
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / ha,
        jnp.log(wg / wa),
        jnp.log(lg / la),
        jnp.log(hg / ha),
        rg - ra,
    ]
    if gt.shape[-1] > 7:
        out.append(gt[..., 7] - anchors[..., 7])
        out.append(gt[..., 8] - anchors[..., 8])
    return jnp.stack(out, -1)


def decode(deltas, anchors):
    """Inverse of :func:`encode`; returns [..., 9] with z back at bottom."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xt, yt, zt, wt, lt, ht, rt = [deltas[..., i] for i in range(7)]
    za = za + ha / 2
    diag = jnp.sqrt(la**2 + wa**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    wg = jnp.exp(wt) * wa
    lg = jnp.exp(lt) * la
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    out = [xg, yg, zg, wg, lg, hg, rg]
    if deltas.shape[-1] > 7:
        out.append(deltas[..., 7] + anchors[..., 7])
        out.append(deltas[..., 8] + anchors[..., 8])
    return jnp.stack(out, -1)
