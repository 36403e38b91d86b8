"""Dense BEV stages: recover_bev scatter, SECOND conv blocks, SECONDFPN.

Rebuilds the conv half of ``SSTSecondPretrainedv1``
(``/root/reference/mmdet3d/models/backbones/sst_second_pretrained_v1.py:
137-266``) and ``SECONDFPN`` (``models/necks/second_fpn.py:11-91``) in NHWC
(TPU-native conv layout):

* recover_bev: scatter [B, V, C] pillar features onto the dense
  [B, ny, nx, C] canvas by (y, x);
* SECOND stage i: Conv3x3(stride s, no bias)+BN+ReLU then layer_nums[i] x
  (Conv3x3+BN+ReLU);
* FPN: per level ConvTranspose(stride=us, no bias)+BN+ReLU, concat.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import FPNConfig, SECONDConfig
from .norm import MaskedBatchNorm2d


def recover_bev(voxel_feats: jnp.ndarray, coords: jnp.ndarray,
                valid: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """[B, V, C] + (y, x) coords -> [B, ny, nx, C] canvas (zeros elsewhere).

    Matches ``recover_bev`` (reference ``:230-266``).  Pillar rows are
    canonically key-sorted and unique, so ONE ascending-unique scatter-set
    fills the canvas (the sorted+unique hints keep XLA's TPU lowering off
    its general sort path, as measured for the dense target-table build,
    ``models/mae.py``) and its autodiff backward is a plain row gather —
    the previous binary-search-gather formulation instead paid a
    ``searchsorted(method='sort')`` sort of [ny*nx + V] queries in the
    forward and a sort-lowered scatter-add in the backward.
    """
    B, V, C = voxel_feats.shape
    key = jnp.where(valid, coords[..., 0] * nx + coords[..., 1],
                    ny * nx)                       # sentinel -> trash row

    def one(feats, k):
        canvas = jnp.zeros((ny * nx + 1, C), feats.dtype)
        canvas = canvas.at[k].set(feats, mode="drop", unique_indices=True,
                                  indices_are_sorted=True)
        return canvas[:-1].reshape(ny, nx, C)

    return jax.vmap(one)(voxel_feats, key)


class ConvBNReLU(nn.Module):
    features: int
    stride: int = 1
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = MaskedBatchNorm2d(self.features, self.bn_momentum, self.bn_eps,
                              name="bn")(x, train)
        return nn.relu(x)


class SECONDStages(nn.Module):
    """Multi-stage conv pyramid; returns one feature map per stage."""

    cfg: SECONDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i, n_layers in enumerate(self.cfg.layer_nums):
            x = ConvBNReLU(self.cfg.out_channels[i],
                           self.cfg.layer_strides[i], self.cfg.bn_eps,
                           self.cfg.bn_momentum, self.dtype,
                           name=f"stage{i}_down")(x, train)
            for j in range(n_layers):
                x = ConvBNReLU(self.cfg.out_channels[i], 1, self.cfg.bn_eps,
                               self.cfg.bn_momentum, self.dtype,
                               name=f"stage{i}_conv{j}")(x, train)
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Per-level transposed-conv upsample + concat (second_fpn.py:74-91)."""

    cfg: FPNConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        ups = []
        for i, x in enumerate(feats):
            us = self.cfg.upsample_strides[i]
            ch = self.cfg.out_channels[i]
            if us == 1:
                x = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"deblock{i}_conv")(x)
            elif us < 1:            # fractional stride = strided conv down
                s = int(round(1 / us))
                x = nn.Conv(ch, (s, s), strides=(s, s), use_bias=False,
                            dtype=self.dtype, name=f"deblock{i}_down")(x)
            else:
                us = int(us)
                x = nn.ConvTranspose(ch, (us, us), strides=(us, us),
                                     use_bias=False, dtype=self.dtype,
                                     name=f"deblock{i}_deconv")(x)
            x = MaskedBatchNorm2d(ch, self.cfg.bn_momentum, self.cfg.bn_eps,
                                  name=f"deblock{i}_bn")(x, train)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1)
