"""Torch-checkpoint interop: released GeoMAE weights -> flax pytrees.

The reference publishes pretrain + fine-tune checkpoints as torch pickles
(``/root/reference/README.md:53-57``) with mmcv's ``{state_dict, optimizer,
meta}`` layout (``tools/train.py:207-217``).  This module maps those
state_dicts onto our flax parameter / batch-stats trees so parity against
the released weights is testable (SURVEY.md §7 hard-part 6).

Layout transforms:
  * ``nn.Linear.weight`` [out, in]      -> flax ``kernel`` = W.T
  * ``nn.MultiheadAttention.in_proj_*`` -> split rows into q/k/v thirds
  * ``nn.Conv2d.weight`` [o, i, kh, kw] -> NHWC kernel (2, 3, 1, 0)
  * ``nn.ConvTranspose2d.weight`` [i, o, kh, kw] -> spatially FLIPPED then
    (2, 3, 0, 1) — torch's transposed conv correlates with the flipped
    kernel relative to ``lax.conv_transpose`` (verified numerically in
    ``tests/test_torch_import.py``)
  * BatchNorm weight/bias -> params scale/bias; running_mean/var ->
    batch_stats mean/var; LayerNorm weight -> scale.

Key schemas (reference attribute names):
  pretrain  ``MultiSubVoxelDynamicVoxelNetSSL``: ``voxel_encoder.vfe_layers
  .{i}.*``, ``backbone.{encoder|decoder_centroid|decoder_density}_blocks
  .{i}.encoder_list.{j}.*``, ``backbone.mask_token``, ``backbone.
  {decoder_pred_*, cls_pred_*}`` (backbone ``multi_mae_sst_spearate_top_
  only.py:90-130``; blocks ``sst_basic_block.py:64-147``).
  fine-tune ``DynamicVoxelNet``: same VFE/blocks plus ``backbone.
  conv_blocks.{i}.{seq}``, ``neck.deblocks.{i}.{seq}``, ``bbox_head.conv_
  {cls,reg,dir_cls}`` (``sst_second_pretrained_v1.py:140-167``,
  ``second_fpn.py:42-65``, ``anchor3d_head.py:140-146``).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import flax.traverse_util as tu
import jax.numpy as jnp
import numpy as np

_STACKS = {
    "encoder": "encoder_blocks",
    "decoder_centroid": "decoder_centroid_blocks",
    "decoder_density": "decoder_density_blocks",
}
_QKV_ROW = {"q_proj": 0, "k_proj": 1, "v_proj": 2}
_HEADS = ("decoder_pred_low", "decoder_pred_med", "decoder_pred_top",
          "decoder_pred_density_low", "decoder_pred_density_med",
          "decoder_pred_density_top", "cls_pred_low", "cls_pred_med")
_BN_SUFFIX = {"scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch/mmcv checkpoint file into {key: np.ndarray}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _linear(sd, base, leaf):
    return sd[f"{base}.weight"].T if leaf == "kernel" else sd[f"{base}.bias"]


def _conv(sd, base, leaf):
    if leaf == "bias":
        return sd[f"{base}.bias"]
    return sd[f"{base}.weight"].transpose(2, 3, 1, 0)


def _deconv(sd, base, leaf):
    w = sd[f"{base}.weight"]
    return w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def _mha(sd, base, module, leaf):
    C = sd[f"{base}.in_proj_weight"].shape[1]
    r = _QKV_ROW.get(module)
    if r is not None:
        blk = sd[f"{base}.in_proj_weight" if leaf == "kernel"
                 else f"{base}.in_proj_bias"][r * C:(r + 1) * C]
        return blk.T if leaf == "kernel" else blk
    return _linear(sd, f"{base}.out_proj", leaf)


def _layer_leaf(sd, base: str, rest: Tuple[str, ...]):
    """Resolve one EncoderLayer leaf under reference base key ``base``."""
    if rest[0] == "win_attn":
        return _mha(sd, f"{base}.win_attn.self_attn", rest[1], rest[2])
    if rest[0] in ("linear1", "linear2"):
        return _linear(sd, f"{base}.{rest[0]}", rest[1])
    if rest[0] in ("norm1", "norm2"):
        return sd[f"{base}.{rest[0]}."
                  f"{'weight' if rest[1] == 'scale' else 'bias'}"]
    return None


def _stack_depth(sd, prefix: str, stack: str) -> int:
    """Number of blocks present for one ModuleList in the state_dict."""
    n = 0
    while any(k.startswith(f"{prefix}{stack}.{n}.") for k in sd):
        n += 1
    return n


def _resolve(path: Tuple[str, ...], sd, kind: str):
    """Value for one flax path (params or batch_stats), or None if the
    path has no reference counterpart."""
    prefix = "backbone."
    # MaskedBatchNorm2d wraps MaskedBatchNorm as an auto-named submodule;
    # the wrapper adds no parameters of its own, so drop the segment.
    p = tuple(s for s in path if not s.startswith("MaskedBatchNorm"))

    if p[0] == "voxel_encoder":
        i = int(p[1].split("_")[1])
        base = f"voxel_encoder.vfe_layers.{i}"
        if p[2] == "linear":
            return _linear(sd, f"{base}.linear", p[3])
        return sd[f"{base}.norm.{_BN_SUFFIX[p[3]]}"]

    if p[0] == "decoders" and kind == "pretrain":
        # grouped decoder pair (models/sst.SSTStackPair): leaf shape
        # [n_blocks, 2, ...] with branch 0 = centroid, 1 = density
        assert p[1] == "blocks" and p[2] == "block", p
        j = int(p[3].split("_")[1])
        rest = p[4:]
        n = _stack_depth(sd, prefix, "decoder_centroid_blocks")
        vals = []
        for i in range(n):
            pair = [_layer_leaf(
                sd, f"{prefix}decoder_{br}_blocks.{i}.encoder_list.{j}",
                rest) for br in ("centroid", "density")]
            if pair[0] is None or pair[1] is None:
                return None
            vals.append(np.stack(pair))
        return np.stack(vals) if n else None

    if p[0] in _STACKS and (kind == "pretrain" or p[0] == "encoder"):
        # flax path: (<stack>, 'blocks', 'block', 'encoder_<j>', ...) with
        # nn.scan-stacked leaves — stack the per-block reference tensors
        stack = _STACKS[p[0]]
        assert p[1] == "blocks" and p[2] == "block", p
        j = int(p[3].split("_")[1])
        rest = p[4:]
        n = _stack_depth(sd, prefix, stack)
        vals = [_layer_leaf(sd, f"{prefix}{stack}.{i}.encoder_list.{j}",
                            rest) for i in range(n)]
        if n and vals[0] is not None:
            return np.stack(vals)
        return None

    if kind == "pretrain":
        if p[0] == "mask_token":
            return sd[f"{prefix}mask_token"]
        if p[0] in _HEADS:
            return _linear(sd, f"{prefix}{p[0]}", p[1])

    if kind == "finetune":
        if p[0] == "second":
            # stage{i}_down -> seq index 0/1; stage{i}_conv{j} -> 3+3j/4+3j
            m = re.fullmatch(r"stage(\d+)_(down|conv(\d+))", p[1])
            i = int(m.group(1))
            if m.group(2) == "down":
                ci, bi = 0, 1
            else:
                j = int(m.group(3))
                ci, bi = 3 + 3 * j, 4 + 3 * j
            base = f"{prefix}conv_blocks.{i}"
            if p[2] == "conv":
                return _conv(sd, f"{base}.{ci}", p[3])
            return sd[f"{base}.{bi}.{_BN_SUFFIX[p[3]]}"]
        if p[0] == "neck":
            m = re.fullmatch(r"deblock(\d+)_(conv|deconv|down|bn)", p[1])
            i = int(m.group(1))
            base = f"neck.deblocks.{i}"
            if m.group(2) == "bn":
                return sd[f"{base}.1.{_BN_SUFFIX[p[2]]}"]
            if m.group(2) in ("deconv", "conv"):
                # stride-1 levels are ConvTranspose2d k=1 s=1 in the
                # reference too (use_conv_for_no_stride=False,
                # second_fpn.py:45-52): weight layout [in, out, 1, 1]
                return _deconv(sd, f"{base}.0", p[2])
            return _conv(sd, f"{base}.0", p[2])
        if p[0] == "bbox_head":
            return _conv(sd, f"bbox_head.{p[1]}", p[2])

    return None


def import_torch_weights(params, batch_stats, sd: Dict[str, np.ndarray],
                         kind: str):
    """Overwrite every mappable leaf of (params, batch_stats) from ``sd``.

    Returns (params, batch_stats, report) where report lists matched /
    unmatched flax paths and unconsumed reference keys.
    """
    assert kind in ("pretrain", "finetune")
    consumed: set = set()
    matched, missing = [], []

    def _convert(tree, collection):
        flat = tu.flatten_dict(tree)
        for path, old in flat.items():
            try:
                val = _resolve(tuple(path), _TrackingDict(sd, consumed), kind)
            except KeyError:
                val = None
            if val is None:
                missing.append("/".join(path) + f" [{collection}]")
                continue
            if tuple(val.shape) != tuple(old.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"ref {val.shape} vs flax {old.shape}")
            flat[path] = jnp.asarray(np.ascontiguousarray(val),
                                     dtype=old.dtype)
            matched.append("/".join(path))
        return tu.unflatten_dict(flat)

    params = _convert(params, "params")
    batch_stats = _convert(batch_stats, "batch_stats")
    unconsumed = [k for k in sd
                  if k not in consumed and "num_batches_tracked" not in k]
    report = dict(matched=matched, missing=missing, unconsumed=unconsumed)
    return params, batch_stats, report


class _TrackingDict(dict):
    """Records which reference keys were read."""

    def __init__(self, sd, consumed):
        super().__init__(sd)
        self._consumed = consumed

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self._consumed.add(k)
        return v
