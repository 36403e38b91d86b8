"""Golden parity tests against EXECUTABLE reference code.

The reference's window machinery, pos-embed, and box coder are pure torch
with no CUDA dependence.  We extract those exact function bodies from
``/root/reference`` at test time (via ast, so the module's unrelated
imports — ipdb / torch_scatter / spconv — never load) and diff our
TPU-native re-expressions against them directly.  This is the cheapest
guard against convention drift (x-major window hash, shift sign,
interleave order) — VERDICT.md round-1 item 4.
"""
from __future__ import annotations

import ast
import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


def _extract_functions(path: str, names, extra_globals=None):
    """Compile the named (possibly nested-in-class) function defs from
    ``path`` into a fresh namespace, skipping the module's own imports."""
    with open(path) as f:
        tree = ast.parse(f.read())
    ns = {"torch": torch, "np": np, "random": __import__("random")}
    if extra_globals:
        ns.update(extra_globals)
    found = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in names:
            node.decorator_list = []  # strip @torch.no_grad / registry hooks
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(ast.fix_missing_locations(mod), path, "exec"), ns)
            found.add(node.name)
    missing = set(names) - found
    assert not missing, f"reference functions not found: {missing}"
    return ns


def _extract_classes(path: str, names, extra_globals=None):
    """Compile the named ClassDefs from ``path`` into a fresh namespace,
    stripping class AND method decorators (registry hooks, @auto_fp16)."""
    with open(path) as f:
        tree = ast.parse(f.read())
    ns = {"torch": torch, "np": np, "nn": torch.nn,
          "random": __import__("random"), "copy": __import__("copy")}
    if extra_globals:
        ns.update(extra_globals)
    found = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name in names:
            node.decorator_list = []
            for sub in ast.walk(node):
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    sub.decorator_list = []
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(ast.fix_missing_locations(mod), path, "exec"), ns)
            found.add(node.name)
    missing = set(names) - found
    assert not missing, f"reference classes not found: {missing}"
    return ns


def _canon_labels(ids: np.ndarray) -> np.ndarray:
    """Relabel ids by first occurrence so groupings compare exactly."""
    _, inv = np.unique(ids, return_inverse=True)
    first = {}
    out = np.empty_like(inv)
    nxt = 0
    for i, v in enumerate(inv):
        if v not in first:
            first[v] = nxt
            nxt += 1
        out[i] = first[v]
    return out


def _random_coords(rng, n, ny, nx):
    """Unique pillar (y, x) coords, int32 [n, 2]."""
    keys = rng.choice(ny * nx, size=n, replace=False)
    return np.stack([keys // nx, keys % nx], -1).astype(np.int32)


# ---------------------------------------------------------------------------
# window partition: backbone window_partition (the MAE path's own copy)
# ---------------------------------------------------------------------------


def test_window_partition_matches_backbone(rng):
    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.ops.windows import window_ids

    path = (f"{REF}/mmdet3d/models/backbones/"
            "multi_mae_sst_spearate_top_only.py")
    ns = _extract_functions(path, ["window_partition"])

    sst = SSTConfig()
    voxel = VoxelConfig()
    ny, nx = voxel.grid_size
    n = 300
    coords = _random_coords(rng, n, ny, nx)           # (y, x)

    shim = types.SimpleNamespace(
        shifts_list=list(sst.shifts),
        window_shape=sst.window_shape,
        point_cloud_range=list(voxel.point_cloud_range),
        voxel_size=tuple(voxel.voxel_size),
    )
    # reference coors layout: (b, z, y, x); single sample b=0
    coors_t = torch.from_numpy(np.concatenate(
        [np.zeros((n, 2), np.int64),
         coords[:, 0:1].astype(np.int64),
         coords[:, 1:2].astype(np.int64)], -1))
    info = ns["window_partition"](shim, coors_t, {})

    valid = jnp.ones(n, bool)
    for i, shift in enumerate(sst.shifts):
        win, ciw = window_ids(jnp.asarray(coords), valid, shift, sst, voxel)
        ref_win = info[f"batch_win_inds_shift{i}"].numpy()
        ref_ciw = info[f"coors_in_win_shift{i}"].numpy()
        # ids must match EXACTLY (b=0 ⇒ the batch term vanishes)
        np.testing.assert_array_equal(np.asarray(win), ref_win)
        np.testing.assert_array_equal(np.asarray(ciw), ref_ciw)


# ---------------------------------------------------------------------------
# window partition: ops/sst get_window_coors (fine-tune input layer's copy)
# ---------------------------------------------------------------------------


def test_window_grouping_matches_sst_ops(rng):
    """`get_window_coors` offsets ids differently (adds a full window when
    unshifted) — the induced PARTITION and in-window coords must agree."""
    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.ops.windows import window_ids

    ns = _extract_functions(f"{REF}/mmdet3d/ops/sst/sst_ops.py",
                            ["get_window_coors"])
    sst = SSTConfig()
    voxel = VoxelConfig()
    ny, nx = voxel.grid_size
    n = 300
    coords = _random_coords(rng, n, ny, nx)
    coors_t = torch.from_numpy(np.concatenate(
        [np.zeros((n, 2), np.int64),
         coords[:, 0:1].astype(np.int64),
         coords[:, 1:2].astype(np.int64)], -1))

    valid = jnp.ones(n, bool)
    for shift, do_shift in [((0, 0), False), ((6, 6), True)]:
        win, ciw = window_ids(jnp.asarray(coords), valid, shift, sst, voxel)
        ref_win, ref_ciw = ns["get_window_coors"](
            coors_t, [nx, ny, 1], list(sst.window_shape), do_shift)
        np.testing.assert_array_equal(
            _canon_labels(np.asarray(win)), _canon_labels(ref_win.numpy()))
        # reference stacks (z, y, x); ours is (x, y)
        np.testing.assert_array_equal(np.asarray(ciw[:, 0]),
                                      ref_ciw[:, 2].numpy())
        np.testing.assert_array_equal(np.asarray(ciw[:, 1]),
                                      ref_ciw[:, 1].numpy())


# ---------------------------------------------------------------------------
# inner window ranks: get_inner_win_inds
# ---------------------------------------------------------------------------


def test_inner_win_inds_equivalence(rng):
    """Our sorted layout's rank-within-window is a valid ``arange(m)``
    assignment exactly like the reference's (whose own order is unstable-
    sort-dependent, per its docstring)."""
    from geomae_tpu.config import SSTConfig, VoxelConfig
    from geomae_tpu.ops.windows import make_layout

    ns = _extract_functions(f"{REF}/mmdet3d/ops/sst/sst_ops.py",
                            ["get_inner_win_inds"])
    sst = SSTConfig()
    voxel = VoxelConfig()
    ny, nx = voxel.grid_size
    n = 256
    coords = _random_coords(rng, n, ny, nx)
    valid = jnp.ones(n, bool)
    lay = make_layout(jnp.asarray(coords), valid, (6, 6), sst, voxel)

    win_sorted = np.asarray(lay.win_id)
    # rank within window from the sorted layout
    first = np.concatenate([[True], win_sorted[1:] != win_sorted[:-1]])
    seg_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    rank_sorted = np.arange(n) - seg_start
    rank_rows = np.empty(n, np.int64)
    rank_rows[np.asarray(lay.perm)] = rank_sorted

    win_rows = np.empty(n, np.int64)
    win_rows[np.asarray(lay.perm)] = win_sorted
    ref_rank = ns["get_inner_win_inds"](
        torch.from_numpy(win_rows)).numpy()

    for w in np.unique(win_rows):
        sel = win_rows == w
        m = sel.sum()
        np.testing.assert_array_equal(np.sort(rank_rows[sel]), np.arange(m))
        np.testing.assert_array_equal(np.sort(ref_rank[sel]), np.arange(m))


# ---------------------------------------------------------------------------
# positional embedding: backbone get_pos_embed
# ---------------------------------------------------------------------------


def test_pos_embed_matches_reference(rng):
    from geomae_tpu.config import SSTConfig
    from geomae_tpu.ops.windows import positional_embedding

    path = (f"{REF}/mmdet3d/models/backbones/"
            "multi_mae_sst_spearate_top_only.py")
    # flat2window stubbed to identity: we only want the embedding math
    ns = _extract_functions(
        path, ["get_pos_embed"],
        extra_globals={"flat2window": lambda pe, vdl, ind, di: pe})

    for normalize in (False, True):
        sst = SSTConfig(normalize_pos=normalize)
        shim = types.SimpleNamespace(
            window_shape=sst.window_shape,
            normalize_pos=sst.normalize_pos,
            d_model=[sst.d_model] * 3,
            pos_temperature=sst.pos_temperature,
            drop_info=None,
        )
        n = 200
        ciw = rng.integers(0, 12, size=(n, 2)).astype(np.int64)  # (x, y)
        ref = ns["get_pos_embed"](
            shim, None, torch.from_numpy(ciw), None, torch.float32, None)
        ours = positional_embedding(jnp.asarray(ciw), sst)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# box coder: DeltaXYZWLHRBBoxCoder encode/decode
# ---------------------------------------------------------------------------


def test_box_coder_matches_reference(rng):
    from geomae_tpu.models import box_coder

    ns = _extract_functions(
        f"{REF}/mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py",
        ["encode", "decode"])

    n = 128
    anchors = np.concatenate([
        rng.uniform(-50, 50, (n, 2)),            # x, y
        rng.uniform(-3, 1, (n, 1)),              # z (bottom)
        rng.uniform(0.5, 4.0, (n, 3)),           # w, l, h
        rng.uniform(-np.pi, np.pi, (n, 1)),      # yaw
        rng.normal(0, 2, (n, 2)),                # vx, vy
    ], -1).astype(np.float32)
    gts = np.concatenate([
        rng.uniform(-50, 50, (n, 2)),
        rng.uniform(-3, 1, (n, 1)),
        rng.uniform(0.5, 4.0, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
        rng.normal(0, 2, (n, 2)),
    ], -1).astype(np.float32)

    ref_enc = ns["encode"](torch.from_numpy(anchors),
                           torch.from_numpy(gts)).numpy()
    ours_enc = np.asarray(box_coder.encode(jnp.asarray(gts),
                                           jnp.asarray(anchors)))
    np.testing.assert_allclose(ours_enc, ref_enc, rtol=1e-5, atol=1e-5)

    deltas = rng.normal(0, 0.3, (n, 9)).astype(np.float32)
    ref_dec = ns["decode"](torch.from_numpy(anchors),
                           torch.from_numpy(deltas)).numpy()
    ours_dec = np.asarray(box_coder.decode(jnp.asarray(deltas),
                                           jnp.asarray(anchors)))
    np.testing.assert_allclose(ours_dec, ref_dec, rtol=1e-5, atol=1e-5)
