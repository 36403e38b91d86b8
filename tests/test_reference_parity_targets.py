"""Golden parity of the GeoMAE target/loss chain vs EXECUTABLE reference.

VERDICT.md round-2 missing #1: the heart of GeoMAE — sub-voxel centroid
tables, normals/curvature, and the multi-term loss — executes here straight
from the reference's own pure-torch method bodies
(``/root/reference/mmdet3d/models/detectors/multi_sub_voxel_dynamic_voxelnet_ssl.py:577-902``),
AST-extracted like ``test_reference_parity.py``, and is diffed against
``models/mae.py`` on random scenes.

Reference-side wiring mirrors ``extract_feat`` (``..._ssl.py:169-242``):
voxelize at three resolutions, get_centroid_per_voxel x3, the for-curv
med table, spconv's 3x3 neighbor pairs (reconstructed brute-force from
coords — spconv's contract, subm ksize [1,3,3]), cal_regular_voxel_nor_
and_curv, normalize_centroid_sub_voxel (shipped normalize_sub_voxel=True
path), get_multi_voxel_id_to_tensor_id_ori, forward_loss.  Only two shims
are not reference code: the 3x3 ``pair`` construction and the mmdet
``CrossEntropyLoss(use_sigmoid=True)`` (= BCE-with-logits vs one-hot,
mean) — both contracts documented in SURVEY.md.
"""
from __future__ import annotations

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import _extract_functions  # noqa: E402

REF = "/root/reference"
SSL = (f"{REF}/mmdet3d/models/detectors/"
       "multi_sub_voxel_dynamic_voxelnet_ssl.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _ref_ns():
    return _extract_functions(
        SSL,
        ["get_centroid_per_voxel", "get_multi_voxel_id_to_tensor_id_ori",
         "get_multi_voxel_id_to_tensor_id_for_curv",
         "cal_regular_voxel_nor_and_curv", "normalize_centroid_sub_voxel",
         "forward_loss"],
        extra_globals={"eps": 1e-9})


def _mmdet_bce(pred, label):
    """mmdet CrossEntropyLoss(use_sigmoid=True): BCE-with-logits against
    the one-hot expansion, mean over every element."""
    onehot = torch.nn.functional.one_hot(label, 2).float()
    return torch.nn.functional.binary_cross_entropy_with_logits(
        pred, onehot, reduction="mean")


def _shim(cfg):
    voxel = cfg.voxel
    ny, nx = voxel.grid_size
    assert ny == nx, "reference hash assumes square grid via grid_size[1]"
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    vx, vy, vz = voxel.voxel_size
    m = cfg.mae
    return types.SimpleNamespace(
        grid_size=[ny, nx, 1],
        point_cloud_range=list(voxel.point_cloud_range),
        voxel_size=[vx, vy, vz],
        sub_voxel_size_low=[vx / rx, vy / ry, vz / rz],
        sub_voxel_size_med=[vx / mx, vy / my, vz / mz],
        sub_voxel_ratio_low=list(voxel.sub_voxel_ratio_low),
        sub_voxel_ratio_med=list(voxel.sub_voxel_ratio_med),
        norm_curv=True, mse_loss=True, nor_usr_sml1=None,
        cls_sub_voxel=True,
        loss_ratio_low=m.loss_ratio_low, loss_ratio_med=m.loss_ratio_med,
        loss_ratio_top=m.loss_ratio_top,
        loss_ratio_low_nor=m.loss_ratio_nor,
        cls_loss_ratio_low=m.cls_loss_ratio_low,
        cls_loss_ratio_med=m.cls_loss_ratio_med,
        cls_loss=_mmdet_bce,
    )


def _voxelize_ref(pts_xyz, voxel, sizes, caps_zyx):
    """Reference dynamic voxelize: per-resolution floor + border clamp
    (``voxelization_cpu.cpp:22-31``), f32 like the CUDA kernel."""
    r = voxel.point_cloud_range
    origin = np.array([r[0], r[1], r[2]], np.float32)
    s = np.asarray(sizes, np.float32)
    c = np.floor((pts_xyz.astype(np.float32) - origin) / s).astype(np.int64)
    hi = np.array(caps_zyx[::-1], np.int64) - 1          # (x, y, z) caps
    c = np.clip(c, 0, hi)
    return c[:, ::-1]                                     # (z, y, x)


def _build_pair(feature_coors):
    """spconv subm ksize [1,3,3] neighbor pairs: [9, V] row ids, -1 miss."""
    lut = {tuple(c): i for i, c in enumerate(feature_coors[:, [0, 2, 3]])}
    V = feature_coors.shape[0]
    pair = np.full((9, V), -1, np.int64)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            for i, (b, _, y, x) in enumerate(feature_coors):
                pair[k, i] = lut.get((b, y + dy, x + dx), -1)
            k += 1
    return pair


@pytest.fixture(scope="module")
def chain():
    """Run both sides once; individual tests assert different slices."""
    from geomae_tpu.config import CapsConfig, replace, tiny_pretrain_config
    from geomae_tpu.models import mae
    from geomae_tpu.ops.voxelize import build_scene_batch
    from geomae_tpu.train.pretrain import dummy_batch

    # caps must hold EVERY occupied pillar — the reference never drops
    cfg = replace(tiny_pretrain_config(),
                  caps=CapsConfig(max_points=2048, max_voxels=2048,
                                  max_visible=1024))
    voxel = cfg.voxel
    shim = _shim(cfg)
    ns = _ref_ns()

    B = 2
    batch = dummy_batch(cfg, batch_size=B, seed=11)
    scene = jax.jit(lambda p, v: build_scene_batch(
        p, v, cfg.voxel, cfg.caps.max_voxels))(
        batch["points"], batch["point_valid"])
    tg = mae.compute_targets_batch(scene, cfg)
    keep = mae.sample_mask(jax.random.PRNGKey(5), scene.table.valid,
                           cfg.mae.random_mask_ratio)

    # ---- reference side -------------------------------------------------
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    vx, vy, vz = voxel.voxel_size
    ny, nx = voxel.grid_size

    pts_np = np.asarray(batch["points"])[..., :3]
    valid_np = np.asarray(batch["point_valid"])
    pts_all, coors, coors_low, coors_med = [], [], [], []
    for b in range(B):
        p = pts_np[b][valid_np[b]]
        pts_all.append(p)
        bc = np.full((len(p), 1), b, np.int64)
        coors.append(np.concatenate(
            [bc, _voxelize_ref(p, voxel, (vx, vy, vz), (1, ny, nx))], -1))
        coors_low.append(np.concatenate(
            [bc, _voxelize_ref(p, voxel, (vx / rx, vy / ry, vz / rz),
                               (rz, ny * ry, nx * rx))], -1))
        coors_med.append(np.concatenate(
            [bc, _voxelize_ref(p, voxel, (vx / mx, vy / my, vz / mz),
                               (mz, ny * my, nx * mx))], -1))
    pts_all = np.concatenate(pts_all, 0)
    t_pts = torch.from_numpy(pts_all[:, ::-1].copy())     # (z, y, x)
    t_coors = torch.from_numpy(np.concatenate(coors, 0))
    t_low = torch.from_numpy(np.concatenate(coors_low, 0))
    t_med = torch.from_numpy(np.concatenate(coors_med, 0))

    cen_low, cl_coors, _ = ns["get_centroid_per_voxel"](None, t_pts, t_low)
    cen_med, cm_coors, _ = ns["get_centroid_per_voxel"](None, t_pts, t_med)
    cen_top, ct_coors, _ = ns["get_centroid_per_voxel"](None, t_pts, t_coors)

    # feature_coors = our canonical rows; must equal torch's sorted unique
    table_coords = np.asarray(scene.table.coords)
    table_valid = np.asarray(scene.table.valid)
    fc, row_maps = [], []                # row_maps[b][v_row] = global ref row
    off = 0
    for b in range(B):
        c = table_coords[b][table_valid[b]]
        fc.append(np.stack([np.full(len(c), b, np.int64),
                            np.zeros(len(c), np.int64),
                            c[:, 0].astype(np.int64),
                            c[:, 1].astype(np.int64)], -1))
        rm = np.full(table_valid.shape[1], -1, np.int64)
        rm[np.flatnonzero(table_valid[b])] = off + np.arange(len(c))
        row_maps.append(rm)
        off += len(c)
    fc = np.concatenate(fc, 0)
    np.testing.assert_array_equal(ct_coors.numpy(), fc)
    t_fc = torch.from_numpy(fc)

    med_tbl, med_tbl_mask = ns["get_multi_voxel_id_to_tensor_id_for_curv"](
        shim, t_fc, cm_coors.long(), cen_med, B)
    pair = torch.from_numpy(_build_pair(fc))
    ref_nor, ref_curv = ns["cal_regular_voxel_nor_and_curv"](
        shim, med_tbl, med_tbl_mask, cen_top, pair)

    cen_low_n = ns["normalize_centroid_sub_voxel"](
        shim, cl_coors[:, 1:], cen_low, layer="low")
    cen_med_n = ns["normalize_centroid_sub_voxel"](
        shim, cm_coors[:, 1:], cen_med, layer="med")
    cen_top_n = ns["normalize_centroid_sub_voxel"](
        shim, ct_coors[:, 1:], cen_top, layer="top")

    keep_np = np.asarray(keep)
    mask_rows = table_valid & ~keep_np
    ids_mask = np.concatenate(
        [row_maps[b][np.flatnonzero(mask_rows[b])] for b in range(B)])
    t_ids_mask = torch.from_numpy(ids_mask)

    low_t, low_m, med_t, med_m = ns["get_multi_voxel_id_to_tensor_id_ori"](
        shim, t_fc, cl_coors.long(), cm_coors.long(),
        cen_low_n, cen_med_n, t_ids_mask, B)

    return dict(cfg=cfg, ns=ns, shim=shim, scene=scene, tg=tg, keep=keep,
                mask_rows=mask_rows, ids_mask=ids_mask,
                ref=dict(low_t=low_t, low_m=low_m, med_t=med_t, med_m=med_m,
                         top=cen_top_n[t_ids_mask], top_raw=cen_top,
                         nor=ref_nor[t_ids_mask], curv=ref_curv[t_ids_mask]))


def _ours_masked(arr, mask_rows):
    return np.concatenate([np.asarray(arr)[b][mask_rows[b]]
                           for b in range(mask_rows.shape[0])], 0)


def _low_order(arr, cfg):
    """Our slot_sort-ordered low tables -> reference slot_low order."""
    from geomae_tpu.models.mae import _slot_sort_to_low
    inv = np.argsort(_slot_sort_to_low(cfg.voxel))
    return np.asarray(arr)[:, :, inv]


# ---------------------------------------------------------------------------
# target parity
# ---------------------------------------------------------------------------


def test_sub_voxel_occupancy_masks_match(chain):
    ref = chain["ref"]
    mk = chain["mask_rows"]
    np.testing.assert_array_equal(
        _ours_masked(_low_order(chain["tg"].low_occ, chain["cfg"]), mk),
        ref["low_m"].numpy())
    np.testing.assert_array_equal(
        _ours_masked(chain["tg"].med_occ, mk), ref["med_m"].numpy())


def test_centroid_tables_match(chain):
    ref = chain["ref"]
    mk = chain["mask_rows"]
    np.testing.assert_allclose(
        _ours_masked(_low_order(chain["tg"].low_tgt, chain["cfg"]), mk),
        ref["low_t"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        _ours_masked(chain["tg"].med_tgt, mk), ref["med_t"].numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        _ours_masked(chain["tg"].centroid_top, mk), ref["top"].numpy(),
        rtol=1e-4, atol=1e-4)


def test_normals_match_reference_svd(chain):
    ours = _ours_masked(chain["tg"].normal, chain["mask_rows"])
    ref = chain["ref"]["nor"].numpy()
    curv = chain["ref"]["curv"].numpy()          # descending, sums to 1
    cos = np.abs((ours * ref).sum(-1)) / np.maximum(
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1), 1e-9)
    # sign is arbitrary on both sides.  Where the two smallest eigenvalues
    # are near-degenerate the normal direction is ill-defined and eig3 vs
    # torch.svd legitimately pick different vectors of the eigenplane
    # (uniform random test points make many such rows); every
    # well-conditioned row must agree exactly.
    gap = curv[:, 1] - curv[:, 2]
    cond = gap > 0.01
    assert cond.sum() > 50                        # the test has teeth
    assert np.all(cos[cond] > 1 - 1e-4), \
        (np.sort(cos[cond])[:5], cond.sum())
    assert np.mean(cos > 1 - 1e-4) > 0.95, np.mean(cos > 1 - 1e-4)


def test_curvature_matches_reference_svd(chain):
    ours = _ours_masked(chain["tg"].curv, chain["mask_rows"])
    ref = chain["ref"]["curv"].numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3)


# ---------------------------------------------------------------------------
# loss parity (identical targets on both sides -> pure-arithmetic diff)
# ---------------------------------------------------------------------------


def test_forward_loss_matches_reference(chain):
    from geomae_tpu.models import mae

    cfg = chain["cfg"]
    ns, shim = chain["ns"], chain["shim"]
    ref = chain["ref"]
    mk = chain["mask_rows"]
    scene, keep = chain["scene"], chain["keep"]
    B, V = mk.shape
    S, M = cfg.voxel.num_slots_low, cfg.voxel.num_slots_med
    Mrows = int(mk.sum())

    rng = np.random.default_rng(3)
    p_low = rng.normal(size=(Mrows, S, 3)).astype(np.float32)
    p_med = rng.normal(size=(Mrows, M, 3)).astype(np.float32)
    p_top = rng.normal(size=(Mrows, 3)).astype(np.float32)
    p_nor = rng.normal(size=(Mrows, 3)).astype(np.float32)
    p_cls_low = rng.normal(size=(Mrows, S, 2)).astype(np.float32)
    p_cls_med = rng.normal(size=(Mrows, M, 2)).astype(np.float32)

    ref_loss = ns["forward_loss"](
        shim, ref["low_t"], ref["low_m"], ref["med_t"], ref["med_m"],
        ref["top"], ref["nor"], None, None,
        torch.from_numpy(p_low), torch.from_numpy(p_med),
        torch.from_numpy(p_top), None, None, torch.from_numpy(p_nor),
        torch.from_numpy(p_cls_low), torch.from_numpy(p_cls_med))

    # scatter the REFERENCE tables + the same preds into our dense layout
    def dense(x, shape):
        out = np.zeros((B, V) + shape, x.dtype)
        out[mk] = x
        return jnp.asarray(out)

    targets = mae.GeoMAETargets(
        low_occ=dense(ref["low_m"].numpy(), (S,)),
        low_tgt=dense(ref["low_t"].numpy(), (S, 3)),
        med_occ=dense(ref["med_m"].numpy(), (M,)),
        med_tgt=dense(ref["med_t"].numpy(), (M, 3)),
        centroid_top=dense(ref["top"].numpy().astype(np.float32), (3,)),
        normal=dense(ref["nor"].numpy().astype(np.float32), (3,)),
        curv=dense(ref["curv"].numpy().astype(np.float32), (3,)),
    )
    preds = dict(
        reg_low=dense(p_low, (S, 3)), reg_med=dense(p_med, (M, 3)),
        reg_top=dense(p_top, (3,)), nor_top=dense(p_nor, (3,)),
        cls_low=dense(p_cls_low, (S, 2)), cls_med=dense(p_cls_med, (M, 2)))
    ours = mae.pretrain_loss(preds, targets, scene, keep, cfg)

    for key in ("loss_centroid_low", "loss_centroid_med",
                "loss_centroid_top", "loss_curv_around",
                "loss_cls_low", "loss_cls_med"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref_loss[key]), rtol=1e-5, atol=1e-6,
            err_msg=key)
