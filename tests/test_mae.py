"""GeoMAE model: target semantics (vs dense numpy oracle), loss
equivalence, finiteness, grad flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomae_tpu.config import tiny_pretrain_config
from geomae_tpu.models import mae
from geomae_tpu.ops.voxelize import build_scene_batch
from geomae_tpu.train.pretrain import dummy_batch, forward, init_state


@pytest.fixture(scope="module")
def cfg():
    return tiny_pretrain_config()


@pytest.fixture(scope="module")
def setup(cfg):
    batch = dummy_batch(cfg, batch_size=2, seed=3)
    scene = build_scene_batch(batch["points"], batch["point_valid"],
                              cfg.voxel, cfg.caps.max_voxels)
    return batch, scene


def test_sample_mask_ratio(cfg, setup):
    _, scene = setup
    keep = mae.sample_mask(jax.random.PRNGKey(0), scene.table.valid,
                           cfg.mae.random_mask_ratio)
    keep = np.asarray(keep)
    valid = np.asarray(scene.table.valid)
    assert not np.any(keep & ~valid)
    for b in range(keep.shape[0]):
        L = valid[b].sum()
        want = int(L * (1 - cfg.mae.random_mask_ratio))
        assert keep[b].sum() == want


def dense_oracle(scene_b, cfg, b):
    """Dense numpy targets (the reference's layout) for sample b."""
    voxel = cfg.voxel
    pts = np.asarray(scene_b.points)[b, :, :3]
    pv = np.asarray(scene_b.valid)[b]
    p2v = np.asarray(scene_b.table.point2voxel)[b]
    sl = np.asarray(scene_b.slot_low)[b]
    sm = np.asarray(scene_b.slot_med)[b]
    coords = np.asarray(scene_b.table.coords)[b]
    V = coords.shape[0]
    S, M = voxel.num_slots_low, voxel.num_slots_med
    rz, ry, rx = voxel.sub_voxel_ratio_low
    mz, my, mx = voxel.sub_voxel_ratio_med
    vx, vy, vz = voxel.voxel_size
    r = voxel.point_cloud_range
    origin = np.array([r[2], r[1], r[0]])

    def norm(c, v, s, ratio, sizes):
        rz_, ry_, rx_ = ratio
        coor = np.array([s // (ry_ * rx_),
                         coords[v, 0] * ry_ + (s // rx_) % ry_,
                         coords[v, 1] * rx_ + s % rx_])
        return (c - (coor * np.asarray(sizes) + origin)) / np.asarray(sizes)

    c_low = np.zeros((V, S, 3))
    occ_low = np.zeros((V, S), bool)
    c_med = np.zeros((V, M, 3))
    occ_med = np.zeros((V, M), bool)
    c_top = np.zeros((V, 3))
    ok = pv & (p2v < V)
    for v in np.unique(p2v[ok]):
        selv = ok & (p2v == v)
        c_top[v] = norm(pts[selv][:, ::-1].mean(0), v, 0, (1, 1, 1),
                        (vz, vy, vx))
        for s in np.unique(sl[selv]):
            sel = selv & (sl == s)
            occ_low[v, s] = True
            c_low[v, s] = norm(pts[sel][:, ::-1].mean(0), v, s, (rz, ry, rx),
                               (vz / rz, vy / ry, vx / rx))
        for s in np.unique(sm[selv]):
            sel = selv & (sm == s)
            occ_med[v, s] = True
            c_med[v, s] = norm(pts[sel][:, ::-1].mean(0), v, s, (mz, my, mx),
                               (vz / mz, vy / my, vx / mx))
    # targets are slot_sort-ordered; relabel the slot_low oracle tables
    perm = mae._slot_sort_to_low(cfg.voxel)      # perm[slot_sort] = slot_low
    return c_low[:, perm], occ_low[:, perm], c_med, occ_med, c_top


def test_dense_targets_match_oracle(cfg, setup):
    _, scene = setup
    tg = mae.compute_targets_batch(scene, cfg)
    b = 0
    c_low, occ_low, c_med, occ_med, c_top = dense_oracle(scene, cfg, b)

    np.testing.assert_array_equal(np.asarray(tg.low_occ)[b], occ_low)
    np.testing.assert_array_equal(np.asarray(tg.med_occ)[b], occ_med)
    np.testing.assert_allclose(np.asarray(tg.low_tgt)[b][occ_low],
                               c_low[occ_low], rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(tg.med_tgt)[b][occ_med],
                               c_med[occ_med], rtol=3e-3, atol=3e-3)

    got_top = np.asarray(tg.centroid_top)[b]
    tvalid = np.asarray(scene.table.valid)[b]
    np.testing.assert_allclose(got_top[tvalid], c_top[tvalid], rtol=3e-3,
                               atol=3e-3)


def test_sparse_loss_equals_dense_oracle(cfg, setup):
    """pretrain_loss (sparse gathers) == dense masked means."""
    _, scene = setup
    tg = mae.compute_targets_batch(scene, cfg)
    keep = mae.sample_mask(jax.random.PRNGKey(1), scene.table.valid,
                           cfg.mae.random_mask_ratio)
    B, V = keep.shape
    S, M = cfg.voxel.num_slots_low, cfg.voxel.num_slots_med
    rng = np.random.default_rng(0)
    preds = dict(
        reg_low=jnp.asarray(rng.normal(size=(B, V, S, 3)).astype(np.float32)),
        reg_med=jnp.asarray(rng.normal(size=(B, V, M, 3)).astype(np.float32)),
        reg_top=jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32)),
        nor_top=jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32)),
        cls_low=jnp.asarray(rng.normal(size=(B, V, S, 2)).astype(np.float32)),
        cls_med=jnp.asarray(rng.normal(size=(B, V, M, 2)).astype(np.float32)),
    )
    losses = mae.pretrain_loss(preds, tg, scene, keep, cfg)

    mask_rows = np.asarray(scene.table.valid) & ~np.asarray(keep)
    tot = dict(low=[], med=[], cls_low=[], cls_med=[])
    for b in range(B):
        c_low, occ_low, c_med, occ_med, _ = dense_oracle(scene, cfg, b)
        for name, (cd, od, pr, cl) in dict(
            low=(c_low, occ_low, np.asarray(preds["reg_low"][b]),
                 np.asarray(preds["cls_low"][b])),
            med=(c_med, occ_med, np.asarray(preds["reg_med"][b]),
                 np.asarray(preds["cls_med"][b])),
        ).items():
            sel = mask_rows[b][:, None] & od
            err = ((pr - cd) ** 2).mean(-1)
            tot[name].append((err[sel].sum(), sel.sum()))
            onehot = np.stack([1 - od.astype(np.float32),
                               od.astype(np.float32)], -1)
            bce = np.maximum(cl, 0) - cl * onehot + np.log1p(
                np.exp(-np.abs(cl)))
            tot[f"cls_{name}"].append(
                (bce[mask_rows[b]].sum(),
                 mask_rows[b].sum() * bce.shape[1] * 2))

    def ratio(key):
        num = sum(t[0] for t in tot[key])
        den = max(sum(t[1] for t in tot[key]), 1)
        return num / den

    np.testing.assert_allclose(float(losses["loss_centroid_low"]),
                               ratio("low") * cfg.mae.loss_ratio_low,
                               rtol=1e-3)
    np.testing.assert_allclose(float(losses["loss_centroid_med"]),
                               ratio("med") * cfg.mae.loss_ratio_med,
                               rtol=1e-3)
    np.testing.assert_allclose(float(losses["loss_cls_low"]),
                               ratio("cls_low") * cfg.mae.cls_loss_ratio_low,
                               rtol=1e-3)
    np.testing.assert_allclose(float(losses["loss_cls_med"]),
                               ratio("cls_med") * cfg.mae.cls_loss_ratio_med,
                               rtol=1e-3)


def test_targets_normal_planar(cfg):
    """Points on a flat plane -> normals along z."""
    P = cfg.caps.max_points
    rng = np.random.default_rng(1)
    r = cfg.voxel.point_cloud_range
    xy = rng.uniform(r[0] + 1, r[3] - 1, (P, 2)).astype(np.float32)
    z = np.full(P, -1.0, np.float32)
    pts = np.stack([xy[:, 0], xy[:, 1], z], -1)[None]
    valid = np.ones((1, P), bool)
    scene = build_scene_batch(jnp.asarray(pts), jnp.asarray(valid),
                              cfg.voxel, cfg.caps.max_voxels)
    tg = mae.compute_targets_batch(scene, cfg)
    nrm = np.asarray(tg.normal)[0]
    v = np.asarray(scene.table.valid)[0]
    cos = np.abs(nrm[v, 0])   # normal of a z-plane in (z, y, x) is (1, 0, 0)
    assert np.mean(cos > 0.99) > 0.95


@pytest.mark.slow
def test_forward_and_loss(cfg):
    state, _ = init_state(cfg, batch_size=2, rng=jax.random.PRNGKey(0))
    batch = dummy_batch(cfg, batch_size=2, seed=5)
    losses, _ = forward(cfg, {"params": state.params,
                              "batch_stats": state.batch_stats},
                        batch, jax.random.PRNGKey(1), train=True)
    for k, val in losses.items():
        assert np.isfinite(float(val)), (k, val)
    assert float(losses["loss"]) > 0


@pytest.mark.slow
def test_grad_flow(cfg):
    state, tx = init_state(cfg, batch_size=1, rng=jax.random.PRNGKey(0))
    batch = dummy_batch(cfg, batch_size=1, seed=7)

    def loss_fn(params):
        losses, _ = forward(cfg, {"params": params,
                                  "batch_stats": state.batch_stats},
                            batch, jax.random.PRNGKey(2), train=True)
        return losses["loss"]

    grads = jax.grad(loss_fn)(state.params)
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_slot_sort_to_low_matches_sub_voxel_slots(cfg):
    """The static slot mapping table agrees with the per-point relabeling
    in ops.voxelize.sub_voxel_slots for every in-pillar position."""
    import numpy as np

    from geomae_tpu.models.mae import _slot_sort_to_low
    from geomae_tpu.ops.voxelize import sub_voxel_slots

    voxel = cfg.voxel
    rz, ry, rx = voxel.sub_voxel_ratio_low
    z, y, x = np.meshgrid(np.arange(rz), np.arange(ry), np.arange(rx),
                          indexing="ij")
    low = jnp.asarray(np.stack([z.ravel(), y.ravel(), x.ravel()], -1))
    slot_low, _, slot_sort = sub_voxel_slots(low, voxel)
    perm = _slot_sort_to_low(voxel)
    np.testing.assert_array_equal(perm[np.asarray(slot_sort)],
                                  np.asarray(slot_low))


def test_targets_pallas_path_matches_xla(cfg, setup):
    """compute_targets_batch(use_pallas=True) (interpret mode) == XLA path."""
    from jax.experimental.pallas import tpu as pltpu
    _, scene = setup
    P = int(scene.valid.shape[-1])
    if P % 512 != 0:
        pytest.skip("tiny config P not chunk-aligned")
    ref = mae.compute_targets_batch(scene, cfg, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = mae.compute_targets_batch(scene, cfg, use_pallas=True)
    for name in ref._fields:
        if name == "normal":
            continue
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)
    # eigenvectors flip for near-degenerate covariances under different
    # float summation orders — compare |cosine| on valid rows instead
    valid = np.asarray(scene.table.valid)
    a = np.asarray(ref.normal)[valid]
    b = np.asarray(got.normal)[valid]
    cos = np.abs((a * b).sum(-1)) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)
    assert np.mean(cos > 0.999) > 0.97, np.mean(cos > 0.999)
