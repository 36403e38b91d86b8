"""Data layer: IO, transforms, dataset pipeline, loader."""
import numpy as np
import pytest

from geomae_tpu.config import CapsConfig, DataConfig, VoxelConfig
from geomae_tpu.data import transforms as T
from geomae_tpu.data.loader import PrefetchLoader
from geomae_tpu.data.nuscenes import NuScenesDetDataset, NuScenesSSLDataset
from geomae_tpu.data.pointcloud import merge_sweeps, remove_close
from geomae_tpu.data.synthetic import write_synthetic_infos


@pytest.fixture(scope="module")
def infos_pkl(tmp_path_factory):
    return write_synthetic_infos(str(tmp_path_factory.mktemp("nus")))


def test_remove_close():
    pts = np.array([[0.5, 0.5, 0, 0, 0], [5, 5, 0, 0, 0],
                    [0.2, 3, 0, 0, 0]], np.float32)
    out = remove_close(pts, 1.0)
    assert len(out) == 2  # only the (0.5, 0.5) ego return dropped


def test_merge_sweeps(infos_pkl):
    from geomae_tpu.data.nuscenes import load_infos
    info = load_infos(infos_pkl)[1]
    pts = merge_sweeps(info, data_root="", sweeps_num=9)
    assert pts.shape[1] == 5
    lags = np.unique(pts[:, 4])
    assert 0.0 in lags and len(lags) == 3        # key + 2 sweeps
    assert np.all(lags >= 0)


def test_rot_scale_trans_properties(rng):
    pts = rng.normal(size=(100, 5)).astype(np.float32)
    boxes = np.array([[1, 2, 0, 4, 2, 1.5, 0.3, 1.0, 0.0]], np.float32)
    s = T.global_rot_scale_trans(dict(points=pts, boxes=boxes), rng,
                                 rot_range=(0.5, 0.5),
                                 scale_range=(1.0, 1.0),
                                 translation_std=(0, 0, 0))
    # pure rotation preserves radii
    np.testing.assert_allclose(
        np.linalg.norm(s["points"][:, :2], axis=1),
        np.linalg.norm(pts[:, :2], axis=1), rtol=1e-5)
    assert abs(s["boxes"][0, 6] - 0.8) < 1e-6
    # box center rotates like a point
    np.testing.assert_allclose(
        np.linalg.norm(s["boxes"][0, :2]), np.linalg.norm([1, 2]), rtol=1e-5)


def test_flip_involution(rng):
    pts = rng.normal(size=(50, 5)).astype(np.float32)
    s = dict(points=pts)
    f = T.random_flip_3d(s, np.random.default_rng(1), 1.0, 0.0)  # always flip y
    assert np.allclose(f["points"][:, 1], -pts[:, 1])
    ff = T.random_flip_3d(f, np.random.default_rng(1), 1.0, 0.0)
    assert np.allclose(ff["points"], pts)


def test_ssl_dataset_shapes(infos_pkl):
    import os
    caps = CapsConfig(max_points=8192, max_voxels=512, max_visible=256)
    cfg = DataConfig(data_root=os.path.dirname(infos_pkl),
                     ann_file=os.path.basename(infos_pkl))
    ds = NuScenesSSLDataset(cfg, VoxelConfig(), caps)
    s = ds.__getitem__(0, seed=0)
    assert s["points"].shape == (8192, 5)
    assert s["point_valid"].sum() > 1000
    r = VoxelConfig().point_cloud_range
    pv = s["points"][s["point_valid"]]
    assert pv[:, 0].min() >= r[0] and pv[:, 0].max() < r[3]
    # determinism by seed
    s2 = ds.__getitem__(0, seed=0)
    np.testing.assert_array_equal(s["points"], s2["points"])


def test_det_dataset_and_loader(infos_pkl):
    import os
    caps = CapsConfig(max_points=8192, max_voxels=512, max_visible=256)
    cfg = DataConfig(data_root=os.path.dirname(infos_pkl),
                     ann_file=os.path.basename(infos_pkl))
    ds = NuScenesDetDataset(cfg, VoxelConfig(
        point_cloud_range=(-50, -50, -5, 50, 50, 3),
        voxel_size=(0.25, 0.25, 8.0)), caps, max_gt_boxes=64)
    s = ds.__getitem__(0, seed=1)
    assert s["gt_boxes"].shape == (64, 9)
    assert s["gt_mask"].sum() > 0
    assert np.all(s["gt_labels"][s["gt_mask"]] >= 0)

    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    assert batches[0]["points"].shape == (2, 8192, 5)


def test_lyft_dataset_reader(tmp_path):
    """LyftDataset shares the nuScenes reader with the Lyft vocabulary and
    zero-padded velocity dims."""
    import pickle
    import numpy as np
    from geomae_tpu.config import geomae_finetune_nus, replace
    from geomae_tpu.data.nuscenes import LYFT_CLASSES, LyftDataset

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (300, 5)).astype(np.float32)
    bin_path = tmp_path / "lidar0.bin"
    pts.astype(np.float32).tofile(bin_path)
    infos = [dict(
        lidar_path=str(bin_path), timestamp=0, sweeps=[],
        gt_boxes=np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32),
        gt_names=np.array(["emergency_vehicle"]),
        token="t0",
    )]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(dict(infos=infos, metadata={}), f)

    cfg = geomae_finetune_nus()
    data = replace(cfg.data, data_root=str(tmp_path), ann_file="infos.pkl",
                   sweeps_num=0)
    ds = LyftDataset(data, cfg.voxel, cfg.caps, infos=infos)
    assert ds.CLASSES == LYFT_CLASSES
    sample = ds.__getitem__(0, seed=1)
    assert sample["gt_boxes"].shape[-1] == 9          # velocity zero-padded
    lbl = sample["gt_labels"][sample["gt_mask"]]
    assert (lbl == LYFT_CLASSES.index("emergency_vehicle")).all()


def test_apply_overrides():
    """--cfg-options dotted-path overrides (mmcv DictAction analogue)."""
    from geomae_tpu import config as C
    cfg = C.geomae_pretrain_nus()
    out = C.apply_overrides(cfg, ["optim.lr=3e-5", "sst.d_model=256",
                                  "voxel.voxel_size=0.2,0.2,8",
                                  "compute_dtype=float32",
                                  "mae.cls_sub_voxel=False"])
    assert out.optim.lr == 3e-5
    assert out.sst.d_model == 256
    assert out.voxel.voxel_size == (0.2, 0.2, 8)
    assert out.compute_dtype == "float32"
    assert out.mae.cls_sub_voxel is False
    assert cfg.optim.lr == 1e-5          # original untouched (frozen tree)

    import pytest
    with pytest.raises(AttributeError):
        C.apply_overrides(cfg, ["optim.nope=1"])
    with pytest.raises(AttributeError):
        C.apply_overrides(cfg, ["nope.lr=1"])
