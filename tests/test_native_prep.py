"""Native C++ point-prep core vs the numpy pipeline."""
import os

import numpy as np
import pytest

from geomae_tpu.config import CapsConfig, DataConfig, VoxelConfig
from geomae_tpu.csrc import get_lib
from geomae_tpu.data.nuscenes import NuScenesSSLDataset, load_infos
from geomae_tpu.data.synthetic import write_synthetic_infos

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native core unavailable (no g++)")


@pytest.fixture(scope="module")
def infos_pkl(tmp_path_factory):
    return write_synthetic_infos(str(tmp_path_factory.mktemp("nus_native")))


def _datasets(infos_pkl, **kw):
    caps = CapsConfig(max_points=16384, max_voxels=512, max_visible=256)
    cfg = DataConfig(data_root=os.path.dirname(infos_pkl),
                     ann_file=os.path.basename(infos_pkl))
    voxel = VoxelConfig()
    nat = NuScenesSSLDataset(cfg, voxel, caps, native=True, **kw)
    ref = NuScenesSSLDataset(cfg, voxel, caps, native=False, **kw)
    return nat, ref


def test_native_matches_numpy_eval_mode(infos_pkl):
    nat, ref = _datasets(infos_pkl, test_mode=True)
    a = nat.__getitem__(0, seed=0)
    b = ref.__getitem__(0, seed=0)
    assert a["point_valid"].sum() == b["point_valid"].sum()
    # same point SET (order may differ)
    pa = a["points"][a["point_valid"]]
    pb = b["points"][b["point_valid"]]
    sa = pa[np.lexsort(pa.T)]
    sb = pb[np.lexsort(pb.T)]
    np.testing.assert_allclose(sa, sb, atol=1e-5)


def test_native_train_mode_valid(infos_pkl):
    nat, _ = _datasets(infos_pkl, test_mode=False)
    s = nat.__getitem__(0, seed=7)
    pts = s["points"][s["point_valid"]]
    assert len(pts) > 500
    r = VoxelConfig().point_cloud_range
    assert pts[:, 0].min() >= r[0] and pts[:, 0].max() < r[3]
    assert pts[:, 2].min() >= r[2] and pts[:, 2].max() < r[5]
    # deterministic under the same seed
    s2 = nat.__getitem__(0, seed=7)
    np.testing.assert_array_equal(s["points"], s2["points"])


def test_native_throughput_smoke(infos_pkl):
    """Native path at least works repeatedly under threads."""
    from geomae_tpu.data.loader import PrefetchLoader
    nat, _ = _datasets(infos_pkl)
    loader = PrefetchLoader(nat, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert batches and batches[0]["points"].shape[0] == 2
