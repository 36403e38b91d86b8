"""High-level inference API — the ``mmdet3d/apis/inference.py`` analogue
(``init_model`` / ``inference_detector``, reference ``apis/inference.py:
35-110``): load a fine-tuned checkpoint and run detection on raw points.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from . import config as C
from .data.transforms import pad_points, points_range_filter
from .train import finetune as FT
from .train.checkpoint import CheckpointManager


class Detector3D:
    """Stateful convenience wrapper: build model, load weights, predict."""

    def __init__(self, cfg: Optional[C.FinetuneConfig] = None,
                 ckpt_dir: Optional[str] = None):
        self.cfg = cfg or C.geomae_finetune_nus()
        self.state, _ = FT.init_state(self.cfg, batch_size=1,
                                      rng=jax.random.PRNGKey(0))
        if ckpt_dir is not None:
            self.state = CheckpointManager(ckpt_dir).restore(self.state)
        self._predict = jax.jit(FT.make_predict_fn(self.cfg))

    def __call__(self, points: np.ndarray) -> Dict[str, np.ndarray]:
        """points: [N, 5] raw (x y z intensity dt).  Returns dict of
        boxes [M, 9] / scores [M] / labels [M]."""
        s = points_range_filter(dict(points=points),
                                self.cfg.voxel.point_cloud_range)
        p, v = pad_points(s["points"], self.cfg.caps.max_points)
        batch = dict(points=p[None], point_valid=v[None])
        det = self._predict(self.state, batch)
        m = np.asarray(det.valid[0])
        return dict(boxes=np.asarray(det.boxes[0])[m],
                    scores=np.asarray(det.scores[0])[m],
                    labels=np.asarray(det.labels[0])[m])

    def aug_test(self, points: np.ndarray,
                 flips: Tuple[Tuple[bool, bool], ...] = (
                     (False, False), (True, False), (False, True),
                     (True, True)),
                 scales: Tuple[float, ...] = (1.0,)
                 ) -> Dict[str, np.ndarray]:
        """Test-time augmentation (reference ``VoxelNet.aug_test``,
        ``voxelnet.py:119-139``): run the SAME jitted predict once per
        flipped/scaled view of the cloud, map each view's boxes back, and
        merge with per-class rotated NMS (``core/aug_merge.py``)."""
        from .core.aug_merge import merge_aug_bboxes_3d

        results, metas = [], []
        for s in scales:
            for fh, fv in flips:
                pts = np.array(points, np.float32, copy=True)
                if fh:
                    pts[:, 1] = -pts[:, 1]
                if fv:
                    pts[:, 0] = -pts[:, 0]
                pts[:, :3] *= s
                results.append(self(pts))
                metas.append(dict(pcd_scale_factor=s,
                                  pcd_horizontal_flip=fh,
                                  pcd_vertical_flip=fv))
        return merge_aug_bboxes_3d(
            results, metas, self.cfg.head.nms_thr, self.cfg.head.max_num)


def init_model(ckpt_dir: str, cfg: Optional[C.FinetuneConfig] = None):
    return Detector3D(cfg, ckpt_dir)


def inference_detector(model: Detector3D, points: np.ndarray):
    return model(points)
