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


def init_model(ckpt_dir: str, cfg: Optional[C.FinetuneConfig] = None):
    return Detector3D(cfg, ckpt_dir)


def inference_detector(model: Detector3D, points: np.ndarray):
    return model(points)
