"""Metrics logging: stdout text log + JSONL, mirroring mmcv's
``TextLoggerHook``/``TensorboardLoggerHook`` pair (``configs/_base_/
default_runtime.py:4-11``) without external deps."""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

_FMT = "%(asctime)s - geomae_tpu - %(levelname)s - %(message)s"


def get_root_logger(log_file: Optional[str] = None,
                    level: int = logging.INFO) -> logging.Logger:
    """Reference ``mmdet3d/utils/logger.py`` analogue."""
    logger = logging.getLogger("geomae_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    return logger


class MetricsLogger:
    """Logs loss dicts every ``interval`` steps: text + .jsonl file."""

    def __init__(self, work_dir: str, interval: int = 50):
        self.interval = interval
        self.logger = get_root_logger(os.path.join(work_dir, "train.log"))
        self.jsonl = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._t0 = time.perf_counter()
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train",
            force: bool = False):
        if step % self.interval and not force:
            return
        now = time.perf_counter()
        it_time = (now - self._t0) / max(step - self._last_step, 1)
        self._t0, self._last_step = now, step
        vals = {k: float(v) for k, v in metrics.items()}
        vals.update(step=step, iter_time=round(it_time, 4), mode=prefix)
        self.jsonl.write(json.dumps(vals) + "\n")
        self.jsonl.flush()
        msg = ", ".join(f"{k}: {v:.4f}" for k, v in vals.items()
                        if isinstance(v, float))
        self.logger.info("[%s] step %d — %s", prefix, step, msg)


def collect_env() -> Dict[str, str]:
    """Environment fingerprint (reference ``mmdet3d/utils/collect_env.py``)."""
    import platform

    import jax

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": ", ".join(str(d) for d in jax.devices()),
    }
    try:
        import flax
        import optax
        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info
