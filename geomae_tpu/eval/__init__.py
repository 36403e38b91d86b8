from . import nuscenes_eval  # noqa: F401
