from . import loader, nuscenes, pointcloud, synthetic, transforms  # noqa: F401
