from . import (attention, eig3, k_medoids, pointnet_ops, scatter,  # noqa: F401
               voxelize, windows)
