from . import attention, eig3, scatter, voxelize, windows  # noqa: F401
