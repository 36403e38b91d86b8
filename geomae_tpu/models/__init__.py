from . import mae, norm, sst, vfe  # noqa: F401
