"""geomae-tpu: a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of Tsinghua-MARS-Lab/GeoMAE (CVPR 2023, arXiv 2305.08808).

See SURVEY.md at the repo root for the structural analysis of the reference
and ARCHITECTURE.md for how this rebuild maps onto TPU hardware.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
