"""Multi-chip distribution layer (mesh shardings + collectives).

The reference has NO distributed backend (single-process OpenMP only,
SURVEY.md §2/§5); this layer is designed fresh for TPU pods: jax.sharding
meshes, shard_map kernels, and XLA collectives over ICI/DCN.
"""

from .sharded_msm import sharded_msm  # noqa: F401
