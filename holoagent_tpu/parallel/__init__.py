"""Device-mesh construction and sharding rules.

The reference has no on-device parallelism at all (single CUDA GPU,
SURVEY.md §2.4); this package is where the TPU framework's scaling lives:
DP over frames/crops/queries on the "data" axis, TP over tower weights on the
"model" axis, with XLA inserting ICI collectives from sharding annotations.
"""

from .mesh import make_mesh, local_mesh
from .sharding import (
    clip_param_sharding,
    data_sharding,
    replicated,
    shard_params,
)
