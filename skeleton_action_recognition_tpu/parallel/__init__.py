"""Device-mesh construction and sharding policies."""

from skeleton_action_recognition_tpu.parallel import mesh  # noqa: F401
from skeleton_action_recognition_tpu.parallel.mesh import (
    create_mesh,
    local_device_count,
    maybe_initialize_distributed,
)
from skeleton_action_recognition_tpu.parallel.sharding import (
    DataParallel,
    group_batches,
    prefetch_to_device,
    shard_batch,
)

__all__ = [
    "DataParallel",
    "create_mesh",
    "group_batches",
    "local_device_count",
    "maybe_initialize_distributed",
    "mesh",
    "prefetch_to_device",
    "shard_batch",
]
