from .mesh import (
    MeshSpec,
    build_mesh,
    data_sharding,
    replicated,
    shard_batch,
    shard_batch_local,
)
from .zero import shard_optimizer_state
