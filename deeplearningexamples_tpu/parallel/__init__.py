from .mesh import (
    MeshSpec,
    build_mesh,
    data_sharding,
    replicated,
    shard_batch,
    shard_batch_local,
)
from .pipeline import pipeline_apply, stack_stage_params
from .zero import shard_optimizer_state
