from .mesh import MeshSpec, build_mesh, data_sharding, replicated, shard_batch
from .zero import shard_optimizer_state
