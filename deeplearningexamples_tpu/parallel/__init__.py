from .mesh import MeshSpec, build_mesh, data_sharding, replicated, shard_batch
