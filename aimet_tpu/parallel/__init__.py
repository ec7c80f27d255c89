from .mesh import batch_sharding, make_mesh, replicated, shard_params, spec_for_path
