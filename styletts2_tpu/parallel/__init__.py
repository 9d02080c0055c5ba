from .mesh import make_mesh, shard_batch, replicate_params, data_sharding

__all__ = ["make_mesh", "shard_batch", "replicate_params", "data_sharding"]
