from .mesh import batch_sharding, make_mesh, replicate, replicated, shard_batch
from .multihost import maybe_initialize_distributed, reduce_mean
