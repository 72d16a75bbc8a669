from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, distributed_init,
                   epoch_permutation, make_mesh, process_shard_bounds,
                   replicate, replicated, shard_batch)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "distributed_init",
           "epoch_permutation", "make_mesh", "process_shard_bounds",
           "replicate", "replicated", "shard_batch"]
