from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, distributed_init,
                   epoch_permutation, make_mesh, process_shard_bounds,
                   replicate, replicated, shard_batch)
from .sequence import SeqParallelSpec, ring_attention
from .sharding_rules import (param_shardings, param_specs, shard_params,
                             validate_tp_divisibility)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "distributed_init",
           "epoch_permutation", "make_mesh", "process_shard_bounds",
           "replicate", "replicated", "shard_batch", "param_shardings",
           "param_specs", "shard_params", "validate_tp_divisibility",
           "SeqParallelSpec", "ring_attention"]
