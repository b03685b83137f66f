from .mesh import DATA_AXIS, MODEL_AXIS, initialize_distributed, make_mesh
from .multihost import (auto_initialize, distributed_encode_batch,
                        process_shard)
from .sharding import make_sharded_forward, param_pspecs, shard_params

__all__ = ["DATA_AXIS", "MODEL_AXIS", "initialize_distributed", "make_mesh",
           "make_sharded_forward", "param_pspecs", "shard_params",
           "auto_initialize", "distributed_encode_batch", "process_shard"]
