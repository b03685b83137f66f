from .context import SEQ_AXIS, make_cp_forward, make_mesh_cp
from .mesh import DATA_AXIS, MODEL_AXIS, initialize_distributed, make_mesh
from .multihost import (auto_initialize, distributed_encode_batch,
                        process_shard)
from .sharding import make_sharded_forward, param_pspecs, shard_params

__all__ = ["DATA_AXIS", "MODEL_AXIS", "SEQ_AXIS", "initialize_distributed",
           "make_mesh", "make_mesh_cp", "make_cp_forward",
           "make_sharded_forward", "param_pspecs", "shard_params",
           "auto_initialize", "distributed_encode_batch", "process_shard"]
