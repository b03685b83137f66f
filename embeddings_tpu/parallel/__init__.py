from .mesh import DATA_AXIS, MODEL_AXIS, initialize_distributed, make_mesh
from .sharding import make_sharded_forward, param_pspecs, shard_params

__all__ = ["DATA_AXIS", "MODEL_AXIS", "initialize_distributed", "make_mesh",
           "make_sharded_forward", "param_pspecs", "shard_params"]
