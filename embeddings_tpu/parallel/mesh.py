"""Device mesh construction and multi-host init.

The reference is single-process (SURVEY.md §2: no DP/TP/PP anywhere; its
only parallelism is ggml's intra-op threadpool, bert.cpp:1101). Scaling here
is the standard TPU recipe instead: a ("data", "model") mesh; batch sharded
over "data" across chips/hosts, weights tensor-sharded over "model" within
a slice so the collectives (psum after row-parallel matmuls) ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int | None = None, tp: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) x tp({tp}) != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
