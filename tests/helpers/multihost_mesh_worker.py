"""Worker for the two-process GLOBAL-MESH test: a (data=2, model=2) mesh
spanning two processes (2 virtual CPU devices each), the sharded forward
running with jax.make_array_from_process_local_data inputs — proving the
shard_map TP psums and DP batch sharding execute across process
boundaries, not just inside one controller.

Spawned by tests/test_multihost.py::test_two_process_global_mesh_forward.
"""
import sys, os
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import jax
jax.config.update("jax_platforms", "cpu")
from embeddings_tpu.parallel.multihost import auto_initialize

ok = auto_initialize(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=proc_id)
assert ok and jax.process_count() == nproc

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from embeddings_tpu.parallel.sharding import (make_sharded_forward,
                                              shard_params)

# global mesh: data axis SPANS the two processes, model axis is
# intra-process (the production layout: TP inside a host, DP across)
devs = np.asarray(jax.devices()).reshape(2, 2)   # [process, local]
mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))

cfg = BertConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=128,
                 max_position_embeddings=32)
params = P.init_params(cfg, rng=0)                 # identical on both
gp = shard_params(params, cfg, mesh)               # global param arrays
fwd = make_sharded_forward(cfg, mesh, compute_dtype="bfloat16")

B, L = 4, 16
rng = np.random.default_rng(0)
ids_global = rng.integers(5, cfg.vocab_size, (B, L)).astype(np.int32)
mask_global = np.ones((B, L), np.int32)
mask_global[0, 10:] = 0

data_sh = NamedSharding(mesh, P_(DATA_AXIS, None))
# each process contributes ITS batch half
half = slice(proc_id * (B // 2), (proc_id + 1) * (B // 2))
ids = jax.make_array_from_process_local_data(data_sh, ids_global[half],
                                             (B, L))
mask = jax.make_array_from_process_local_data(data_sh, mask_global[half],
                                              (B, L))

out = fwd(gp, ids, mask)
jax.block_until_ready(out)
# gather the full result on every process and compare to single-device
from jax.experimental import multihost_utils
full = multihost_utils.process_allgather(out, tiled=True)
ref = np.asarray(jax.jit(lambda p, i, m: bert.encode_tokens(
    p, cfg, i, m, compute_dtype="bfloat16"))(
        P.fuse_qkv(params), ids_global, mask_global))
err = float(np.abs(np.asarray(full) - ref).max())
print(f"proc {proc_id}/{nproc}: global mesh {dict(mesh.shape)}, "
      f"out={full.shape}, max|mesh - single| = {err:.2e}", flush=True)
assert err < 5e-2, err   # bf16 reduction-order tolerance
print(f"proc {proc_id}: GLOBAL_MESH_OK", flush=True)
