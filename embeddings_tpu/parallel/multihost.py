"""Multi-host (pod / multi-process) support.

The reference is strictly single-process (SURVEY.md §2 parallelism table),
so all of this is greenfield per the TPU plan: `jax.distributed` bring-up,
plus a data-parallel batch encode that spans hosts — each process tokenizes
and encodes its own shard of the corpus on its local devices and the
results are exchanged over DCN with one process_allgather at the end.

Serving deployments normally run one Engine replica per host behind an
external load balancer (DP over DCN needs no lockstep); this module is for
offline/batch jobs where one logical call should use the whole pod.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

import jax

log = logging.getLogger("embeddings_tpu.multihost")


def auto_initialize(coordinator: str | None = None,
                    num_processes: int | None = None,
                    process_id: int | None = None) -> bool:
    """Bring up jax.distributed if this looks like a multi-process job.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID env vars > TPU pod metadata autodetection (argless
    initialize). Returns True if distributed mode is active. Safe to call
    twice (second call is a no-op).
    """
    # Check "already initialized" WITHOUT touching the backend:
    # jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize refuses to run.
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return jax.process_count() > 1
    except Exception:  # pragma: no cover - private API moved
        pass
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        log.info("jax.distributed up: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    # TPU pod metadata autodetection: only attempt the argless
    # initialize when the runtime actually advertises a multi-worker
    # slice — on single-host setups it would raise, and probing via
    # jax.process_count() instead would initialize the XLA backend and
    # permanently foreclose jax.distributed.initialize (the hazard the
    # comment above warns about).
    pod_markers = ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                   "MEGASCALE_COORDINATOR_ADDRESS")
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if any(os.environ.get(k) for k in pod_markers) and \
            (not hosts or "," in hosts):
        try:
            jax.distributed.initialize()
            log.info("jax.distributed up (pod autodetect): process %d/%d",
                     jax.process_index(), jax.process_count())
            return True
        except Exception as e:  # pragma: no cover - env-specific
            log.warning("pod autodetection failed (%s); staying "
                        "single-process", e)
            return False
    return False


def process_shard(n: int, *, count: int | None = None,
                  index: int | None = None) -> slice:
    """This process's contiguous slice of n items (balanced, first shards
    get the remainder)."""
    count = count if count is not None else jax.process_count()
    index = index if index is not None else jax.process_index()
    base, rem = divmod(n, count)
    start = index * base + min(index, rem)
    return slice(start, start + base + (1 if index < rem else 0))


def distributed_encode_batch(engine, texts: Sequence[str],
                             batch_size: int | None = None) -> np.ndarray:
    """Encode a global text list across all hosts.

    Every process must call this with the SAME texts (SPMD discipline: the
    allgather is a collective). Each host runs its shard through its local
    engine — host-local tokenization, device batching, everything — then
    results are exchanged so every host returns the full [N, E] matrix.
    """
    texts = list(texts)
    n_proc = jax.process_count()
    if n_proc == 1:
        return engine.encode_batch(texts, batch_size=batch_size)
    sl = process_shard(len(texts))
    local = engine.encode_batch(texts[sl], batch_size=batch_size) \
        if sl.stop > sl.start else \
        np.zeros((0, engine.n_embd), np.float32)
    # fixed-size exchange: pad the local shard to the max shard size so
    # every process contributes the same shape (allgather requirement)
    max_shard = -(-len(texts) // n_proc)
    padded = np.zeros((max_shard, engine.n_embd), np.float32)
    padded[: len(local)] = local
    from jax.experimental import multihost_utils
    gathered = np.asarray(
        multihost_utils.process_allgather(padded, tiled=False))
    out = np.empty((len(texts), engine.n_embd), np.float32)
    for p in range(n_proc):
        s = process_shard(len(texts), count=n_proc, index=p)
        out[s] = gathered[p, : s.stop - s.start]
    return out
