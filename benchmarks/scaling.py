#!/usr/bin/env python
"""Scaling-efficiency benchmark: sentences/s at 1 device vs an N-device
(data x model) mesh — the pod-scaling deliverable from SURVEY.md §7.5.

On real TPU hardware run it as-is (all local chips). Without a multi-chip
slice, run on a virtual CPU mesh to validate the sharded program and
measure parallel efficiency of the compiled collectives:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py [--tp 2] [--batch-per-device 32]

Prints one JSON line per configuration:
  {"devices": N, "dp": d, "tp": t, "sentences_per_s": x, "efficiency": e}
where efficiency = throughput / (N * single-device throughput).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def throughput(fwd, params, ids, mask, reps: int = 5) -> float:
    """sentences/s via the slope method (amortizes dispatch overhead)."""
    import time
    fwd(params, ids, mask).block_until_ready()  # compile + warm
    lo, hi = 2, 2 + reps
    t0 = time.perf_counter()
    for _ in range(lo):
        out = fwd(params, ids, mask)
    out.block_until_ready()
    t1 = time.perf_counter()
    for _ in range(hi):
        out = fwd(params, ids, mask)
    out.block_until_ready()
    t2 = time.perf_counter()
    per_call = ((t2 - t1) - (t1 - t0)) / (hi - lo)
    return ids.shape[0] / max(per_call, 1e-9)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None,
                    help="HF dir / .npz / .bin (default: random --arch)")
    ap.add_argument("--arch", default="bge-base-en-v1.5",
                    help="KNOWN_MODELS architecture for the random-init "
                         "default (use a small one on virtual CPU meshes)")
    ap.add_argument("--dtype", default="q4_0")
    ap.add_argument("--tp", type=int, nargs="*", default=[1],
                    help="model-axis sizes to sweep for full-mesh configs")
    ap.add_argument("--sp", type=int, nargs="*", default=[],
                    help="seq-axis (context-parallel) sizes to sweep")
    ap.add_argument("--batch-per-device", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--out", default=None,
                    help="write the results array as JSON here")
    args = ap.parse_args()

    import os

    import jax
    # the image's sitecustomize pins the axon TPU platform at interpreter
    # startup, so the env var alone doesn't stick — honor it explicitly
    # (the docstring's virtual-CPU-mesh recipe depends on this)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from embeddings_tpu.config import BertConfig, KNOWN_MODELS
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.parallel import make_mesh, make_sharded_forward, \
        shard_params

    if args.model:
        from embeddings_tpu.models.params import load_hf_dir, load_native
        path = Path(args.model)
        params, cfg = (load_hf_dir(path) if path.is_dir()
                       else load_native(path))
        if args.dtype != "f32":
            params = P.quantize_params(params, args.dtype)
    else:
        cfg = BertConfig(**{**KNOWN_MODELS[args.arch],
                            "vocab_size": 30528})
        params = P.init_params(cfg, rng=0)
        if args.dtype != "f32":
            params = P.quantize_params(params, args.dtype)

    devices = jax.devices()
    n = len(devices)
    rng = np.random.default_rng(0)

    def inputs(batch):
        ids = rng.integers(0, cfg.vocab_size, (batch, args.seq))
        return ids.astype(np.int32), np.ones((batch, args.seq), np.int32)

    results = []
    # single device baseline
    mesh1 = make_mesh(dp=1, tp=1, devices=devices[:1])
    fwd1 = make_sharded_forward(cfg, mesh1, compute_dtype="bfloat16")
    p1 = shard_params(params, cfg, mesh1)
    ids, mask = inputs(args.batch_per_device)
    base = throughput(fwd1, p1, ids, mask)
    results.append({"devices": 1, "dp": 1, "tp": 1,
                    "sentences_per_s": round(base, 1), "efficiency": 1.0})
    print(json.dumps(results[-1]), flush=True)

    if n > 1:
        for tp in sorted(set([1] + list(args.tp))):
            if n % tp or cfg.num_attention_heads % tp:
                continue
            dp = n // tp
            mesh = make_mesh(dp=dp, tp=tp, devices=devices)
            fwd = make_sharded_forward(cfg, mesh, compute_dtype="bfloat16")
            pN = shard_params(params, cfg, mesh)
            ids, mask = inputs(args.batch_per_device * dp)
            thr = throughput(fwd, pN, ids, mask)
            results.append({
                "devices": n, "dp": dp, "tp": tp,
                "sentences_per_s": round(thr, 1),
                "efficiency": round(thr / (n * base), 3)})
            print(json.dumps(results[-1]), flush=True)
        for sp in sorted(set(args.sp)):
            if sp < 2 or n % sp or args.seq % sp:
                continue
            from embeddings_tpu.parallel.context import (make_cp_forward,
                                                         make_mesh_cp)
            dp = n // sp
            mesh = make_mesh_cp(dp=dp, sp=sp, devices=devices)
            fwd = make_cp_forward(cfg, mesh, compute_dtype="bfloat16")
            # CP replicates weights — but place them on the mesh BEFORE
            # timing, or every rep pays the host->device broadcast the
            # TP rows don't (apples-to-apples efficiency numbers)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())
            pR = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params)
            ids, mask = inputs(args.batch_per_device * dp)
            thr = throughput(fwd, pR, ids, mask)
            results.append({
                "devices": n, "dp": dp, "sp": sp,
                "sentences_per_s": round(thr, 1),
                "efficiency": round(thr / (n * base), 3)})
            print(json.dumps(results[-1]), flush=True)
    if args.out:
        import jax as _jax
        Path(args.out).write_text(json.dumps({
            "platform": _jax.default_backend(),
            "device": str(jax.devices()[0]),
            "n_devices": n, "dtype": args.dtype, "seq": args.seq,
            "batch_per_device": args.batch_per_device,
            "note": ("virtual CPU mesh results validate the compiled "
                     "collectives' correctness and relative program "
                     "structure, NOT ICI performance"
                     if _jax.default_backend() == "cpu" else
                     "real-chip measurement"),
            "results": results}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
