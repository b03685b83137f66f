#!/usr/bin/env python
"""CP-path device time vs the single-device fused path (VERDICT r2 #4).

Context parallelism can only be *measured* at sp>1 on a multi-chip
slice, but its kernel path is exercised at sp=1 on one chip: the CP
forward (shard_map over a ("data","seq") mesh, all-gather + the
local-query/global-KV fused kernel) must cost within ~15% of the plain
single-device fused forward at L=512 — proving the fused CP kernel
carries the attention, not the einsum fallback that materialized
[B, H, Lc, L] in HBM.

Run on the TPU: python benchmarks/cp_device_time.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> int:
    import jax
    from embeddings_tpu.config import BertConfig, KNOWN_MODELS
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.parallel.context import (make_cp_forward,
                                                 make_mesh_cp)
    from embeddings_tpu.utils.benchmarking import device_time_us

    B, L = 32, 512
    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.quantize_params(P.init_params(cfg, rng=0), "q4_0")
    fused = P.fuse_qkv(params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[: B // 2, L - 32:] = 0   # some real padding

    import jax.numpy as jnp
    idsj, maskj = jnp.asarray(ids), jnp.asarray(mask)

    def single(x, m):
        return bert.encode_tokens(fused, cfg, x, m,
                                  compute_dtype="bfloat16")

    mesh = make_mesh_cp(dp=1, sp=1, devices=jax.devices()[:1])
    cp_fwd = make_cp_forward(cfg, mesh, compute_dtype="bfloat16")

    t_single = device_time_us(single, (idsj, maskj), lo=20, hi=80)
    t_cp = device_time_us(lambda x, m: cp_fwd(params, x, m),
                          (idsj, maskj), lo=20, hi=80)
    # numerics agree (same math, CP adds identity collectives at sp=1)
    a = np.asarray(jax.jit(single)(idsj, maskj))
    b = np.asarray(cp_fwd(params, idsj, maskj))
    cos = float((a * b).sum(-1).min())

    out = {
        "device": str(jax.devices()[0]), "B": B, "L": L, "dtype": "q4_0",
        "single_device_us": round(t_single, 1),
        "cp_sp1_us": round(t_cp, 1),
        "ratio": round(t_cp / t_single, 3),
        "min_cos_vs_single": round(cos, 6),
        "note": "sp=1 on one chip: exercises the fused CP kernel path "
                "(all-gather is identity); sp>1 needs a multi-chip slice",
    }
    print(json.dumps(out, indent=1))
    Path(__file__).parent.joinpath("results", "cp_device_time.json") \
        .write_text(json.dumps(out, indent=1))
    ok = out["ratio"] <= 1.15 and cos > 0.999
    print("OK" if ok else "FAIL: CP overhead above 15% or numerics off")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
