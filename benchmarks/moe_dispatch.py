#!/usr/bin/env python
"""MoE dispatch on-chip: dense-expert evaluation vs ragged_dot grouped
matmuls, at the nomic-embed-text-v2-moe production shape.

Dense evaluation runs every expert on every token (E/k = 4x the
selected FLOPs but zero gather/sort overhead); the ragged path computes
only the routed (token, expert) pairs via lax.ragged_dot. This harness
measures both on the real TPU and records which one config.moe_dispatch
="auto" should pick.

Run on the TPU: python benchmarks/moe_dispatch.py
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
    import jax.numpy as jnp
    from embeddings_tpu.ops.moe import moe_ffn, moe_ffn_ragged
    from embeddings_tpu.utils.benchmarking import device_time_us

    # nomic-v2-moe shape: 768 hidden, 3072 ffn, 8 experts, top-2;
    # T = one serving batch worth of tokens (B=32, L=256)
    D, I, Ex, K = 768, 3072, 8, 2
    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.05, jnp.bfloat16)

    moe = {"router": {"w": jnp.asarray(
               rng.standard_normal((D, Ex)).astype(np.float32) * 0.05)},
           "up": {"w": w(Ex, D, I), "b": w(Ex, I)},
           "down": {"w": w(Ex, I, D), "b": w(Ex, D)},
           "bias": w(D)}

    results = {"device": str(jax.devices()[0]), "shape":
               {"D": D, "I": I, "experts": Ex, "top_k": K},
               "points": []}
    pick_ragged = 0
    for T in (2048, 8192, 32768):
        x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32),
                        jnp.bfloat16)
        t_dense = device_time_us(
            lambda xx: moe_ffn(xx, moe, top_k=K, act="gelu"), (x,),
            lo=10, hi=40)
        t_ragged = device_time_us(
            lambda xx: moe_ffn_ragged(xx, moe, top_k=K, act="gelu"), (x,),
            lo=10, hi=40)
        a = np.asarray(jax.jit(
            lambda xx: moe_ffn(xx, moe, top_k=K, act="gelu"))(x),
            np.float32)
        b = np.asarray(jax.jit(
            lambda xx: moe_ffn_ragged(xx, moe, top_k=K, act="gelu"))(x),
            np.float32)
        na = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True),
                            1e-9)
        nb = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True),
                            1e-9)
        cos = float((na * nb).sum(-1).min())
        # MXU utilization proxy: routed matmul FLOPs / device time
        flops_routed = 2 * 2 * T * K * D * I  # up+down, selected pairs
        results["points"].append({
            "tokens": T,
            "dense_eval_us": round(t_dense, 1),
            "ragged_us": round(t_ragged, 1),
            "speedup_ragged_vs_dense": round(t_dense / t_ragged, 3),
            "ragged_routed_tflops": round(
                flops_routed / (t_ragged * 1e-6) / 1e12, 2),
            "min_cos": round(cos, 6),
        })
        if t_ragged < t_dense:
            pick_ragged += 1
        print(json.dumps(results["points"][-1]))

    results["auto_should_pick"] = ("ragged" if pick_ragged
                                   >= len(results["points"]) / 2
                                   else "dense")
    Path(__file__).parent.joinpath("results", "moe_dispatch.json") \
        .write_text(json.dumps(results, indent=1))
    print(json.dumps({"auto_should_pick": results["auto_should_pick"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
