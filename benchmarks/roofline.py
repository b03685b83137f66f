"""Roofline reproduction: measured TF/s of every fused dequant-matmul at
the headline bench shapes vs the chip's dense-bf16 MXU ceiling.

Backs the kernel-efficiency claims in docs/kernels.md with a committed,
re-runnable artifact (benchmarks/results/roofline.json). Method: the
slope-timing harness (utils/benchmarking.py) on (a) a plain XLA bf16
matmul per shape — the practical MXU ceiling for that shape on this
chip — and (b) the Pallas q4_0 kernel with its production epilogue.

Run on the TPU (default env): python benchmarks/roofline.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from embeddings_tpu.ops.linear import linear, linear_residual_ln, pallas_mode
from embeddings_tpu.ops.quant import (QuantizedTensor, pack_q4,
                                      quantize_q4_0)
from embeddings_tpu.utils.benchmarking import device_time_us

M = 128 * 256  # headline bench: B=128, L=256 tokens
# bge-base layer matmuls: (name, K, N, production op)
SHAPES = [
    ("qkv_proj", 768, 2304, "linear"),
    ("attn_out+res_ln", 768, 768, "residual_ln"),
    ("ffn_up+gelu", 768, 3072, "gelu"),
    ("ffn_down+res_ln", 3072, 768, "residual_ln"),
]
# loop counts large enough that the slope dwarfs relay RTT variance
# (per-iter times are 0.2-0.6 ms; 300 extra iters = 60-180 ms of slope)
LO, HI, REPS = 100, 400, 4


def measure(name, K, N, op):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = rng.standard_normal((K, N)).astype(np.float32)
    codes, scales = quantize_q4_0(w)
    qt = pack_q4(QuantizedTensor(jnp.asarray(codes), jnp.asarray(scales),
                                 None, "q4_0", -2))
    bias = jnp.asarray(rng.standard_normal(N), jnp.float32)
    wd = jnp.asarray(w, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    ones = jnp.ones((N,), jnp.float32)
    zeros = jnp.zeros((N,), jnp.float32)
    flops = 2 * M * N * K

    dense_us = device_time_us(
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16),
        (x, wd), lo=LO, hi=HI, reps=REPS)

    # the exact op the production forward dispatches (ops/linear.py)
    if op == "residual_ln":
        def body(x, r, b):
            with pallas_mode("always"):
                return linear_residual_ln(x, qt, b, r, ones, zeros, 1e-12)
        q_us = device_time_us(body, (x, res, bias), lo=LO, hi=HI, reps=REPS)
    else:
        act = "gelu" if op == "gelu" else None

        def body(x, b):
            with pallas_mode("always"):
                return linear(x, qt, b, act=act)
        q_us = device_time_us(body, (x, bias), lo=LO, hi=HI, reps=REPS)
    return {
        "matmul": name, "M": M, "K": K, "N": N, "op": op,
        "dense_bf16_tfs": round(flops / dense_us / 1e6, 1),
        "q4_packed_tfs": round(flops / q_us / 1e6, 1),
        "pct_of_dense": round(100 * dense_us / q_us, 1),
    }


def main() -> int:
    results = [measure(*s) for s in SHAPES]
    for r in results:
        print(json.dumps(r), flush=True)
    out = Path(__file__).parent / "results" / "roofline.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"chip": str(jax.devices()[0]), "tokens_per_dispatch": M,
         "note": "pct_of_dense = q4 fused kernel time vs plain XLA bf16 "
                 "matmul of the same shape (the practical MXU ceiling); "
                 "epilogues (bias/GELU/residual-LN) are INCLUDED in the "
                 "kernel time, so >100% of a shape's dense ceiling is "
                 "possible when the epilogue saves an HBM round trip",
         "results": results}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
