#!/usr/bin/env python
"""On-chip cost of the fused attention kernel at the headline shape.

Times fused_attention (B=128, L=256, H=12, D=64 — the bge-base bench
config) and reports the gap to the MXU ideal (QK^T + PV at the dense
bf16 rate), so softmax-VPU work is read as a measured delta. Run on TPU:
python benchmarks/attention_cost.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from embeddings_tpu.ops.attention import fused_attention
    from embeddings_tpu.utils.benchmarking import device_time_us

    B, L, H, D = 128, 256, 12, 64
    E = H * D
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.3,
                      jnp.bfloat16)
    lengths = jnp.full((B,), L, jnp.int32)

    t = device_time_us(
        lambda q: fused_attention(q, lengths, B=B, L=L, H=H, D=D),
        (qkv,), lo=5, hi=25)
    t_emit = device_time_us(
        lambda q: fused_attention(q, lengths, B=B, L=L, H=H, D=D,
                                  emit_quantized="only")[0],
        (qkv,), lo=5, hi=25)
    t_i8 = device_time_us(
        lambda q: fused_attention(q, lengths, B=B, L=L, H=H, D=D,
                                  int8_scores=True),
        (qkv,), lo=5, hi=25)
    o_bf = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D),
                      np.float32)
    o_i8 = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                      int8_scores=True), np.float32)
    na = o_bf / np.maximum(
        np.linalg.norm(o_bf, axis=-1, keepdims=True), 1e-9)
    nb = o_i8 / np.maximum(
        np.linalg.norm(o_i8, axis=-1, keepdims=True), 1e-9)
    i8_cos = float((na * nb).sum(-1).min())
    # MXU ideal: QK^T (2*B*H*L*L*D) + PV at its PHYSICAL width (the v
    # tile is [L, 2D] = 128 lanes: ones-column denominator trick)
    ideal_us = ((2 * B * H * L * L * D + 2 * B * H * L * L * 2 * D)
                / 192.3e12 * 1e6)
    out = {"chip": str(jax.devices()[0]), "B": B, "L": L, "H": H, "D": D,
           "fused_us": round(t, 1), "fused_emit_only_us": round(t_emit, 1),
           "int8_scores_us": round(t_i8, 1),
           "int8_scores_speedup": round(t / t_i8, 3),
           "int8_scores_min_cos": round(i8_cos, 6),
           "mxu_ideal_us": round(ideal_us, 1),
           "pct_of_ideal": round(100 * ideal_us / t, 1),
           "per_layer_x12_us": round(12 * t, 1)}
    print(json.dumps(out))
    Path(__file__).parent.joinpath("results", "attention_cost.json") \
        .write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
