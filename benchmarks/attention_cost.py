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
    # MXU ideal: QK^T (2*B*H*L*L*D) + PV at its PHYSICAL width (the v
    # tile is [L, 2D] = 128 lanes: ones-column denominator trick)
    ideal_us = ((2 * B * H * L * L * D + 2 * B * H * L * L * 2 * D)
                / 192.3e12 * 1e6)
    out = {"chip": str(jax.devices()[0]), "B": B, "L": L, "H": H, "D": D,
           "fused_us": round(t, 1), "fused_emit_only_us": round(t_emit, 1),
           "mxu_ideal_us": round(ideal_us, 1),
           "pct_of_ideal": round(100 * ideal_us / t, 1),
           "per_layer_x12_us": round(12 * t, 1)}
    print(json.dumps(out))
    Path(__file__).parent.joinpath("results", "attention_cost.json") \
        .write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
