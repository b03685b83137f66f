#!/usr/bin/env python
"""MPNet relative-position-bias attention: fused kernel vs einsum path.

MPNet's shared rel-pos bias used to force attention onto the
additive-mask einsum path (scores in HBM). The fused_attention_bias
Pallas kernel takes the bias as a batch-independent [nQ, H, Lq, L]
operand computed once per forward, so MPNet rides the same
scores-stay-in-VMEM path as plain BERT. This measures the full
all-mpnet-base-v2 q4_0 forward both ways on the chip, plus the no-bias
forward as the floor.

Run on the TPU: python benchmarks/mpnet_bias_attention.py
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

    from embeddings_tpu.config import BertConfig, KNOWN_MODELS
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.ops import attention as attn_ops
    from embeddings_tpu.utils.benchmarking import device_time_us

    cfg = BertConfig(**{**KNOWN_MODELS["all-mpnet-base-v2"],
                        "vocab_size": 30528})
    params = P.quantize_params(P.init_params(cfg, rng=0), "q4_0")
    fused = P.fuse_qkv(params)
    assert "rel_bias" in fused
    rng = np.random.default_rng(0)

    runs = []
    for B, L in ((32, 256), (8, 512)):
        ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
        mask = np.ones((B, L), np.int32)
        mask[: B // 2, L - L // 8:] = 0
        maskj = jnp.asarray(mask)

        def fwd(x, m):
            return bert.encode_tokens(fused, cfg, x, m,
                                      compute_dtype="bfloat16")

        # einsum path: same forward with the bias kernel gated off
        orig_supported = attn_ops.bias_supported
        try:
            attn_ops.bias_supported = lambda *a: False
            t_einsum = device_time_us(fwd, (ids, maskj), lo=20, hi=80)
            a = np.asarray(jax.jit(fwd)(ids, maskj))
        finally:
            attn_ops.bias_supported = orig_supported

        t_fused = device_time_us(fwd, (ids, maskj), lo=20, hi=80)
        b = np.asarray(jax.jit(fwd)(ids, maskj))
        cos = float((a * b).sum(-1).min())

        nobias = {k: v for k, v in fused.items() if k != "rel_bias"}
        t_floor = device_time_us(
            lambda x, m: bert.encode_tokens(nobias, cfg, x, m,
                                            compute_dtype="bfloat16"),
            (ids, maskj), lo=20, hi=80)

        runs.append({
            "B": B, "L": L, "dtype": "q4_0",
            "einsum_bias_us": round(t_einsum, 1),
            "fused_bias_us": round(t_fused, 1),
            "speedup": round(t_einsum / t_fused, 3),
            "no_bias_floor_us": round(t_floor, 1),
            "bias_overhead_vs_floor": round(t_fused / t_floor, 3),
            "min_cos_fused_vs_einsum": round(cos, 6),
        })
        print(json.dumps(runs[-1]), flush=True)

    out = {"device": str(jax.devices()[0]),
           "model": "all-mpnet-base-v2 (random-init)", "runs": runs}
    Path(__file__).parent.joinpath(
        "results", "mpnet_bias_attention.json").write_text(
        json.dumps(out, indent=1))
    ok = all(r["min_cos_fused_vs_einsum"] > 0.999 and r["speedup"] > 1.0
             for r in runs)
    print("OK" if ok else "FAIL: fused bias path slower or numerics off")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
