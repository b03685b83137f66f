#!/usr/bin/env python
"""int8-MXU compute mode: end-to-end device time, bf16 vs in-kernel int8
vs chained int8 (pre-quantized activations + in-kernel int8 emission).

VERDICT r3 task #2: the int8 mode bought 1.21-1.46x where the MXU rate
says 2x, one visible inefficiency being per-N-tile activation
requantization. The chained mode removes that cost structurally: each
matmul EMITS its output pre-quantized per-row (ops/qmatmul.py _emit),
so the next matmul consumes int8 x directly — activations quantize
once per tensor, inside the kernel that already holds the f32 rows.

Writes benchmarks/results/int8_chain.json. Run on the TPU (default env).
Reference bar: BASELINE.md's q4_0 throughput (bert.cpp:994-1069 is the
hot loop whose SIMD dequant-matmul this mode replaces on the MXU).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main() -> int:
    from embeddings_tpu.config import BertConfig, KNOWN_MODELS
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.ops.linear import int8_mode
    from embeddings_tpu.utils.benchmarking import device_time_us

    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.fuse_qkv(P.pack_q4_params(
        P.quantize_params(P.init_params(cfg, rng=0), "q4_0")))
    B, L = 128, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    def make_step(i8, chain=True):
        def step(ids_c, mask):
            with int8_mode(i8):
                if not chain:
                    # disable the emission chain to isolate its gain
                    orig = bert._int8_chain_ok
                    bert._int8_chain_ok = lambda *a: False
                    try:
                        return bert.encode_tokens(
                            params, cfg, ids_c, mask,
                            compute_dtype="bfloat16")
                    finally:
                        bert._int8_chain_ok = orig
                return bert.encode_tokens(params, cfg, ids_c, mask,
                                          compute_dtype="bfloat16")
        return step

    out = {"model": "bge-base-en-v1.5 q4_0-packed", "B": B, "L": L,
           "chip": str(jax.devices()[0]), "modes": {}}
    for name, i8, chain in (("bf16", False, True),
                            ("int8_inkernel", True, False),
                            ("int8_chained", True, True)):
        us = device_time_us(make_step(i8, chain), (ids, mask),
                            lo=20, hi=60, reps=3)
        out["modes"][name] = {"us_per_batch": round(us),
                              "sentences_per_s": round(B / (us * 1e-6), 1)}
        print(json.dumps({name: out["modes"][name]}), flush=True)
    bf = out["modes"]["bf16"]["us_per_batch"]
    for k in ("int8_inkernel", "int8_chained"):
        out["modes"][k]["speedup_vs_bf16"] = round(
            bf / out["modes"][k]["us_per_batch"], 3)
    path = Path(__file__).parent / "results" / "int8_chain.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
