#!/usr/bin/env python
"""Per-link ablation of the chained-int8 activation path on REAL TPU.

Round 4 shipped all three chain links (attention emission, residual-LN
emit="both", FFN-up emit="only") as one unconditional default and
regressed the headline 4.1% end-to-end — each link's per-matmul win
did not compose (VERDICT r4 weak #2). This sweep measures the full
bge-base forward for EVERY link subset (ops.linear.chain_links), plus
the bf16 baseline, and prints the winner; ops/linear._CHAIN_LINKS
records it as the default. The empty subset () is exactly the round-3
in-kernel mode (consumers quantize bf16 rows per grid step).

Writes benchmarks/results/int8_chain_ablate.json. Run on the TPU
(default env): python benchmarks/int8_chain_ablate.py
Reference bar: BASELINE.md's q4_0 throughput (the ggml SIMD hot loop
at /root/reference/bert.cpp:994-1069 is what this mode replaces).
"""

from __future__ import annotations

import itertools
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
    from embeddings_tpu.ops.linear import chain_links, int8_mode
    from embeddings_tpu.utils.benchmarking import device_time_us

    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.fuse_qkv(P.pack_q4_params(
        P.quantize_params(P.init_params(cfg, rng=0), "q4_0")))
    B, L = 128, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    def make_step(i8, links):
        def step(ids_c, mask_c):
            with int8_mode(i8), chain_links(links):
                return bert.encode_tokens(params, cfg, ids_c, mask_c,
                                          compute_dtype="bfloat16")
        return step

    subsets = [tuple(sorted(s)) for n in range(4)
               for s in itertools.combinations(("attn", "ln", "ffn"), n)]
    out = {"model": "bge-base-en-v1.5 q4_0-packed", "B": B, "L": L,
           "chip": str(jax.devices()[0]), "runs": {}}
    bf16_us = device_time_us(make_step(False, ()), (ids, mask),
                             lo=20, hi=60, reps=3)
    out["runs"]["bf16"] = {"us_per_batch": round(bf16_us),
                           "sentences_per_s": round(B / (bf16_us * 1e-6), 1)}
    print(json.dumps({"bf16": out["runs"]["bf16"]}), flush=True)
    best = None
    for links in subsets:
        name = "int8[" + "+".join(links) + "]" if links else "int8[]"
        us = device_time_us(make_step(True, links), (ids, mask),
                            lo=20, hi=60, reps=3)
        r = {"links": list(links), "us_per_batch": round(us),
             "sentences_per_s": round(B / (us * 1e-6), 1),
             "speedup_vs_bf16": round(bf16_us / us, 3)}
        out["runs"][name] = r
        print(json.dumps({name: r}), flush=True)
        if best is None or us < best[1]:
            best = (links, us)
    out["winner"] = {"links": list(best[0]),
                     "us_per_batch": round(best[1]),
                     "sentences_per_s": round(B / (best[1] * 1e-6), 1)}
    dst = Path(__file__).parent / "results" / "int8_chain_ablate.json"
    dst.parent.mkdir(exist_ok=True)
    dst.write_text(json.dumps(out, indent=1))
    print(f"winner: {out['winner']}")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
