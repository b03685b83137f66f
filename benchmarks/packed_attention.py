"""Device-time comparison: bucketed batching vs token-packed rows at
several row lengths (the block-skipping segmented attention benchmark).

Round-1 state: packed rows were pinned to 128 tokens because the
segmented kernel computed the full [L, L] score tile (cross-segment waste
grows as O(L^2)). The block-skipping kernel (ops/attention.py,
fused_attention_segmented_blockskip) visits only key blocks sharing a
segment with the query block, so longer rows (fewer dispatches, bigger
matmuls) should win. This script measures pure device time per corpus
(slope method, relay overhead cancelled) for the same synthetic
STSB-length corpus under every strategy and writes JSON.

Run on the TPU (default env):  python benchmarks/packed_attention.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from embeddings_tpu.config import BertConfig, KNOWN_MODELS
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.ops.linear import pallas_mode
from embeddings_tpu.runtime.batching import plan_batches
from embeddings_tpu.runtime.packing import (materialize, max_block_span,
                                            plan_packing)
from embeddings_tpu.utils.benchmarking import device_time_us

N_SENT = 2758          # STSB test-split sentence count (the ref's corpus)
TOKENS_PER_DISPATCH = 32768


def corpus_lengths(rng) -> np.ndarray:
    # STSB-like short sentences: ~10-60 tokens, mean ~36
    return np.clip(rng.lognormal(3.5, 0.35, N_SENT), 6, 120).astype(int)


def flagship_params():
    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.fuse_qkv(P.pack_q4_params(
        P.quantize_params(P.init_params(cfg, rng=0), "q4_0")))
    return cfg, params


def bench_packed(cfg, params, toks, row_len: int) -> dict:
    batch_rows = max(128, TOKENS_PER_DISPATCH // row_len)
    batches = plan_packing([len(t) for t in toks], row_len, batch_rows,
                           max_segs=max(2, row_len // 8))

    def fwd(ids, p, seg, pos, pool, w):
        with pallas_mode("always"):
            return bert.encode_packed(p, cfg, ids, seg, pos, pool,
                                      compute_dtype="bfloat16",
                                      attn_window=w)

    total_us = 0.0
    shapes = {}
    windows = set()
    for b in batches:
        b.batch = batch_rows  # one stable shape family
        ids, seg, pos, pool, _ = materialize(b, toks, 0, "mean")
        w = max_block_span(seg) if row_len > 128 else 0
        windows.add(w)
        # the window is a static kernel parameter, so it must be part of
        # the timing-cache key (a partially-filled last batch can span
        # fewer key blocks than the full ones)
        key = (b.batch, b.seq, b.n_seg, w)
        if key not in shapes:
            args = tuple(jnp.asarray(x) for x in (ids, seg, pos, pool))
            shapes[key] = device_time_us(
                lambda ids, p, *rest: fwd(ids, p, *rest, w),
                (args[0], params) + args[1:], lo=10, hi=40)
        total_us += shapes[key]
    return {"strategy": f"packed{row_len}", "dispatches": len(batches),
            "tokens": int(sum(b.batch * b.seq for b in batches)),
            "attn_window": sorted(windows),
            "device_ms": total_us / 1e3}


def bench_bucketed(cfg, params, toks, batch_size: int = 128) -> dict:
    plans = plan_batches([len(t) for t in toks], batch_size,
                         (32, 64, 128, 256, 512),
                         (batch_size,))

    def fwd(ids, p, mask):
        with pallas_mode("always"):
            return bert.encode_tokens(p, cfg, ids, mask,
                                      compute_dtype="bfloat16")

    total_us = 0.0
    shapes = {}
    counts = {}
    for plan in plans:
        key = (plan.batch, plan.seq)
        counts[key] = counts.get(key, 0) + 1
    for (B, L), n in counts.items():
        ids = jnp.zeros((B, L), jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        us = device_time_us(lambda ids, p, m: fwd(ids, p, m),
                            (ids, params, mask), lo=10, hi=40)
        total_us += us * n
    return {"strategy": f"bucketed_b{batch_size}", "dispatches": len(plans),
            "tokens": int(sum(p.batch * p.seq for p in plans)),
            "device_ms": total_us / 1e3}


def main() -> int:
    rng = np.random.default_rng(0)
    lengths = corpus_lengths(rng)
    cfg, params = flagship_params()
    toks = [list(rng.integers(1000, 30000, size=int(n))) for n in lengths]
    print(f"corpus: {N_SENT} sentences, {int(lengths.sum())} tokens, "
          f"mean len {lengths.mean():.1f}", flush=True)
    results = [bench_bucketed(cfg, params, toks)]
    print(json.dumps(results[-1]), flush=True)
    for row_len in (128, 256, 384, 512):
        results.append(bench_packed(cfg, params, toks, row_len))
        print(json.dumps(results[-1]), flush=True)
    base = results[0]["device_ms"]
    for r in results:
        r["vs_bucketed"] = round(base / r["device_ms"], 3)
    out = Path(__file__).parent / "results" / "packed_attention.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"corpus_sentences": N_SENT, "corpus_tokens": int(lengths.sum()),
         "model": "bge-base q4_0 packed", "results": results}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
