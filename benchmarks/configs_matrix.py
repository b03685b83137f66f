#!/usr/bin/env python
"""Measure every configuration BASELINE.json names, on the real chip.

BASELINE.json's "configs" list pins five reference scenarios; this
harness runs each one end-to-end (random-init weights — the timing is
weight-value-independent) and writes one row per config to
benchmarks/results/configs_matrix.json:

1. all-MiniLM-L6-v2 f16, single-sentence encode (examples/main path)
2. all-MiniLM-L6-v2 q4_0, batch encode (test_batch_encode path)
3. bge-base-en-v1.5 q4_0, mean pooling + L2 norm (STS-style corpus)
4. bge-small-zh-v1.5 multilingual (CJK) tokenize + q4_0 batch
5. bge-large-en-v1.5 q4_0, continuous-batched serving (single chip;
   multi-host slices are not available in this environment)

Run on the TPU: python benchmarks/configs_matrix.py
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def build_engine(arch: str, dtype: str, packed: bool = True,
                 batch_size: int = 32):
    from embeddings_tpu.config import BertConfig, EngineConfig, KNOWN_MODELS
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    big_vocab = (Path(__file__).resolve().parent.parent
                 / "tests" / "fixtures" / "big_vocab" / "vocab.txt")
    vocab_tokens = big_vocab.read_text(encoding="utf-8").splitlines()
    cfg = BertConfig(**{**KNOWN_MODELS[arch],
                        "vocab_size": len(vocab_tokens)})
    params = P.init_params(cfg, rng=0)
    if dtype != "f32":
        params = P.quantize_params(params, dtype)
    if dtype.startswith("q4") and packed:
        params = P.pack_q4_params(params)
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(vocab_tokens))
    return Engine(params, cfg, tok, EngineConfig(batch_size=batch_size))


def corpus_en(n: int) -> list[str]:
    from dtype_parity import default_corpus
    return default_corpus(n)


def corpus_zh(n: int) -> list[str]:
    base = ["这个模型的效果非常好", "我们在北京测试了新系统",
            "量子计算机的发展速度令人惊讶", "请把这份报告翻译成英文",
            "深度学习改变了自然语言处理", "多语言嵌入模型支持中文检索",
            "今天的天气适合在公园散步", "他们的团队赢得了比赛"]
    return [base[i % len(base)] + "。" * (i % 3) for i in range(n)]


def wall(fn, warmup=1, reps=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def main() -> int:
    results = []

    # 1. MiniLM-L6 f16 single-sentence (bert_encode, examples/main)
    eng = build_engine("all-MiniLM-L6-v2", "f16")
    text = "the quick brown fox jumps over the lazy dog"
    dt, emb = wall(lambda: eng.encode(text), warmup=2, reps=10)
    results.append({
        "config": "all-MiniLM-L6-v2 f16 single-sentence encode",
        "latency_ms": round(dt * 1e3, 2),
        "norm_ok": bool(abs(np.linalg.norm(emb) - 1.0) < 1e-3),
        "note": "warm wall time incl. tokenize + relay dispatch"})
    print(json.dumps(results[-1]), flush=True)

    # 2. MiniLM-L6 q4_0 batch encode
    eng = build_engine("all-MiniLM-L6-v2", "q4_0", batch_size=64)
    texts = corpus_en(256)
    dt, embs = wall(lambda: eng.encode_batch(texts, 64))
    results.append({
        "config": "all-MiniLM-L6-v2 q4_0 batch encode (256 texts)",
        "wall_s": round(dt, 3),
        "sentences_per_s": round(len(texts) / dt, 1)})
    print(json.dumps(results[-1]), flush=True)

    # 3. bge-base q4_0 mean pooling + L2 norm, STS-style corpus
    eng = build_engine("bge-base-en-v1.5", "q4_0", batch_size=128)
    texts = corpus_en(512)
    dt, embs = wall(lambda: eng.encode_batch(texts, 128))
    norms = np.linalg.norm(embs, axis=-1)
    results.append({
        "config": "bge-base-en-v1.5 q4_0 mean pool + L2 (512 texts)",
        "wall_s": round(dt, 3),
        "sentences_per_s": round(len(texts) / dt, 1),
        "l2_normalized": bool(np.allclose(norms, 1.0, atol=1e-3))})
    print(json.dumps(results[-1]), flush=True)

    # 4. bge-small-zh multilingual tokenizer + q4_0 batch
    eng = build_engine("bge-small-zh-v1.5", "q4_0", batch_size=64)
    texts = corpus_zh(256)
    toks = eng.tokenize(texts[0])
    dt, embs = wall(lambda: eng.encode_batch(texts, 64))
    results.append({
        "config": "bge-small-zh-v1.5 CJK tokenize + q4_0 batch (256)",
        "wall_s": round(dt, 3),
        "sentences_per_s": round(len(texts) / dt, 1),
        "cjk_tokenized": bool(len(toks) > 4),  # per-char CJK split
    })
    print(json.dumps(results[-1]), flush=True)

    # 5. bge-large q4_0 continuous-batched serving (single chip)
    from embeddings_tpu.runtime.server import BatchingService
    eng = build_engine("bge-large-en-v1.5", "q4_0", batch_size=32)
    texts = corpus_en(128)

    async def serve_load():
        svc = BatchingService(eng, max_batch=32, max_wait_ms=2.0)
        await svc.start()
        await svc.embed_many(texts[:8])  # warm compile
        t0 = time.perf_counter()
        await svc.embed_many(texts)
        dt = time.perf_counter() - t0
        stats = svc.stats.as_dict()
        await svc.stop()
        return dt, stats

    dt, stats = asyncio.run(serve_load())
    results.append({
        "config": "bge-large-en-v1.5 q4_0 continuous-batched serving "
                  "(128 concurrent, single chip)",
        "wall_s": round(dt, 3),
        "requests_per_s": round(len(texts) / dt, 1),
        "avg_batch": round(stats["avg_batch"], 1),
        "p50_ms": round(stats["latency_ms"]["p50"], 1),
        "note": "multi-host slice unavailable in this environment; "
                "see scaling_virtual8.json for the sharded programs"})
    print(json.dumps(results[-1]), flush=True)

    import jax
    out = {"device": str(jax.devices()[0]),
           "weights": "random-init (timing is weight-value-independent)",
           "rows": results}
    path = Path(__file__).parent / "results" / "configs_matrix.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
