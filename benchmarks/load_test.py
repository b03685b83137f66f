"""Concurrent-client serving load test: p50/p99 latency + throughput.

Starts the HTTP embedding server (runtime/server.py: continuous batching
over one Engine) in-process, then hammers it with N concurrent clients
sending mixed-length texts, and writes the latency/throughput profile to
benchmarks/results/load_test.json. The reference has no analogue — its
server is a blocking single-client loop (examples/server.cpp:100-118) —
so these are greenfield numbers for the serving layer (VERDICT round-1
item 8).

Run on the TPU (default env):   python benchmarks/load_test.py
Quick CPU sanity:               EMBEDDINGS_TPU_PLATFORM=cpu \
                                python benchmarks/load_test.py --tiny
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CLIENTS = 32
REQUESTS_PER_CLIENT = 40

WORDS = ("the quick brown fox jumps over lazy dog a an is was were model "
         "embedding sentence vector search retrieval quantized inference "
         "server latency throughput benchmark 你好 世界 中文 模型").split()


def make_texts(rng, n):
    texts = []
    for _ in range(n):
        k = int(np.clip(rng.lognormal(2.6, 0.6), 2, 80))
        texts.append(" ".join(rng.choice(WORDS, size=k)))
    return texts


def build_engine(tiny: bool, int8: bool = False):
    from embeddings_tpu.config import BertConfig, EngineConfig, KNOWN_MODELS
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
             + [chr(c) for c in range(ord("a"), ord("z") + 1)])
    seen = set()
    vocab = [t for t in vocab if not (t in seen or seen.add(t))]
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(vocab))
    if tiny:
        cfg = BertConfig(vocab_size=len(vocab), hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128, max_position_embeddings=128)
        params = P.init_params(cfg, rng=0)
    else:
        cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                            "vocab_size": len(vocab)})
        params = P.pack_q4_params(P.quantize_params(
            P.init_params(cfg, rng=0), "q4_0"))
    ec = EngineConfig(seq_buckets=(16, 32, 64, 128), max_seq_len=128,
                      batch_size=64, batch_buckets=(1, 2, 4, 8, 16, 32, 64),
                      int8_compute=int8)
    return Engine(params, cfg, tok, ec)


async def run_load(engine, *, n_clients: int, per_client: int,
                   max_wait_ms: float, packed: bool = False) -> dict:
    from embeddings_tpu.runtime.server import BatchingService, serve_http
    service = BatchingService(engine, max_batch=64, max_wait_ms=max_wait_ms,
                              packed=packed)
    runner, service = await serve_http(service, host="127.0.0.1", port=0)
    port = runner.addresses[0][1]
    url = f"http://127.0.0.1:{port}/embed"
    oai_url = f"http://127.0.0.1:{port}/v1/embeddings"
    import aiohttp

    rng = np.random.default_rng(0)
    texts = make_texts(rng, n_clients * per_client)
    lat: list[float] = []
    errors = 0

    async def client(i: int):
        nonlocal errors
        async with aiohttp.ClientSession() as sess:
            for r in range(per_client):
                t = texts[i * per_client + r]
                t0 = time.perf_counter()
                try:
                    if r % 4 == 3:
                        # every 4th request rides the OpenAI wire format
                        # so the production path is part of the profile
                        async with sess.post(oai_url, json={
                                "input": t, "model": "default"}) as resp:
                            body = await resp.json()
                            assert resp.status == 200, body
                            assert len(body["data"]) == 1
                    else:
                        async with sess.post(url,
                                             json={"texts": [t]}) as resp:
                            body = await resp.json()
                            assert resp.status == 200, body
                            assert len(body["embeddings"]) == 1
                except Exception:
                    errors += 1
                    continue
                lat.append(time.perf_counter() - t0)

    # warmup: compile every bucket before timing
    async with aiohttp.ClientSession() as sess:
        for t in ("warm " * 4, "warm " * 24, "warm " * 60, "w"):
            async with sess.post(url, json={"texts": [t]}) as resp:
                await resp.json()

    t0 = time.perf_counter()
    await asyncio.gather(*(client(i) for i in range(n_clients)))
    wall = time.perf_counter() - t0
    await runner.cleanup()
    await service.stop()

    xs = np.sort(np.asarray(lat)) * 1e3
    if len(xs) == 0:
        # all requests failed: still report the run (errors tell the story)
        pct = lambda p: float("nan")
        xs = np.asarray([float("nan")])
    else:
        pct = lambda p: float(
            xs[min(len(xs) - 1,
                   max(0, int(np.ceil(p / 100 * len(xs))) - 1))])
    return {
        "clients": n_clients, "requests": len(lat), "errors": errors,
        "max_wait_ms": max_wait_ms, "packed": packed,
        "wall_s": round(wall, 3),
        "throughput_rps": round(len(lat) / wall, 1),
        "latency_ms": {"p50": round(pct(50), 2), "p90": round(pct(90), 2),
                       "p99": round(pct(99), 2),
                       "mean": round(float(xs.mean()), 2)},
        "server_stats": service.stats.as_dict(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU sanity run)")
    ap.add_argument("--clients", type=int, default=N_CLIENTS)
    ap.add_argument("--per-client", type=int, default=REQUESTS_PER_CLIENT)
    ap.add_argument("--int8", action="store_true",
                    help="int8-MXU compute (the headline serving config)")
    args = ap.parse_args()
    engine = build_engine(args.tiny, int8=args.int8)
    t0 = time.perf_counter()
    n = engine.warmup()  # precompile the full (batch, seq) bucket grid
    n += engine.warmup_packed()  # and the token-packed program family
    print(f"warmup: {n} programs in {time.perf_counter() - t0:.1f}s",
          flush=True)
    results = []
    for max_wait_ms, packed in ((2.0, False), (10.0, False), (2.0, True)):
        r = asyncio.run(run_load(engine, n_clients=args.clients,
                                 per_client=args.per_client,
                                 max_wait_ms=max_wait_ms, packed=packed))
        print(json.dumps(r), flush=True)
        results.append(r)
    out = Path(__file__).parent / "results" / "load_test.json"
    out.parent.mkdir(exist_ok=True)
    import jax
    out.write_text(json.dumps({
        "model": "tiny (cpu sanity)" if args.tiny else
                 ("bge-base q4_0 packed storage (random-init weights)"
                  + (" + int8-MXU compute" if args.int8 else "")),
        "int8_compute": args.int8,
        "mix": "3/4 POST /embed + 1/4 POST /v1/embeddings",
        "backend": jax.default_backend(),
        "note": ("served through the axon dev relay; relay RTT "
                 "(~10-30ms per dispatch) is included in latencies — "
                 "co-located serving will be strictly faster"
                 if jax.default_backend() != "cpu"
                 else "local CPU backend (sanity run; no relay)"),
        "runs": results}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
