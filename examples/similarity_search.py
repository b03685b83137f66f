#!/usr/bin/env python
"""Interactive cosine-similarity search over a text corpus.

The TPU-engine analogue of the reference's examples/sample_dylib.py:15-111,
which ctypes-loads libbert.so, encodes examples/sample_client_texts.txt,
and serves an interactive top-k similarity loop. Here the engine is either
in-process (default) or a remote server reached over the reference TCP
protocol (--server HOST:PORT), which covers examples/sample_client.py too.

Usage:
  python examples/similarity_search.py -m models/all-MiniLM-L6-v2 [--dtype q4_0]
  python examples/similarity_search.py --server 127.0.0.1:8080
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_CORPUS = Path(__file__).parent / "sample_texts.txt"


def load_corpus(path: str | Path) -> list[str]:
    lines = Path(path).read_text(encoding="utf-8").splitlines()
    return [ln.strip() for ln in lines if ln.strip()]


def build_index(encode, texts: list[str], batch_size: int = 32) -> np.ndarray:
    """Encode the corpus into an [N, E] matrix of unit vectors."""
    embs = encode(texts, batch_size)
    embs = np.asarray(embs, np.float32)
    # engine output is already L2-normalized; renormalize defensively so
    # the index works with any encode callable
    norms = np.linalg.norm(embs, axis=-1, keepdims=True)
    return embs / np.maximum(norms, 1e-12)

def search(index: np.ndarray, query_emb: np.ndarray, k: int = 3) -> list[tuple[int, float]]:
    """Top-k corpus rows by cosine similarity; [(row, score), ...]."""
    q = np.asarray(query_emb, np.float32).reshape(-1)
    q = q / max(np.linalg.norm(q), 1e-12)
    sims = index @ q
    top = np.argsort(-sims)[:k]
    return [(int(i), float(sims[i])) for i in top]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", help="HF dir / .npz / ggml .bin")
    ap.add_argument("--dtype", default="q4_0",
                    choices=["f32", "bf16", "f16", "q4_0", "q4_1", "q8_0"])
    ap.add_argument("--server", default=None, metavar="HOST:PORT",
                    help="use a running embeddings-tpu serve instance "
                         "instead of loading the model in-process")
    ap.add_argument("--corpus", default=str(DEFAULT_CORPUS))
    ap.add_argument("-k", type=int, default=3)
    ap.add_argument("--query", action="append", default=None,
                    help="run these queries and exit (non-interactive)")
    args = ap.parse_args()

    if args.server:
        from embeddings_tpu.runtime.client import TcpClient
        host, _, port = args.server.partition(":")
        client = TcpClient(host or "127.0.0.1", int(port or 8080))
        encode = lambda texts, bs: np.stack([client.embed(t) for t in texts])
    elif args.model:
        from embeddings_tpu.runtime.engine import load_model
        engine = load_model(args.model, dtype=args.dtype)
        encode = lambda texts, bs: engine.encode_batch(texts, batch_size=bs)
    else:
        ap.error("need -m MODEL or --server HOST:PORT")

    texts = load_corpus(args.corpus)
    t0 = time.time()
    index = build_index(encode, texts)
    print(f"indexed {len(texts)} texts in {time.time()-t0:.2f}s "
          f"(dim={index.shape[1]})")

    def run_query(q: str) -> None:
        emb = encode([q], 1)[0]
        for rank, (i, score) in enumerate(search(index, emb, args.k), 1):
            print(f"  {rank}. [{score:.4f}] {texts[i]}")

    if args.query:
        for q in args.query:
            if not q.strip():
                continue  # empty query: zero-byte TCP send would hang
            print(f"> {q}")
            run_query(q)
        return 0

    print("enter a query (empty line or Ctrl-D to quit):")
    try:
        while True:
            q = input("> ").strip()
            if not q:
                break
            run_query(q)
    except (EOFError, KeyboardInterrupt):
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
