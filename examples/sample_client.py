#!/usr/bin/env python
"""Minimal TCP client for the embedding server — drop-in analogue of the
reference's examples/sample_client.py:1-69 (connect, read int32 n_embd,
then send raw utf-8 text / recv n_embd float32 per round trip).

Start a server first:
  python -m embeddings_tpu.cli serve -m models/all-MiniLM-L6-v2 --port 8080

Then:
  python examples/sample_client.py [--host 127.0.0.1] [--port 8080] "some text"
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from embeddings_tpu.runtime.client import TcpClient


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("texts", nargs="*", default=None)
    args = ap.parse_args()

    with TcpClient(args.host, args.port) as client:
        print(f"connected; n_embd = {client.n_embd}")
        texts = args.texts or [line.rstrip("\n") for line in sys.stdin]
        for text in texts:
            if not text:
                continue  # a zero-byte send would deadlock the protocol
            emb = client.embed(text)
            head = " ".join(f"{v:.5f}" for v in emb[:8])
            print(f"[{head} ...] <- {text!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
