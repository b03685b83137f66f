#!/usr/bin/env python
"""MTEB harness driven through the live embedding server (the reference's
benchmarks/run_mteb_server.py equivalent: it spawns build/bin/server per
mode and talks the raw socket protocol, run_mteb_server.py:58-63).

For each mode, spawns `python -m embeddings_tpu.cli serve` as a subprocess,
waits for the TCP port, wraps a TcpClient as an MTEB model, runs the tasks,
and tears the server down. This exercises the full service path: socket
framing -> continuous batcher -> jitted forward -> response.

Usage:
  python benchmarks/run_mteb_server.py -m models/bge-base-en-v1.5 \
      [--modes q4_0 f32] [--tasks STSBenchmark] [--port 8087]
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = ["f32", "f16", "q4_0", "q4_1", "q8_0"]


def wait_for_port(port: int, host: str = "127.0.0.1",
                  timeout: float = 300.0, proc=None) -> None:
    """Poll until the server accepts connections (first jit compile is
    slow) — failing fast if the subprocess already died."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc is not None and proc.poll() is not None:
            raise RuntimeError(
                f"server subprocess exited with rc={proc.returncode} "
                f"before opening {host}:{port}")
        try:
            with socket.create_connection((host, port), timeout=1.0):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"server did not open {host}:{port} in {timeout}s")


class ServerBackedModel:
    """MTEB model protocol over the TCP wire protocol — the analogue of the
    reference's CppEmbeddingsServerModel (run_mteb_server.py:24-43)."""

    def __init__(self, port: int, host: str = "127.0.0.1"):
        from embeddings_tpu.runtime.client import TcpClient
        self.client = TcpClient(host, port, timeout=600.0)

    def encode(self, sentences, batch_size: int = 32, **kwargs):
        import numpy as np
        return np.stack([self.client.embed(s) for s in sentences])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--modes", nargs="+", default=MODES)
    ap.add_argument("--tasks", nargs="+", default=["STSBenchmark"])
    ap.add_argument("--port", type=int, default=8087)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="server-side batching straggler window")
    ap.add_argument("--out", default=str(Path(__file__).parent / "results"))
    args = ap.parse_args()

    try:
        import mteb
    except ImportError:
        print("mteb is not installed (offline environment?). Use "
              "benchmarks/dtype_parity.py for the offline quality gate.",
              file=sys.stderr)
        return 2

    mp = Path(args.model)
    # .name for dirs (stem would strip 'v1.5' to 'v1'); stem for files
    model_name = mp.name if mp.is_dir() else mp.stem
    for mode in args.modes:
        proc = subprocess.Popen(
            [sys.executable, "-m", "embeddings_tpu.cli", "serve",
             "-m", args.model, "--dtype", mode,
             "--host", "127.0.0.1", "--port", str(args.port),
             "--http-port", "-1",
             "--batch-size", str(args.batch),
             "--max-wait-ms", str(args.max_wait_ms)],
            cwd=Path(__file__).resolve().parent.parent)
        try:
            wait_for_port(args.port, proc=proc)
            model = ServerBackedModel(args.port)
            evaluation = mteb.MTEB(tasks=args.tasks, task_langs=["en"])
            out = Path(args.out) / f"{model_name}_{mode}-server"
            evaluation.run(model, output_folder=str(out),
                           eval_splits=["test"])
            model.client.close()
            print(f"[{mode}-server] results -> {out}")
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
    return 0


if __name__ == "__main__":
    sys.exit(main())
