#!/usr/bin/env python
"""MTEB STSBenchmark harness (the reference's benchmarks/run_mteb.py
equivalent, adapted to the TPU engine).

For each mode in MODES, wraps the Engine as an MTEB model and runs the
chosen tasks; results land in benchmarks/results/{model}_{mode}/ exactly
like the reference layout so print_tables.py works on both.

Requires `pip install mteb` and a real checkpoint — in an offline
environment use benchmarks/dtype_parity.py for the quantization-quality
gate instead.

Usage:
  python benchmarks/run_mteb.py -m models/bge-base-en-v1.5 \
      [--modes q4_0 f16 f32 sbert] [--tasks STSBenchmark] [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = ["f32", "f16", "q4_0", "q4_0-batchless", "q4_0-packed", "q4_1",
         "q8_0", "q4_0-int8", "nf4"]


class EmbeddingsTpuModel:
    """MTEB model protocol: encode(list[str], batch_size) -> ndarray.
    Mirrors the reference's EmbeddingsCppModel (run_mteb.py:34-83).
    packed=True uses token-level packing (several sentences per row)."""

    def __init__(self, model_path: str, dtype: str, batch_size: int = 32,
                 batchless: bool = False, packed: bool = False,
                 int8_compute: bool = False):
        from embeddings_tpu.runtime.engine import load_model
        # int8 via the kwarg (same mode grammar as run_stsb_local.py):
        # keeps the model-aware max_seq_len, unlike a bare EngineConfig
        self.engine = load_model(model_path, dtype=dtype,
                                 int8_compute=int8_compute)
        self.batch_size = 1 if batchless else batch_size
        self.packed = packed

    def encode(self, sentences, batch_size: int = 32, **kwargs):
        if self.packed:
            return self.engine.encode_batch_packed(list(sentences))
        return self.engine.encode_batch(
            list(sentences), batch_size=self.batch_size)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--modes", nargs="+", default=MODES)
    ap.add_argument("--tasks", nargs="+", default=["STSBenchmark"])
    ap.add_argument("--batch", type=int, default=32)
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
        if mode.startswith("sbert"):
            from sentence_transformers import SentenceTransformer
            model = SentenceTransformer(args.model)
            if mode.endswith("batchless"):
                enc = model.encode
                model.encode = lambda s, **kw: enc(s, batch_size=1)
        else:
            dtype = (mode.replace("-batchless", "").replace("-packed", "")
                     .replace("-int8", ""))
            model = EmbeddingsTpuModel(args.model, dtype, args.batch,
                                       batchless=mode.endswith("batchless"),
                                       packed=mode.endswith("packed"),
                                       int8_compute=mode.endswith("int8"))
        evaluation = mteb.MTEB(tasks=args.tasks, task_langs=["en"])
        out = Path(args.out) / f"{model_name}_{mode}"
        evaluation.run(model, output_folder=str(out),
                       eval_splits=["test"])
        print(f"[{mode}] results -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
