#!/usr/bin/env python
"""STSBenchmark evaluation from a LOCAL data file — no `mteb` package, no
network, no HF datasets.

The reference's acceptance gate is the MTEB STSBenchmark cosine
Spearman/Pearson per dtype (BASELINE.md). MTEB itself just scores
cos-sim(encode(s1), encode(s2)) against the human ratings, which scipy
does directly — so the moment a checkpoint and the standard STS-B file
exist locally, this script produces the full dtype table and writes
result JSONs in the reference's layout (results/{model}_{mode}/
STSBenchmark.json, the fields print_tables.py reads). Accepted data
formats:

- the original STS-benchmark distribution `sts-test.tsv` / `sts-dev.tsv`
  (tab-separated: genre, file, year, id, score, sentence1, sentence2);
- a simple 3-column TSV: score<TAB>sentence1<TAB>sentence2;
- a JSONL with {"score": float, "sentence1": str, "sentence2": str}.

Usage:
  python benchmarks/run_stsb_local.py -m models/bge-base-en-v1.5 \
      --data sts-test.tsv [--modes f32 f16 q4_0 q4_1 q8_0] [--batch 32]

Gate (the reference achieves ΔSpearman(q4_0, f16) = 0.0009; budget is
<= 0.003 absolute = 0.3 points): the script prints the deltas and exits
non-zero if any quantized mode exceeds the budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    # the image's sitecustomize imports jax at startup pinned to the TPU;
    # honor an explicit platform request (e.g. CPU runs in CI)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

MODES = ["f32", "f16", "q4_0", "q4_0-batchless", "q4_0-packed", "q4_1",
         "q8_0", "q4_0-int8", "nf4"]
BUDGET = 0.003  # 0.3 points, BASELINE.md


def infer_model_name(model_path: str) -> str:
    """Result-dir prefix for a checkpoint: the HF config's _name_or_path
    when present (a checkpoint dir is often literally named 'model'),
    else the dir/file name. .stem would truncate dotted names
    ('bge-base-en-v1.5' -> 'v1'), so only file extensions are stripped."""
    mp = Path(model_path)
    if mp.is_dir() and (mp / "config.json").exists():
        name = json.loads((mp / "config.json").read_text()).get(
            "_name_or_path", "")
        # HF ids are usually 'org/name' — keep the final segment; reject
        # filesystem-path-looking values ('.', '..', absolute, empty)
        name = str(name).rstrip("/").rsplit("/", 1)[-1]
        if name and name not in (".", "..") and not str(
                name).startswith("."):
            return name
    return mp.stem if mp.suffix in (".npz", ".bin", ".gguf") else mp.name


def load_pairs(path: Path) -> tuple[list[str], list[str], np.ndarray]:
    s1, s2, gold = [], [], []
    if path.suffix == ".jsonl":
        for line in path.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            d = json.loads(line)
            s1.append(d["sentence1"])
            s2.append(d["sentence2"])
            gold.append(float(d["score"]))
    else:
        for line in path.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            cols = line.split("\t")
            if len(cols) >= 7:      # original sts-benchmark layout
                gold.append(float(cols[4]))
                s1.append(cols[5])
                s2.append(cols[6])
            elif len(cols) == 3:    # score \t s1 \t s2
                gold.append(float(cols[0]))
                s1.append(cols[1])
                s2.append(cols[2])
            else:
                raise ValueError(f"unrecognized row: {line[:80]!r}")
    return s1, s2, np.asarray(gold, np.float64)


def evaluate_mode(model_path: str, mode: str, s1, s2, gold,
                  batch: int, server_url: str | None = None) -> dict:
    from scipy import stats
    if server_url:
        # drive a live server instead (the reference's run_mteb_server.py
        # flow); the server's engine defines the dtype — mode is a label
        from embeddings_tpu.runtime.client import HttpClient
        client = HttpClient(server_url, timeout=600)
        t0 = time.time()
        a = np.concatenate([client.embed(s1[i:i + batch])
                            for i in range(0, len(s1), batch)])
        b = np.concatenate([client.embed(s2[i:i + batch])
                            for i in range(0, len(s2), batch)])
        return _score(a, b, gold, time.time() - t0)
    from embeddings_tpu.runtime.engine import load_model
    dtype = mode.split("-")[0]
    # int8 MXU compute on top of the weight dtype; the kwarg (NOT a bare
    # EngineConfig) keeps the model-aware max_seq_len — a bare config
    # silently truncated long documents to the 512 default and
    # misattributed the quality loss to int8 arithmetic
    engine = load_model(model_path, dtype=dtype,
                        int8_compute=mode.endswith("-int8"))
    t0 = time.time()
    if mode.endswith("-packed"):
        a = engine.encode_batch_packed(s1)
        b = engine.encode_batch_packed(s2)
    elif mode.endswith("-batchless"):
        a = engine.encode_batch(s1, batch_size=1)
        b = engine.encode_batch(s2, batch_size=1)
    else:
        a = engine.encode_batch(s1, batch_size=batch)
        b = engine.encode_batch(s2, batch_size=batch)
    return _score(a, b, gold, time.time() - t0)


def _score(a, b, gold, dt: float) -> dict:
    from scipy import stats
    # embeddings are L2-normalized: cosine = dot
    cos = np.einsum("ne,ne->n", a.astype(np.float64), b.astype(np.float64))
    return {"spearman": float(stats.spearmanr(gold, cos).statistic),
            "pearson": float(stats.pearsonr(gold, cos).statistic),
            "evaluation_time": round(dt, 2), "n_pairs": len(gold)}


def write_result(out_dir: Path, model_name: str, mode: str, r: dict) -> None:
    """Reference layout: results/{model}_{mode}/STSBenchmark.json with the
    fields print_tables.py extracts (cos_sim.spearman + evaluation_time)."""
    d = out_dir / f"{model_name}_{mode}"
    d.mkdir(parents=True, exist_ok=True)
    import jax
    (d / "STSBenchmark.json").write_text(json.dumps({
        "mteb_dataset_name": "STSBenchmark",
        "test": {
            "cos_sim": {"spearman": r["spearman"],
                        "pearson": r["pearson"]},
            "evaluation_time": r["evaluation_time"],
        },
        "platform": jax.default_backend(),
        "source": "benchmarks/run_stsb_local.py (local data, no mteb pkg)",
    }, indent=1))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True,
                    help="HF dir / .npz / .bin / .gguf checkpoint")
    ap.add_argument("--data", required=True,
                    help="sts-test.tsv | score\\ts1\\ts2 TSV | JSONL")
    ap.add_argument("--modes", nargs="+", default=MODES)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--server-url", default=None,
                    help="evaluate through a live HTTP server instead of "
                         "loading the model in-process (the reference's "
                         "run_mteb_server.py flow); --modes then names "
                         "the single label to record")
    ap.add_argument("--out", default=str(Path(__file__).parent / "results"))
    ap.add_argument("--force-stream", action="store_true",
                    help="route attention through the streaming-KV "
                         "kernel even where whole-row K/V fits (tiny-E "
                         "long-context gates; process-wide, set before "
                         "the first compile)")
    args = ap.parse_args()
    if args.force_stream:
        from embeddings_tpu.ops.attention import force_stream_mode
        import contextlib
        ctx = force_stream_mode(True)
        ctx.__enter__()  # process-wide for the whole run

    s1, s2, gold = load_pairs(Path(args.data))
    print(f"{len(gold)} pairs from {args.data}", flush=True)
    model_name = infer_model_name(args.model)
    if args.force_stream:
        model_name += "-stream"  # keep both routes' artifacts
    results: dict[str, dict] = {}
    modes = args.modes[:1] if args.server_url else args.modes
    for mode in modes:
        r = evaluate_mode(args.model, mode, s1, s2, gold, args.batch,
                          server_url=args.server_url)
        results[mode] = r
        write_result(Path(args.out), model_name, mode, r)
        print(f"{mode:>16}: spearman={r['spearman']:.4f} "
              f"pearson={r['pearson']:.4f} time={r['evaluation_time']}s",
              flush=True)

    ref = results.get("f16") or results.get("f32")
    rc = 0
    if ref:
        for mode, r in results.items():
            if mode.split("-")[0] in ("q4_0", "q4_1", "q8_0"):
                delta = abs(ref["spearman"] - r["spearman"])
                ok = delta <= BUDGET
                print(f"ΔSpearman({mode} vs f16/f32) = {delta:.4f} "
                      f"[{'OK' if ok else 'FAIL'} budget {BUDGET}]")
                rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
