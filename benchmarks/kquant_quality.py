#!/usr/bin/env python
"""Embedding-level quality of the K-quant GGUF load path at real model
width.

Weight-level cosine for any 4-bit code at 32-element blocks is bounded
by quantization-noise physics (~0.997 on Gaussian data), but what users
consume is EMBEDDINGS, where per-weight noise averages out with width.
This harness writes bge-base-width q4_K/q5_K/q6_K GGUFs, loads them
through the production `load_model` path, and reports per-sentence
embedding cosine + similarity-structure preservation vs the f32 source
— the "loads modern GGUF embedding checkpoints" claim, quantified.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/kquant_quality.py \
      [--out benchmarks/results/kquant_quality.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from dtype_parity import default_corpus, sim_matrix  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="bge-base-en-v1.5")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--kinds", nargs="+",
                    default=["q4_0", "q4_K", "q5_K", "q6_K"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scipy import stats
    from embeddings_tpu.config import BertConfig, EngineConfig, KNOWN_MODELS
    from embeddings_tpu.models import gguf_io, params as P
    from embeddings_tpu.runtime.engine import Engine, load_model
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab

    big_vocab = (Path(__file__).resolve().parent.parent
                 / "tests" / "fixtures" / "big_vocab" / "vocab.txt")
    vocab_tokens = big_vocab.read_text(encoding="utf-8").splitlines()
    cfg = BertConfig(**{**KNOWN_MODELS[args.arch],
                        "vocab_size": len(vocab_tokens)})
    base = P.init_params(cfg, rng=0)
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(vocab_tokens))
    corpus = default_corpus(args.n)

    ref = Engine(base, cfg, tok, EngineConfig(batch_size=32)).encode_batch(
        corpus, 32)
    ref_sims = sim_matrix(ref)

    results = {"arch": args.arch, "hidden": cfg.hidden_size,
               "n_sentences": len(corpus), "kinds": {}}
    with tempfile.TemporaryDirectory() as td:
        for kind in args.kinds:
            path = Path(td) / f"m-{kind}.gguf"
            gguf_io.write_gguf(path, base, cfg, vocab_tokens, dtype=kind)
            eng = load_model(path)
            embs = eng.encode_batch(corpus, 32)
            cos = (embs * ref).sum(-1)
            sims = sim_matrix(embs)
            results["kinds"][kind] = {
                "file_mb": round(path.stat().st_size / 2**20, 2),
                "mean_cos_vs_f32": float(cos.mean()),
                "min_cos_vs_f32": float(cos.min()),
                "sts_proxy_spearman": float(
                    stats.spearmanr(ref_sims, sims).statistic),
            }
            print(kind, json.dumps(results["kinds"][kind]), flush=True)

    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    # Gates. Absolute: q6_K must preserve embeddings to cos >= 0.999
    # (4/5-bit kinds are bounded by quantization physics on random-init
    # weights: measured ~0.985 for the q4 family — same as our own
    # q4_0, below — and ~0.996 for q5_K). Relative: each K-quant must
    # beat q4_0 through the SAME pipeline (the reason the formats
    # exist); a subtly-wrong codec fails this even when absolute bars
    # pass.
    rc = 0
    ks = results["kinds"]
    if "q6_K" in ks and ks["q6_K"]["min_cos_vs_f32"] < 0.999:
        print("FAIL: q6_K embedding cosine < 0.999", file=sys.stderr)
        rc = 1
    if "q4_0" in ks:
        order = [k for k in ("q4_0", "q4_K", "q5_K", "q6_K") if k in ks]
        for a, b in zip(order, order[1:]):
            if ks[b]["mean_cos_vs_f32"] <= ks[a]["mean_cos_vs_f32"]:
                print(f"FAIL: {b} does not beat {a}", file=sys.stderr)
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
