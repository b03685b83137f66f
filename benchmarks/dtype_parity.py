#!/usr/bin/env python
"""Offline quantization-quality gate: dtype parity vs f32 on a text corpus.

The reference's acceptance criterion is the MTEB STSBenchmark score delta
between quantized and f16 runs (BASELINE.md: q4_0 vs f16 ΔSpearman 0.0009).
That needs network-downloaded data and real weights. This harness measures
the same structural property offline:

  1. encode a corpus with f32 and with each target dtype;
  2. per-sentence embedding cosine (how far each vector moved);
  3. STS-proxy: Spearman/Pearson correlation between the f32 pairwise
     cosine-similarity matrix and the quantized one — i.e. does
     quantization preserve the similarity *ranking*, which is exactly what
     STS scores measure.

Works with a real checkpoint when available, or --random for a
random-init model (structural sanity only).

Usage:
  python benchmarks/dtype_parity.py -m models/bge-base-en-v1.5
  python benchmarks/dtype_parity.py --random bge-base-en-v1.5
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DTYPES = ["bf16", "f16", "q8_0", "q4_1", "q4_0"]


def default_corpus(n: int = 128) -> list[str]:
    """A deterministic, varied multilingual corpus (templates x fillers)."""
    subjects = ["the engineer", "a musician", "my neighbor", "the committee",
                "this model", "the spacecraft", "an old friend", "the city",
                "that restaurant", "the research team"]
    verbs = ["built", "discovered", "questioned", "improved", "described",
             "measured", "painted", "launched", "criticized", "embraced"]
    objects = ["a new algorithm", "the ancient bridge", "several theories",
               "its own limits", "the quarterly report", "a quiet melody",
               "the northern coastline", "an unusual pattern",
               "the final design", "a series of experiments"]
    extras = ["last summer", "despite the rain", "with great care",
              "in record time", "against all advice", "for no clear reason",
              "before the deadline", "across three continents"]
    cjk = ["这个模型的效果非常好", "我们在北京测试了新系统", "日本語の文章も処理できます",
           "量子计算机的发展速度令人惊讶", "请把这份报告翻译成英文"]
    out = []
    for i, (s, v, o) in enumerate(itertools.product(subjects, verbs, objects)):
        out.append(f"{s} {v} {o} {extras[i % len(extras)]}.")
        if len(out) >= n - len(cjk):
            break
    out.extend(cjk)
    return out[:n]


def sim_matrix(embs: np.ndarray) -> np.ndarray:
    s = embs @ embs.T
    iu = np.triu_indices(len(embs), k=1)
    return s[iu]


def evaluate(make_engine, corpus: list[str], dtypes: list[str],
             batch_size: int = 32) -> dict:
    from scipy import stats
    results: dict = {}
    eng32 = make_engine("f32")
    t0 = time.time()
    ref = eng32.encode_batch(corpus, batch_size)
    results["f32"] = {"eval_s": round(time.time() - t0, 3)}
    ref_sims = sim_matrix(ref)
    for dt in dtypes:
        eng = make_engine(dt)
        t0 = time.time()
        embs = eng.encode_batch(corpus, batch_size)
        dt_s = time.time() - t0
        cos = (embs * ref).sum(-1)
        sims = sim_matrix(embs)
        results[dt] = {
            "eval_s": round(dt_s, 3),
            "mean_cos_vs_f32": float(np.mean(cos)),
            "min_cos_vs_f32": float(np.min(cos)),
            "sts_proxy_spearman": float(stats.spearmanr(ref_sims, sims).statistic),
            "sts_proxy_pearson": float(stats.pearsonr(ref_sims, sims).statistic),
        }
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None,
                    help="HF dir / .npz / .bin checkpoint")
    ap.add_argument("--random", default=None, metavar="ARCH",
                    help="random-init a known architecture instead "
                         "(see config.KNOWN_MODELS)")
    ap.add_argument("--dtypes", nargs="+", default=DTYPES)
    ap.add_argument("--corpus", default=None, help="text file, one per line")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()

    corpus = (Path(args.corpus).read_text(encoding="utf-8").splitlines()[: args.n]
              if args.corpus else default_corpus(args.n))

    if args.random:
        from embeddings_tpu.config import BertConfig, EngineConfig, KNOWN_MODELS
        from embeddings_tpu.models import params as P
        from embeddings_tpu.runtime.engine import Engine
        from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
        arch = KNOWN_MODELS[args.random]
        big_vocab = (Path(__file__).resolve().parent.parent
                     / "tests" / "fixtures" / "big_vocab" / "vocab.txt")
        if big_vocab.exists():
            # real WordPiece over the committed 23k-token conformance
            # vocab: genuine multi-token tokenization of the corpus (the
            # hash-bucketed fallback below maps one word -> one id)
            vocab_tokens = big_vocab.read_text(
                encoding="utf-8").splitlines()
            cfg = BertConfig(**{**arch, "vocab_size": len(vocab_tokens)})
            base = P.init_params(cfg, rng=0)
            tok = WordPieceTokenizer(WordPieceVocab.from_tokens(vocab_tokens))

            def make_engine(dt):
                p = base if dt == "f32" else P.quantize_params(base, dt)
                return Engine(p, cfg, tok,
                              EngineConfig(batch_size=args.batch))
        else:
            # fallback: deterministic synthetic vocab (hash-bucketed)
            cfg = BertConfig(**{**arch,
                                "vocab_size": arch.get("vocab_size", 30522)})
            base = P.init_params(cfg, rng=0)
            tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                      + [f"tok{i}" for i in range(cfg.vocab_size - 5)])
            tok = WordPieceTokenizer(WordPieceVocab.from_tokens(tokens))
            # hash words onto the synthetic vocab so texts map
            # deterministically across processes (builtin hash() is
            # salted; crc32 is stable)
            import zlib

            def hashed_wordpiece(word: str):
                return [5 + (zlib.crc32(word.encode())
                             % (cfg.vocab_size - 5))]
            tok.wordpiece = hashed_wordpiece  # type: ignore[method-assign]

            def make_engine(dt):
                p = base if dt == "f32" else P.quantize_params(base, dt)
                eng = Engine(p, cfg, tok,
                             EngineConfig(batch_size=args.batch))
                # the native fast tokenizer rebuilds from the vocab and
                # would silently bypass the hashed monkeypatch (every
                # word -> [UNK])
                eng._fast_tokenizer = None
                return eng
    else:
        if not args.model:
            print("need -m MODEL or --random ARCH", file=sys.stderr)
            return 1
        from embeddings_tpu.runtime.engine import load_model

        def make_engine(dt):
            return load_model(args.model, dtype=dt)

    results = evaluate(make_engine, corpus, args.dtypes, args.batch)
    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    # quality gate mirroring the reference budget (Δ <= 0.003 spearman for
    # q8_0/q4_1/q4_0 against the f32 similarity structure would be ideal;
    # we flag anything below 0.99 as suspicious)
    def weak(r):
        x = r.get("sts_proxy_spearman", 1.0)
        return not (x >= 0.99)  # NaN (collapsed embeddings) must FAIL

    bad = {d: r for d, r in results.items() if isinstance(r, dict) and weak(r)}
    if bad:
        print(f"WARNING: weak similarity preservation: {list(bad)}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
