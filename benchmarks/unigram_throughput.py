#!/usr/bin/env python
"""Host Unigram (XLM-R-family) tokenization throughput vs serving need.

The engine's serving rate is device-bound only if the host can feed it
tokens faster than the chip consumes them. WordPiece and BPE have native
C++ fast paths (native/tokenizer.cpp, native/bpe.cpp); Unigram —
multilingual-e5 / bge-m3 / XLM-R, big serving targets — runs pure-Python
Viterbi + charsmap. This benchmark measures whether that caps served
throughput (VERDICT r3 weak #7 / task #5).

Offline-reproducible: a deterministic synthetic vocab (64k pieces, SPM
length/score statistics) and synthetic multilingual-ish text. The
numbers that matter are relative: host tokens/s vs the tokens/s the
chip consumes at the headline sentences/s.

Writes benchmarks/results/unigram_throughput.json and prints a verdict.
Run with --native to also measure the C++ fast path when built.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from embeddings_tpu.tokenizer.unigram import SPIECE, UnigramTokenizer

# headline serving rate (BENCH_r03: 5,076 sentences/s/chip at L=256 with
# ~2/3 realistic fill) -> tokens/s one chip consumes; tokenization must
# comfortably exceed this per serving host
CHIP_SENT_S = 5000.0
TOKENS_PER_SENT = 170.0  # realistic mean (padded L=256, ~2/3 fill)


def make_vocab(rng: np.random.Generator, n: int = 64000):
    """SPM-like piece inventory: all single chars over a ~300-char
    alphabet (coverage), then multi-char pieces with a length mix near
    real XLM-R spiece stats (mean ~6 chars), Zipf-ish scores."""
    alphabet = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    alphabet += [chr(c) for c in range(0x430, 0x450)]   # cyrillic
    alphabet += [chr(c) for c in range(0x3B1, 0x3C9)]   # greek
    alphabet += [chr(c) for c in range(0x4E00, 0x4E00 + 180)]  # cjk
    alphabet += list("0123456789.,!?-'\"")
    pieces = ["<s>", "<pad>", "</s>", "<unk>"]
    pieces += [SPIECE] + alphabet + [SPIECE + c for c in alphabet]
    seen = set(pieces)
    probs = np.ones(len(alphabet)) / len(alphabet)
    while len(pieces) < n:
        ln = int(rng.integers(2, 10))
        w = "".join(rng.choice(alphabet, size=ln, p=probs))
        if rng.random() < 0.55:
            w = SPIECE + w
        if w not in seen:
            seen.add(w)
            pieces.append(w)
    scores = -rng.exponential(3.0, size=len(pieces)) - 1.0
    vocab = [(p, float(s)) for p, s in zip(pieces, scores)]
    for i in range(4):
        vocab[i] = (vocab[i][0], 0.0)
    return vocab


def make_texts(rng: np.random.Generator, vocab, n_texts: int = 512,
               words_per_text: int = 40):
    """Text stitched from vocab pieces (so segmentation has real work to
    do) plus 5% out-of-vocab noise words."""
    multi = [p.replace(SPIECE, "") for p, _ in vocab[400:4000]
             if len(p) > 3]
    texts = []
    for _ in range(n_texts):
        words = []
        for _ in range(words_per_text):
            if rng.random() < 0.05:
                words.append("zz" + str(rng.integers(1e6)))
            else:
                w = str(rng.choice(multi))
                if rng.random() < 0.3:
                    w += str(rng.choice(multi))
                words.append(w)
        texts.append(" ".join(words))
    return texts


def bench(fn, reps: int = 3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> int:
    rng = np.random.default_rng(0)
    vocab = make_vocab(rng)
    tok = UnigramTokenizer(vocab, unk_id=3, normalizer="nfkc",
                           cls_token="<s>", sep_token="</s>")
    texts = make_texts(rng, vocab)
    total_chars = sum(len(t) for t in texts)

    t_all, ids = bench(lambda: tok.encode_batch(texts))
    total_toks = sum(len(x) for x in ids)
    t_norm, _ = bench(lambda: [tok._normalize(t) for t in texts])
    normed = [tok._normalize(t) for t in texts]
    t_meta, _ = bench(lambda: [tok._metaspace(t) for t in normed])

    tok_s = total_toks / t_all
    need = CHIP_SENT_S * TOKENS_PER_SENT
    res = {
        "n_texts": len(texts), "total_chars": total_chars,
        "total_tokens": total_toks,
        "python": {
            "tokens_per_s": round(tok_s),
            "chars_per_s": round(total_chars / t_all),
            "normalize_frac": round(t_norm / t_all, 3),
            "metaspace_frac": round(t_meta / t_all, 3),
            "viterbi_frac": round(1 - (t_norm + t_meta) / t_all, 3),
        },
        "chip_tokens_per_s_needed": round(need),
        "python_feeds_chips": round(tok_s / need, 3),
    }

    # native fast path (if built)
    try:
        from embeddings_tpu.tokenizer.native import NativeUnigramTokenizer
        ntok = NativeUnigramTokenizer.wrap(tok)
    except ImportError:
        ntok = None
    if ntok is not None:
        t_nat, nids = bench(lambda: ntok.encode_batch(texts))
        match = sum(a == b for a, b in zip(ids, nids))
        res["native"] = {
            "tokens_per_s": round(total_toks / t_nat),
            "speedup": round(t_all / t_nat, 2),
            "exact_match_texts": f"{match}/{len(texts)}",
            "feeds_chips": round(total_toks / t_nat / need, 3),
        }
        assert match == len(texts), "native/python segmentation mismatch"

    out = Path(__file__).parent / "results" / "unigram_throughput.json"
    out.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))
    verdict = ("python host tokenization SUSTAINS" if tok_s >= need
               else "python host tokenization CAPS")
    print(f"{verdict} one chip at {CHIP_SENT_S:.0f} sent/s "
          f"(x{tok_s / need:.2f} of need)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
