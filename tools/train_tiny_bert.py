#!/usr/bin/env python
"""Train a tiny BERT embedding model locally (CPU, minutes, zero network)
and emit everything the quality gates need to run end-to-end on REAL
trained weights:

  benchmarks/fixtures/tiny_trained/
    model/              HF-format checkpoint (config.json,
                        model.safetensors, vocab.txt, 1_Pooling/) that
                        embeddings_tpu.load_model reads directly
    sts-test.tsv        graded sentence pairs (score \t s1 \t s2) for
                        benchmarks/run_stsb_local.py
    cls-train.tsv /     labeled sentences (label \t text) for
    cls-test.tsv        benchmarks/run_cls_local.py

Why this exists: the reference's acceptance bar is the STSBenchmark
score delta between quantized and float runs on TRAINED weights
(BASELINE.md). The environment has no egress, so no published
checkpoint or STS data can be downloaded — but torch + transformers are
local, so we can train a real (tiny) model whose weight distributions
come from an actual optimizer (heavy-tailed rows, per-channel outliers,
LayerNorm gain spread — the regime where blockwise 4-bit quantization
actually loses precision, unlike the Gaussian random-init proxy).

Training recipe (SimCSE-style supervised contrastive, the same family
bge/MiniLM sentence encoders use): synthetic topical corpus over a
pseudo-word vocabulary; batches of same-topic sentence pairs; InfoNCE
over mean-pooled L2-normalized embeddings. The model learns a topical
embedding geometry, so cosine similarity grades with topic/word overlap
— which is what the generated STS gold scores encode.

Determinism: fixed seeds; same artifacts from any run.

Usage:
  python tools/train_tiny_bert.py [--steps 600] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TOPICS = 12
WORDS_PER_TOPIC = 30
FUNCTION = ["the", "a", "of", "and", "in", "with", "on", "for"]
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
PUNCT = [".", ","]

_CONS = "bdfgklmnprstvz"
_VOW = "aeiou"


def make_topic_words(rng: np.random.Generator) -> list[list[str]]:
    """Deterministic pseudo-words (CV syllables): full vocab coverage, no
    real-word tokenizer edge cases, and each word is a single WordPiece
    token so text round-trips exactly through any tokenizer path."""
    seen: set[str] = set(FUNCTION)
    topics: list[list[str]] = []
    for _ in range(N_TOPICS):
        words: list[str] = []
        while len(words) < WORDS_PER_TOPIC:
            n_syll = int(rng.integers(2, 4))
            w = "".join(_CONS[rng.integers(len(_CONS))]
                        + _VOW[rng.integers(len(_VOW))]
                        for _ in range(n_syll))
            if w not in seen:
                seen.add(w)
                words.append(w)
        topics.append(words)
    return topics


def make_sentence(rng: np.random.Generator, words: list[str],
                  n_content: int | None = None) -> str:
    n = n_content or int(rng.integers(4, 9))
    picks = [words[i] for i in rng.choice(len(words), size=min(n, len(words)),
                                          replace=False)]
    parts = [FUNCTION[rng.integers(len(FUNCTION))], picks[0]]
    for w in picks[1:]:
        if rng.random() < 0.3:
            parts.append(FUNCTION[rng.integers(len(FUNCTION))])
        parts.append(w)
    return " ".join(parts) + " ."


def build_vocab(topics: list[list[str]]) -> list[str]:
    return (SPECIALS + FUNCTION + PUNCT
            + [w for t in topics for w in t])


def gen_sts_pairs(rng: np.random.Generator, topics: list[list[str]],
                  n: int = 1200) -> list[tuple[float, str, str]]:
    """Graded pairs: gold encodes topic/word overlap, the geometry the
    trained model learns. Levels mirror STS-B's 0-5 scale."""
    pairs = []
    for _ in range(n):
        level = int(rng.integers(0, 6))
        t1 = int(rng.integers(N_TOPICS))
        w1 = topics[t1]
        if level == 5:        # near-paraphrase: same words, reshuffled
            picks = list(rng.choice(WORDS_PER_TOPIC, size=6, replace=False))
            s1 = make_sentence(rng, [w1[i] for i in picks])
            s2 = make_sentence(rng, [w1[i] for i in picks])
        elif level == 4:      # same topic, half the words shared
            picks = list(rng.choice(WORDS_PER_TOPIC, size=9, replace=False))
            s1 = make_sentence(rng, [w1[i] for i in picks[:6]])
            s2 = make_sentence(rng, [w1[i] for i in picks[3:]])
        elif level == 3:      # same topic, disjoint words
            picks = list(rng.choice(WORDS_PER_TOPIC, size=12, replace=False))
            s1 = make_sentence(rng, [w1[i] for i in picks[:6]])
            s2 = make_sentence(rng, [w1[i] for i in picks[6:]])
        elif level == 2:      # half-on-topic second sentence
            t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
            s1 = make_sentence(rng, w1, 6)
            mixed = (list(rng.choice(w1, size=3, replace=False))
                     + list(rng.choice(topics[t2], size=3, replace=False)))
            s2 = make_sentence(rng, mixed, 6)
        elif level == 1:      # different topics, one stray shared word
            t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
            s1 = make_sentence(rng, w1, 6)
            stray = [str(rng.choice(w1))] + list(
                rng.choice(topics[t2], size=5, replace=False))
            s2 = make_sentence(rng, stray, 6)
        else:                 # unrelated
            t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
            s1 = make_sentence(rng, w1, 6)
            s2 = make_sentence(rng, topics[t2], 6)
        pairs.append((float(level), s1, s2))
    return pairs


def gen_cls_data(rng: np.random.Generator, topics: list[list[str]],
                 n_train: int = 960, n_test: int = 480):
    """Deliberately NOT saturable: each sentence mixes words from the
    label topic with a distractor topic (majority label), so the probe
    tops out well below 1.0 and a quantization-induced accuracy drop is
    actually measurable (a saturated task hides degradation)."""
    def gen(n):
        rows = []
        for _ in range(n):
            t = int(rng.integers(N_TOPICS))
            d = (t + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
            n_lab = int(rng.integers(3, 5))       # 3-4 label words
            n_dis = int(rng.integers(2, n_lab))   # fewer distractor words
            words = (list(rng.choice(topics[t], size=n_lab, replace=False))
                     + list(rng.choice(topics[d], size=n_dis,
                                       replace=False)))
            rows.append((t, make_sentence(rng, words,
                                          n_content=len(words))))
        return rows
    return gen(n_train), gen(n_test)


def train(vocab: list[str], topics: list[list[str]], steps: int,
          hidden: int = 128, layers: int = 4, heads: int = 4,
          intermediate: int = 512, max_pos: int = 128,
          batch_pairs: int = 32, lr: float = 3e-4, seed: int = 0):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed + 1)
    word_id = {w: i for i, w in enumerate(vocab)}
    cls_id, sep_id, pad_id = word_id["[CLS]"], word_id["[SEP]"], 0

    cfg = HFBertConfig(
        vocab_size=len(vocab), hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=intermediate,
        max_position_embeddings=max_pos)
    model = BertModel(cfg, add_pooling_layer=False)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.01)

    def encode_texts(texts: list[str]):
        ids = [[cls_id] + [word_id[w] for w in t.split()] + [sep_id]
               for t in texts]
        L = max(len(x) for x in ids)
        ids_t = torch.full((len(ids), L), pad_id, dtype=torch.long)
        mask = torch.zeros((len(ids), L), dtype=torch.long)
        for i, x in enumerate(ids):
            ids_t[i, :len(x)] = torch.tensor(x)
            mask[i, :len(x)] = 1
        return ids_t, mask

    tau = 0.05
    for step in range(steps):
        t_idx = rng.integers(N_TOPICS, size=batch_pairs)
        a = [make_sentence(rng, topics[t]) for t in t_idx]
        b = [make_sentence(rng, topics[t]) for t in t_idx]
        ids, mask = encode_texts(a + b)
        out = model(input_ids=ids, attention_mask=mask).last_hidden_state
        m = mask.unsqueeze(-1).float()
        pooled = (out * m).sum(1) / m.sum(1)
        z = torch.nn.functional.normalize(pooled, dim=-1)
        za, zb = z[:batch_pairs], z[batch_pairs:]
        logits = za @ zb.T / tau
        labels = torch.arange(batch_pairs)
        loss = (torch.nn.functional.cross_entropy(logits, labels)
                + torch.nn.functional.cross_entropy(logits.T, labels)) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == steps - 1:
            acc = (logits.argmax(-1) == labels).float().mean().item()
            print(f"step {step:4d}  loss {loss.item():.4f}  "
                  f"in-batch acc {acc:.3f}", flush=True)
    model.eval()
    return model, cfg


def save_hf_dir(model, cfg, vocab: list[str], out: Path) -> None:
    from safetensors.numpy import save_file
    out.mkdir(parents=True, exist_ok=True)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    save_file(sd, str(out / "model.safetensors"))
    (out / "config.json").write_text(json.dumps({
        "model_type": "bert",
        "architectures": ["BertModel"],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "layer_norm_eps": cfg.layer_norm_eps,
        "_name_or_path": "tiny-trained-local",
    }, indent=1))
    (out / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (out / "tokenizer_config.json").write_text(json.dumps(
        {"do_lower_case": True, "model_max_length": 128}))
    pool = out / "1_Pooling"
    pool.mkdir(exist_ok=True)
    pool.joinpath("config.json").write_text(json.dumps({
        "word_embedding_dimension": cfg.hidden_size,
        "pooling_mode_cls_token": False,
        "pooling_mode_mean_tokens": True,
        "pooling_mode_max_tokens": False,
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--data-only", action="store_true",
                    help="regenerate the TSVs without retraining (the "
                         "data RNG stream is independent of training)")
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent
        / "benchmarks" / "fixtures" / "tiny_trained"))
    args = ap.parse_args()

    data_rng = np.random.default_rng(42)
    topics = make_topic_words(data_rng)
    vocab = build_vocab(topics)
    out = Path(args.out)

    if not args.data_only:
        model, cfg = train(vocab, topics, steps=args.steps)
        save_hf_dir(model, cfg, vocab, out / "model")

    pairs = gen_sts_pairs(data_rng, topics)
    with open(out / "sts-test.tsv", "w") as f:
        for score, s1, s2 in pairs:
            f.write(f"{score}\t{s1}\t{s2}\n")
    train_rows, test_rows = gen_cls_data(data_rng, topics)
    for name, rows in (("cls-train.tsv", train_rows),
                       ("cls-test.tsv", test_rows)):
        with open(out / name, "w") as f:
            for label, text in rows:
                f.write(f"{label}\t{text}\n")
    print(f"wrote checkpoint + data under {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
