#!/usr/bin/env python
"""Train tiny *non-vanilla* architecture variants locally (CPU, minutes,
zero network) so the quality gates cover the paths the vanilla tiny BERT
cannot touch:

  --arch moe     nomic-bert-moe interleave (rotary attention, dense GELU
                 FFN at even layers, top-2-of-4 routed experts at odd
                 layers, shared expert bias) -> routing-under-quantization
                 gets a real ΔSpearman number, not just bit-consistency
                 (VERDICT r3 weak #3).
  --arch rotary  nomic-bert-2048 shape (half-split rotary + SwiGLU,
                 n_positions=2048) + LONG graded documents (~1k tokens)
                 -> the streaming-KV attention path gets a trained-weights
                 STS gate past the reference's hard 512 cap
                 (`bert.cpp:867-871`), not just kernel bit-parity
                 (VERDICT r3 weak/task #4).
  --arch alibi   jina-bert-v2 shape (ALiBi logit penalty + GeGLU) + the
                 same long documents -> the in-kernel-ALiBi streaming
                 route gets a trained gate too.

Each variant trains with the same supervised-contrastive recipe and
synthetic topical corpus as tools/train_tiny_bert.py (imported from
there — one corpus, one gold-score generator, so scores are comparable
across variants) and saves an HF-format checkpoint dir that
embeddings_tpu.load_model reads directly:

  benchmarks/fixtures/tiny_trained_{arch}/model/
      config.json          model_type nomic_bert (moe/rotary) or bert
                           with position_embedding_type=alibi (alibi),
                           in the exact field dialect
                           BertConfig.from_hf_dict maps
      model.safetensors    HF-named state dict (nomic encoder.layers.*
                           / jina encoder.layer.* keys — the same names
                           models/params.py translates for the published
                           checkpoints)
      vocab.txt 1_Pooling/ tokenizer + mean pooling

plus, for the long-context variants, graded LONG documents:

  benchmarks/fixtures/tiny_trained_{arch}/sts-test-long.tsv
      score \t doc1 \t doc2 where each doc concatenates ~90 topic
      sentences (~1,000 WordPiece tokens) — level semantics identical to
      the short STS file, applied per sentence-pair then concatenated,
      so cosine-of-mean-pool grades the same geometry at L>512.

Gate runs (see benchmarks/run_stsb_local.py):
  python benchmarks/run_stsb_local.py \
      -m benchmarks/fixtures/tiny_trained_moe/model \
      --data benchmarks/fixtures/tiny_trained/sts-test.tsv \
      --modes f32 f16 q4_0 q8_0 q4_0-int8

The MoE quantized modes exercise exactly what ships: attention + dense
FFN weights quantized, router logits computed from activations that
passed through quantized matmuls (the router weight itself stays f32
and expert stacks stay dense by design — models/params.py:899-913).

Usage:
  python tools/train_tiny_variants.py --arch moe [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from train_tiny_bert import (FUNCTION, N_TOPICS, WORDS_PER_TOPIC,
                             build_vocab, gen_sts_pairs, make_sentence,
                             make_topic_words)

HIDDEN, LAYERS, HEADS, INTER, EXPERTS, TOPK = 128, 4, 4, 512, 4, 2
ROTARY_BASE = 10000.0


# ---------------------------------------------------------------- torch
# Module attribute names are chosen so .state_dict() emits the exact HF
# key names the published checkpoints use (and models/params.py maps):
# nomic: encoder.layers.{i}.attn.Wqkv / mlp.fc11 / mlp.router.layer ...
# jina:  encoder.layer.{i}.attention.self.query / mlp.gated_layers ...

def _torch():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    return torch, nn, F


def build_nomic(num_experts: int, n_positions: int, seed: int):
    """nomic-bert trainable module: rotary attention + post-LN; FFN is
    SwiGLU when num_experts == 0, else the v2-moe interleave (dense GELU
    at even layers, routed GELU experts at odd layers)."""
    torch, nn, F = _torch()
    torch.manual_seed(seed)
    E, H, NL, I, Ex = HIDDEN, HEADS, LAYERS, INTER, num_experts
    D = E // H

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.Wqkv = nn.Linear(E, 3 * E)
            self.out_proj = nn.Linear(E, E)

    class SwiGLU(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc11 = nn.Linear(E, I)
            self.fc12 = nn.Linear(E, I)
            self.fc2 = nn.Linear(I, E)

    class DenseGELU(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(E, I)
            self.fc2 = nn.Linear(I, E)

    class Router(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer = nn.Linear(E, Ex, bias=False)

    class ExpertsMLP(nn.Module):
        def __init__(self):
            super().__init__()
            # fused [Ex*I, E] stacks, the HF NomicExpertMLP layout
            self.w1 = nn.Parameter(torch.randn(Ex * I, E) * 0.02)
            self.w2 = nn.Parameter(torch.randn(Ex * I, E) * 0.02)

    class Experts(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = ExpertsMLP()
            self.bias = nn.Parameter(torch.zeros(E))

    class MoEMLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.router = Router()
            self.experts = Experts()

    class Layer(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.attn = Attn()
            self.norm1 = nn.LayerNorm(E, eps=1e-12)
            self.norm2 = nn.LayerNorm(E, eps=1e-12)
            if Ex and i % 2 == 1:
                self.mlp = MoEMLP()
            elif Ex:
                self.mlp = DenseGELU()
            else:
                self.mlp = SwiGLU()

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([Layer(i) for i in range(NL)])

    class Embeddings(nn.Module):
        def __init__(self, V):
            super().__init__()
            self.word_embeddings = nn.Embedding(V, E)
            self.token_type_embeddings = nn.Embedding(2, E)

    class Nomic(nn.Module):
        def __init__(self, V):
            super().__init__()
            self.embeddings = Embeddings(V)
            self.emb_ln = nn.LayerNorm(E, eps=1e-12)
            self.encoder = Encoder()

        def forward(self, ids, mask):
            B, L = ids.shape
            x = (self.embeddings.word_embeddings(ids)
                 + self.embeddings.token_type_embeddings.weight[0])
            x = self.emb_ln(x)
            half = D // 2
            inv = ROTARY_BASE ** (-torch.arange(
                half, device=ids.device).float() / half)
            ang = torch.arange(L, device=ids.device).float()[:, None] * inv
            cos, sin = torch.cos(ang), torch.sin(ang)

            def rope(v):  # [B, H, L, D] half-split (GPT-NeoX layout)
                v1, v2 = v[..., :half], v[..., half:]
                return torch.cat([v1 * cos - v2 * sin,
                                  v2 * cos + v1 * sin], -1)

            mb = (1.0 - mask.float()) * -1e9
            aux = x.new_zeros(())
            for i, lyr in enumerate(self.encoder.layers):
                qkv = lyr.attn.Wqkv(x)
                q, k, v = qkv.split(E, dim=-1)
                q = rope(q.view(B, L, H, D).transpose(1, 2))
                k = rope(k.view(B, L, H, D).transpose(1, 2))
                v = v.view(B, L, H, D).transpose(1, 2)
                s = q @ k.transpose(-1, -2) / math.sqrt(D)
                s = s + mb[:, None, None, :]
                ctx = (F.softmax(s, dim=-1) @ v).transpose(1, 2)
                ctx = lyr.attn.out_proj(ctx.reshape(B, L, E))
                x = lyr.norm1(x + ctx)
                if isinstance(lyr.mlp, MoEMLP):
                    xt = x.reshape(-1, E)
                    probs = lyr.mlp.router.layer(xt).softmax(-1)
                    top_w, top_e = probs.topk(TOPK, dim=-1)  # no renorm
                    w1 = lyr.mlp.experts.mlp.w1.view(Ex, I, E)
                    w2 = lyr.mlp.experts.mlp.w2.view(Ex, I, E)
                    # dense-expert evaluation (vectorized): every expert
                    # on every token, top-k weights mask the combine —
                    # the same schedule ops/moe.py runs on TPU
                    h1 = F.gelu(torch.einsum("te,xie->txi", xt, w1))
                    y_e = torch.einsum("txi,xie->txe", h1, w2)
                    wmask = torch.zeros_like(probs).scatter(
                        -1, top_e, top_w)
                    h = (torch.einsum("tx,txe->te", wmask, y_e)
                         + lyr.mlp.experts.bias).reshape(B, L, E)
                    # switch-style load-balance auxiliary (keeps experts
                    # from collapsing so the gate actually tests routing)
                    frac = torch.zeros_like(probs).scatter(
                        -1, top_e, 1.0).mean(0)
                    aux = aux + Ex * (frac * probs.mean(0)).sum()
                elif isinstance(lyr.mlp, DenseGELU):
                    h = lyr.mlp.fc2(F.gelu(lyr.mlp.fc1(x)))
                else:
                    h = lyr.mlp.fc2(F.silu(lyr.mlp.fc11(x))
                                    * lyr.mlp.fc12(x))
                x = lyr.norm2(x + h)
            return x, aux

    return Nomic


def build_jina(seed: int):
    """jina-bert-v2 trainable module: ALiBi logit penalty + GeGLU."""
    torch, nn, F = _torch()
    torch.manual_seed(seed)
    from embeddings_tpu.ops.alibi import alibi_slopes
    E, H, NL, I = HIDDEN, HEADS, LAYERS, INTER
    D = E // H

    class SelfAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.query = nn.Linear(E, E)
            self.key = nn.Linear(E, E)
            self.value = nn.Linear(E, E)

    class AttnOut(nn.Module):
        def __init__(self):
            super().__init__()
            self.dense = nn.Linear(E, E)
            self.LayerNorm = nn.LayerNorm(E, eps=1e-12)

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            self.self = SelfAttn()
            self.output = AttnOut()

    class MLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.gated_layers = nn.Linear(E, 2 * I, bias=False)
            self.wo = nn.Linear(I, E)
            self.layernorm = nn.LayerNorm(E, eps=1e-12)

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention = Attention()
            self.mlp = MLP()

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer = nn.ModuleList([Layer() for _ in range(NL)])

    class Embeddings(nn.Module):
        def __init__(self, V):
            super().__init__()
            self.word_embeddings = nn.Embedding(V, E)
            self.token_type_embeddings = nn.Embedding(2, E)
            self.LayerNorm = nn.LayerNorm(E, eps=1e-12)

    class Jina(nn.Module):
        def __init__(self, V):
            super().__init__()
            self.embeddings = Embeddings(V)
            self.encoder = Encoder()
            self.register_buffer("slopes", torch.tensor(
                alibi_slopes(H), dtype=torch.float32))

        def forward(self, ids, mask):
            B, L = ids.shape
            x = (self.embeddings.word_embeddings(ids)
                 + self.embeddings.token_type_embeddings.weight[0])
            x = self.embeddings.LayerNorm(x)
            pos = torch.arange(L, device=ids.device)
            bias = -self.slopes[:, None, None] * (
                pos[None, :] - pos[:, None]).abs()
            kb = (1.0 - mask.float())[:, None, None, :] * -1e9
            for lyr in self.encoder.layer:
                a = lyr.attention
                q = a.self.query(x).view(B, L, H, D)
                k = a.self.key(x).view(B, L, H, D)
                v = a.self.value(x).view(B, L, H, D)
                s = torch.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(D)
                s = s + bias[None] + kb
                ctx = torch.einsum("bhlm,bmhd->blhd",
                                   torch.softmax(s, -1), v)
                ctx = a.output.dense(ctx.reshape(B, L, E))
                x = a.output.LayerNorm(x + ctx)
                g = lyr.mlp.gated_layers(x)
                h = F.gelu(g[..., :I]) * g[..., I:]
                x = lyr.mlp.layernorm(x + lyr.mlp.wo(h))
            return x, x.new_zeros(())

    return Jina


# ---------------------------------------------------------- long STS data

def gen_sts_pairs_long(rng: np.random.Generator, topics, n: int = 240,
                       sents_per_doc: int = 90):
    """Graded LONG document pairs (~1k WordPiece tokens each): a pair at
    level L concatenates sents_per_doc independent sentence-pairs of the
    same level — mean-pooled cosine grades identically to the short set,
    at streaming-kernel lengths."""
    docs = []
    for _ in range(n):
        level = int(rng.integers(0, 6))
        a_parts, b_parts = [], []
        for _ in range(sents_per_doc):
            # one sentence-pair at this level, via the short generator's
            # level semantics (re-implemented inline to draw fresh topics
            # per sentence so documents are topic mixtures, like real
            # long text, while keeping per-sentence overlap = level)
            t1 = int(rng.integers(N_TOPICS))
            w1 = topics[t1]
            if level == 5:
                picks = list(rng.choice(WORDS_PER_TOPIC, size=6,
                                        replace=False))
                s1 = make_sentence(rng, [w1[i] for i in picks])
                s2 = make_sentence(rng, [w1[i] for i in picks])
            elif level == 4:
                picks = list(rng.choice(WORDS_PER_TOPIC, size=9,
                                        replace=False))
                s1 = make_sentence(rng, [w1[i] for i in picks[:6]])
                s2 = make_sentence(rng, [w1[i] for i in picks[3:]])
            elif level == 3:
                picks = list(rng.choice(WORDS_PER_TOPIC, size=12,
                                        replace=False))
                s1 = make_sentence(rng, [w1[i] for i in picks[:6]])
                s2 = make_sentence(rng, [w1[i] for i in picks[6:]])
            elif level == 2:
                t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
                s1 = make_sentence(rng, w1, 6)
                mixed = (list(rng.choice(w1, size=3, replace=False))
                         + list(rng.choice(topics[t2], size=3,
                                           replace=False)))
                s2 = make_sentence(rng, mixed, 6)
            elif level == 1:
                t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
                s1 = make_sentence(rng, w1, 6)
                stray = [str(rng.choice(w1))] + list(
                    rng.choice(topics[t2], size=5, replace=False))
                s2 = make_sentence(rng, stray, 6)
            else:
                t2 = (t1 + 1 + int(rng.integers(N_TOPICS - 1))) % N_TOPICS
                s1 = make_sentence(rng, w1, 6)
                s2 = make_sentence(rng, topics[t2], 6)
            a_parts.append(s1)
            b_parts.append(s2)
        docs.append((float(level), " ".join(a_parts), " ".join(b_parts)))
    return docs


# ----------------------------------------------------------------- train

def train_variant(arch: str, vocab, topics, steps: int, lr: float = 3e-4,
                  batch_pairs: int = 32, seed: int = 0):
    torch, nn, F = _torch()
    rng = np.random.default_rng(seed + 1)
    word_id = {w: i for i, w in enumerate(vocab)}
    cls_id, sep_id, pad_id = word_id["[CLS]"], word_id["[SEP]"], 0

    if arch == "moe":
        model = build_nomic(EXPERTS, 512, seed)(len(vocab))
    elif arch == "rotary":
        model = build_nomic(0, 2048, seed)(len(vocab))
    elif arch == "alibi":
        model = build_jina(seed)(len(vocab))
    else:
        raise ValueError(arch)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.01)

    def encode_texts(texts):
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
        # long-context variants see multi-sentence passages during
        # training too (2-4 sentences) so position use isn't degenerate
        n_sent = (1 if arch == "moe"
                  else int(rng.integers(1, 5)))
        a = [" ".join(make_sentence(rng, topics[t])
                      for _ in range(n_sent)) for t in t_idx]
        b = [" ".join(make_sentence(rng, topics[t])
                      for _ in range(n_sent)) for t in t_idx]
        ids, mask = encode_texts(a + b)
        out, aux = model(ids, mask)
        m = mask.unsqueeze(-1).float()
        pooled = (out * m).sum(1) / m.sum(1)
        z = F.normalize(pooled, dim=-1)
        za, zb = z[:batch_pairs], z[batch_pairs:]
        logits = za @ zb.T / tau
        labels = torch.arange(batch_pairs)
        loss = (F.cross_entropy(logits, labels)
                + F.cross_entropy(logits.T, labels)) / 2 + 0.02 * aux
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == steps - 1:
            acc = (logits.argmax(-1) == labels).float().mean().item()
            print(f"[{arch}] step {step:4d}  loss {loss.item():.4f}  "
                  f"in-batch acc {acc:.3f}", flush=True)
    model.eval()
    return model


# ------------------------------------------------------------------ save

def save_variant(arch: str, model, vocab, out: Path) -> None:
    from safetensors.numpy import save_file
    out.mkdir(parents=True, exist_ok=True)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items() if k != "slopes"}
    save_file(sd, str(out / "model.safetensors"))
    if arch in ("moe", "rotary"):
        cfg = {
            "model_type": "nomic_bert",
            "_name_or_path": f"tiny-trained-{arch}",
            "vocab_size": len(vocab),
            "n_embd": HIDDEN, "n_layer": LAYERS, "n_head": HEADS,
            "n_inner": INTER,
            "n_positions": 512 if arch == "moe" else 2048,
            "activation_function": "gelu" if arch == "moe" else "swiglu",
            "rotary_emb_base": ROTARY_BASE,
            "rotary_emb_fraction": 1.0,
            "rotary_emb_interleaved": False,
            "layer_norm_epsilon": 1e-12,
            "type_vocab_size": 2,
            "prenorm": False,
        }
        if arch == "moe":
            cfg.update(num_experts=EXPERTS, moe_top_k=TOPK,
                       moe_every_n_layers=2,
                       moe_normalize_expert_weights=None)
    else:
        cfg = {
            "model_type": "bert",
            "_name_or_path": "tiny-trained-alibi",
            "vocab_size": len(vocab),
            "hidden_size": HIDDEN, "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS, "intermediate_size": INTER,
            "max_position_embeddings": 2048,
            "type_vocab_size": 2, "layer_norm_eps": 1e-12,
            "position_embedding_type": "alibi",
            "feed_forward_type": "geglu", "hidden_act": "gelu",
            "pad_token_id": 0,
        }
    (out / "config.json").write_text(json.dumps(cfg, indent=1))
    (out / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (out / "tokenizer_config.json").write_text(json.dumps(
        {"do_lower_case": True,
         "model_max_length": cfg.get("n_positions",
                                     cfg.get("max_position_embeddings"))}))
    pool = out / "1_Pooling"
    pool.mkdir(exist_ok=True)
    pool.joinpath("config.json").write_text(json.dumps({
        "word_embedding_dimension": HIDDEN,
        "pooling_mode_cls_token": False,
        "pooling_mode_mean_tokens": True,
        "pooling_mode_max_tokens": False,
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True,
                    choices=["moe", "rotary", "alibi"])
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--data-only", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data_rng = np.random.default_rng(42)
    topics = make_topic_words(data_rng)
    vocab = build_vocab(topics)
    out = Path(args.out) if args.out else (
        Path(__file__).resolve().parent.parent / "benchmarks"
        / "fixtures" / f"tiny_trained_{args.arch}")

    if not args.data_only:
        model = train_variant(args.arch, vocab, topics, steps=args.steps)
        save_variant(args.arch, model, vocab, out / "model")

    if args.arch in ("rotary", "alibi"):
        # long-doc RNG stream: independent of training (fresh generator)
        long_rng = np.random.default_rng(4242)
        docs = gen_sts_pairs_long(long_rng, topics)
        with open(out / "sts-test-long.tsv", "w") as f:
            for score, d1, d2 in docs:
                f.write(f"{score}\t{d1}\t{d2}\n")
        toks = [len(d.split()) for _, d, _ in docs]
        print(f"long docs: n={len(docs)} words/doc "
              f"p50={int(np.median(toks))} max={max(toks)}")
    print(f"wrote {args.arch} checkpoint under {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
