"""Parameter pytree construction: HF import, random init, quantization,
native checkpoint save/load.

Replaces the reference's custom .bin loader + HF-name->tensor map
(/root/reference/bert.cpp:423-786) and its converter
(models/convert-to-ggml.py): we import HF checkpoints (safetensors or
torch .bin) directly — no intermediate format — and persist an optional
native .npz with quantized arrays. Layer weights are stacked on a leading
axis so the forward pass scans over them.

Layout (all linears stored [in, out] so the forward does x @ w):
  params = {
    "embeddings": {"word": [V,E]|QT, "position": [P,E], "token_type": [T,E],
                    "ln": {"scale": [E], "bias": [E]}},
    "layers": {  # each leaf stacked [num_layers, ...]
      "attn": {"q"/"k"/"v"/"o": {"w": [E,E]|QT, "b": [E]},
               "ln": {"scale", "bias"}},
      "mlp":  {"up": {"w": [E,F]|QT, "b": [F]},
               "down": {"w": [F,E]|QT, "b": [E]},
               "ln": {"scale", "bias"}},
    },
  }
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BertConfig
from ..ops.quant import QuantizedTensor, pack_q4, quantize

Params = dict[str, Any]

DENSE_KINDS = ("f32", "f16", "bf16")
QUANT_KINDS = ("q4_0", "q4_1", "q8_0", "nf4")


def _ln(scale, bias):
    return {"scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32)}


def init_params(config: BertConfig, rng: jax.Array | int = 0,
                dtype=jnp.float32) -> Params:
    """Random init (for tests/benchmarks without a checkpoint)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    E, F = config.hidden_size, config.intermediate_size
    NL = 1 if config.shared_layers else config.num_hidden_layers
    Ee = config.embedding_size or E
    keys = iter(jax.random.split(rng, 16))
    std = 0.02

    def mat(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    emb = {
        "word": mat(next(keys), (config.vocab_size, Ee)),
        "position": mat(next(keys), (config.max_position_embeddings, Ee)),
        "token_type": mat(next(keys), (config.type_vocab_size, Ee)),
        "ln": _ln(np.ones(Ee), np.zeros(Ee)),
    }
    if config.position_embedding_type == "rotary":
        del emb["position"]  # rotary: no learned position table
    if config.embedding_size is not None:
        emb["proj"] = {"w": mat(next(keys), (Ee, E)),
                       "b": jnp.zeros((E,), dtype)}
    lk = jax.random.split(next(keys), 6 * NL).reshape(NL, 6, 2)

    def stack(f):
        return jnp.stack([f(i) for i in range(NL)])

    # GQA (Qwen2 family): K/V projections are num_key_value_heads wide
    Ekv = ((config.num_key_value_heads or config.num_attention_heads)
           * config.head_dim)
    widths = {"q": E, "k": Ekv, "v": Ekv, "o": E}
    layers = {
        "attn": {
            **{name: {"w": stack(lambda i, j=j, n=name: mat(
                          lk[i, j], (E, widths[n]))),
                      "b": jnp.zeros((NL, widths[name]), dtype)}
               for j, name in enumerate(["q", "k", "v", "o"])},
            "ln": {"scale": jnp.ones((NL, E), jnp.float32),
                   "bias": jnp.zeros((NL, E), jnp.float32)},
        },
        "mlp": {
            "up": {"w": stack(lambda i: mat(lk[i, 4], (E, F))),
                   "b": jnp.zeros((NL, F), dtype)},
            "down": {"w": stack(lambda i: mat(lk[i, 5], (F, E))),
                     "b": jnp.zeros((NL, E), dtype)},
            "ln": {"scale": jnp.ones((NL, E), jnp.float32),
                   "bias": jnp.zeros((NL, E), jnp.float32)},
        },
    }
    if config.gated_mlp:
        gk = jax.random.split(next(keys), NL)
        layers["mlp"]["gate"] = {
            "w": stack(lambda i: mat(gk[i], (E, F))),
            "b": jnp.zeros((NL, F), dtype)}
    if config.position_embedding_type == "alibi":
        del emb["position"]  # ALiBi: no learned position table
    if config.norm_type == "rmsnorm":
        del emb["ln"]  # Qwen2-family: bare token embedding, no norm
    if config.num_experts:
        # MoE interleave (nomic-v2-moe layout): odd layers swap their
        # FFN for num_experts routed experts; layers split into two
        # half-stacks scanned as (dense, moe) pairs (bert._scan_layers)
        if NL % 2 or config.moe_every_n_layers != 2:
            raise ValueError("MoE models need an even layer count with "
                             "moe_every_n_layers=2")
        NLh, Ex = NL // 2, config.num_experts

        def take(t, s):
            return jax.tree_util.tree_map(lambda a: a[s], t)

        ek = jax.random.split(next(keys), 3 * NLh).reshape(NLh, 3, 2)
        estack = jnp.stack  # [NLh, Ex, ...]
        moe_mlp = {
            "router": {"w": estack([mat(ek[i, 0], (E, Ex))
                                    for i in range(NLh)])},
            "up": {"w": estack([mat(ek[i, 1], (Ex, E, F))
                                for i in range(NLh)]),
                   "b": jnp.zeros((NLh, Ex, F), dtype)},
            "down": {"w": estack([mat(ek[i, 2], (Ex, F, E))
                                  for i in range(NLh)]),
                     "b": jnp.zeros((NLh, Ex, E), dtype)},
            "bias": jnp.zeros((NLh, E), dtype),  # shared output bias
            "ln": {"scale": jnp.ones((NLh, E), jnp.float32),
                   "bias": jnp.zeros((NLh, E), jnp.float32)},
        }
        layers = {"dense": take(layers, slice(0, None, 2)),
                  "moe": {"attn": take(layers["attn"], slice(1, None, 2)),
                          "mlp": moe_mlp}}
    out: Params = {"embeddings": emb, "layers": layers}
    if config.relative_attention_num_buckets:
        out["rel_bias"] = (jax.random.normal(
            next(keys), (config.relative_attention_num_buckets,
                         config.num_attention_heads)) * std
            ).astype(jnp.float32)
    if config.position_embedding_type == "alibi":
        from ..ops.alibi import alibi_slopes
        out["alibi_slopes"] = jnp.asarray(
            alibi_slopes(config.num_attention_heads), jnp.float32)
    if config.norm_style == "pre":
        out["final_ln"] = _ln(np.ones(E), np.zeros(E))
    return out


# ---------------------------------------------------------------------------
# HF import
# ---------------------------------------------------------------------------

def _strip_prefix(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop the 'bert.' / '0.auto_model.' style prefixes HF checkpoints use."""
    # RoBERTa tensors use BERT's exact layer naming under a "roberta."
    # prefix; the architecture differences (position-embedding offset,
    # BPE tokenizer, one token-type row) live in config.position_offset
    # and the tokenizer dispatch, not in the tensor mapping
    for prefix in ("bert.", "roberta.", "albert.", "mpnet.", "distilbert.",
                   "roformer.", "model.", "0.auto_model."):
        if any(k.startswith(prefix + "embeddings") for k in sd):
            # cross-encoder rerankers (BertForSequenceClassification /
            # XLMRobertaForSequenceClassification) keep their scoring
            # head OUTSIDE the backbone prefix — carry it across
            sd = {**{k: v for k, v in sd.items()
                     if k.startswith("classifier.")},
                  **{k[len(prefix):]: v for k, v in sd.items()
                     if k.startswith(prefix)}}
            break
    return _translate_qwen2(_translate_modernbert(_translate_jina(
        _translate_nomic(_translate_mpnet(_translate_albert(
            _translate_distilbert(sd)))))))


# DistilBERT layer-tensor names -> BERT names (the math is identical:
# post-LN encoder, learned positions, erf GELU; it just drops token-type
# embeddings and the pooler, and renames everything)
_DISTIL_LAYER_MAP = {
    "attention.q_lin": "attention.self.query",
    "attention.k_lin": "attention.self.key",
    "attention.v_lin": "attention.self.value",
    "attention.out_lin": "attention.output.dense",
    "sa_layer_norm": "attention.output.LayerNorm",
    "ffn.lin1": "intermediate.dense",
    "ffn.lin2": "output.dense",
    "output_layer_norm": "output.LayerNorm",
}


def _translate_distilbert(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite a DistilBERT state dict into BERT naming; no-op otherwise.

    A zero token-type table is synthesized (DistilBERT has none; adding a
    zeros row keeps embed() shared across both families)."""
    if not any(k.startswith("transformer.layer.") for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("transformer.layer."):
            _, _, i, rest = k.split(".", 3)
            stem, _, leaf = rest.rpartition(".")
            mapped = _DISTIL_LAYER_MAP.get(stem)
            if mapped is None:
                continue
            out[f"encoder.layer.{i}.{mapped}.{leaf}"] = v
        else:
            out[k] = v  # embeddings.* names already match BERT's
    emb = out.get("embeddings.word_embeddings.weight")
    if emb is not None:
        out.setdefault("embeddings.token_type_embeddings.weight",
                       np.zeros((1, emb.shape[1]), np.float32))
    return out


# ALBERT layer-tensor names -> BERT names (same post-LN block structure;
# the single shared layer lands at index 0 and the forward re-applies it
# num_hidden_layers times via config.shared_layers)
_ALBERT_LAYER_MAP = {
    "attention.query": "attention.self.query",
    "attention.key": "attention.self.key",
    "attention.value": "attention.self.value",
    "attention.dense": "attention.output.dense",
    "attention.LayerNorm": "attention.output.LayerNorm",
    "ffn": "intermediate.dense",
    "ffn_output": "output.dense",
    "full_layer_layer_norm": "output.LayerNorm",
}


def _translate_albert(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite an ALBERT state dict into BERT naming (+ the factorized
    embedding projection as embeddings.proj.*); no-op otherwise."""
    pref = "encoder.albert_layer_groups.0.albert_layers.0."
    if not any(k.startswith(pref) for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith(pref):
            stem, _, leaf = k[len(pref):].rpartition(".")
            mapped = _ALBERT_LAYER_MAP.get(stem)
            if mapped is not None:
                out[f"encoder.layer.0.{mapped}.{leaf}"] = v
        elif k.startswith("encoder.albert_layer_groups"):
            # extra groups/inner layers: config.from_hf_dict refuses these
            continue
        elif k.startswith("encoder.embedding_hidden_mapping_in."):
            out["embeddings.proj." + k.rsplit(".", 1)[1]] = v
        else:
            out[k] = v  # embeddings.* names already match BERT's
    return out


# MPNet layer-tensor names -> BERT names (same post-LN block; the only
# architectural delta — the shared relative-attention-bias table — is
# carried as the top-level "rel_bias" param)
_MPNET_LAYER_MAP = {
    "attention.attn.q": "attention.self.query",
    "attention.attn.k": "attention.self.key",
    "attention.attn.v": "attention.self.value",
    "attention.attn.o": "attention.output.dense",
    "attention.LayerNorm": "attention.output.LayerNorm",
    "intermediate.dense": "intermediate.dense",
    "output.dense": "output.dense",
    "output.LayerNorm": "output.LayerNorm",
}


def _translate_mpnet(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite an MPNet state dict into BERT naming (+ the shared
    relative-position-bias table as "rel_bias"); no-op otherwise."""
    if not any(".attention.attn.q." in k for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("encoder.layer."):
            _, _, i, rest = k.split(".", 3)
            stem, _, leaf = rest.rpartition(".")
            mapped = _MPNET_LAYER_MAP.get(stem)
            if mapped is not None:
                out[f"encoder.layer.{i}.{mapped}.{leaf}"] = v
        elif k == "encoder.relative_attention_bias.weight":
            out["rel_bias"] = v  # [num_buckets, num_heads]
        else:
            out[k] = v  # embeddings.* names already match BERT's
    emb = out.get("embeddings.word_embeddings.weight")
    if emb is not None:
        # MPNet has no token-type table; synthesize a zeros row
        out.setdefault("embeddings.token_type_embeddings.weight",
                       np.zeros((1, emb.shape[1]), np.float32))
    return out


# nomic-bert-2048 layer-tensor names -> BERT names. Same post-LN block;
# the fused Wqkv projection is split into q/k/v thirds, and the gated
# MLP's fc11/fc12 land as intermediate.gate / intermediate.dense:
# nomic's forward is fc2(act(fc11(x)) * fc12(x)) (the llama.cpp
# NOMIC_BERT graph maps fc11 -> ffn_gate, fc12 -> ffn_up likewise).
_NOMIC_LAYER_MAP = {
    "attn.out_proj": "attention.output.dense",
    "norm1": "attention.output.LayerNorm",
    "norm2": "output.LayerNorm",
    "mlp.fc11": "intermediate.gate",
    "mlp.fc12": "intermediate.dense",
    "mlp.fc1": "intermediate.dense",
    "mlp.fc2": "output.dense",
}


def _translate_nomic(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite a nomic-bert-2048 state dict into BERT naming; no-op
    otherwise. The fused [3E, out] Wqkv weight splits row-wise into
    query/key/value (nomic stacks them q|k|v along the output axis)."""
    if not any(".attn.Wqkv." in k for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("encoder.layers."):
            _, _, i, rest = k.split(".", 3)
            stem, _, leaf = rest.rpartition(".")
            if stem == "attn.Wqkv":
                E3 = v.shape[0]
                for j, name in enumerate(("query", "key", "value")):
                    out[f"encoder.layer.{i}.attention.self.{name}.{leaf}"] \
                        = v[j * E3 // 3:(j + 1) * E3 // 3]
                continue
            if stem == "mlp.router.layer":
                # nomic-v2-moe router (NomicRouter.layer, bias-free)
                out[f"encoder.layer.{i}.moe.router.{leaf}"] = v
                continue
            if stem in ("mlp.experts.mlp", "mlp.experts"):
                # NomicExpertMLP w1/w2 [E*I, D] and the shared output
                # bias (NomicExperts.bias) — kept in HF layout; the
                # restructure happens in _build_moe_layers
                out[f"encoder.layer.{i}.moe.{leaf}"] = v
                continue
            mapped = _NOMIC_LAYER_MAP.get(stem)
            if mapped is not None:
                out[f"encoder.layer.{i}.{mapped}.{leaf}"] = v
        elif k.startswith("emb_ln."):
            out["embeddings.LayerNorm." + k.split(".", 1)[1]] = v
        else:
            out[k] = v  # embeddings.* names already match BERT's
    return out


_QWEN2_LAYER_MAP = {
    "self_attn.q_proj": "attention.self.query",
    "self_attn.k_proj": "attention.self.key",
    "self_attn.v_proj": "attention.self.value",
    "self_attn.o_proj": "attention.output.dense",
    "input_layernorm": "attention.output.LayerNorm",   # pre-attn norm slot
    "post_attention_layernorm": "output.LayerNorm",    # pre-MLP norm slot
    "mlp.gate_proj": "intermediate.gate",
    "mlp.up_proj": "intermediate.dense",
    "mlp.down_proj": "output.dense",
}


def _translate_qwen2(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite a Qwen2(-family decoder) state dict into BERT naming;
    no-op otherwise. RMSNorms land in the LayerNorm slots (the prenorm
    forward reads them via config.norm_type == "rmsnorm"; zero biases
    are synthesized for stacking uniformity). K/V projections keep
    their GQA width (num_key_value_heads * head_dim). No position
    table, no token-type table (zeros row synthesized), no embedding
    norm; the final RMSNorm lands as the top-level "final_ln"."""
    if not any("self_attn.q_proj" in k for k in sd):
        return sd
    if any(k.startswith("model.") for k in sd):  # Qwen2ForCausalLM dump
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("layers."):
            _, i, rest = k.split(".", 2)
            stem, _, leaf = rest.rpartition(".")
            mapped = _QWEN2_LAYER_MAP.get(stem)
            if mapped is not None:
                out[f"encoder.layer.{i}.{mapped}.{leaf}"] = v
        elif k == "embed_tokens.weight":
            out["embeddings.word_embeddings.weight"] = v
        elif k == "norm.weight":
            out["final_ln.weight"] = v
        # lm_head and rotary inv_freq buffers are dropped
    E = out["embeddings.word_embeddings.weight"].shape[1]
    out.setdefault("embeddings.token_type_embeddings.weight",
                   np.zeros((1, E), np.float32))
    for k in list(out):
        if k.endswith(".weight") and not k.endswith("_embeddings.weight"):
            out.setdefault(k[:-len("weight")] + "bias",
                           np.zeros(out[k].shape[0], np.float32))
    return out


def _translate_modernbert(sd: dict[str, np.ndarray]
                          ) -> dict[str, np.ndarray]:
    """Rewrite a ModernBERT state dict into BERT naming; no-op otherwise.

    ModernBERT (HF modeling_modernbert.py) is biasless throughout
    (attention_bias/mlp_bias/norm_bias all False) — zero biases are
    synthesized so the shared stacking code stays uniform. The fused
    Wqkv [3E, E] splits row-wise q|k|v; the GeGLU Wi [2I, E] splits into
    the activated half (rows 0..I, our "gate") and the multiplier half
    (rows I.., our "up") — HF's ``act(input) * gate`` chunk order.
    Layer 0's attention norm is nn.Identity (the embedding LayerNorm
    directly precedes it): ones/zeros are synthesized here and the
    forward skips it via config.norm_style == "pre" (models/bert.py).
    The final post-stack norm lands as the top-level "final_ln"."""
    if not any(k.startswith("layers.") and ".attn.Wqkv." in k for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    E = sd["embeddings.tok_embeddings.weight"].shape[1]
    zeros_e = np.zeros(E, np.float32)
    norm_map = {"attn_norm": "attention.output.LayerNorm",
                "mlp_norm": "output.LayerNorm"}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    for k, v in sd.items():
        if k.startswith("layers."):
            _, i, rest = k.split(".", 2)
            stem, _, leaf = rest.rpartition(".")
            p = f"encoder.layer.{i}."
            if stem == "attn.Wqkv":
                for j, name in enumerate(("query", "key", "value")):
                    out[p + f"attention.self.{name}.{leaf}"] \
                        = v[j * v.shape[0] // 3:(j + 1) * v.shape[0] // 3]
            elif stem == "attn.Wo":
                out[p + f"attention.output.dense.{leaf}"] = v
            elif stem == "mlp.Wi":
                I = v.shape[0] // 2
                out[p + f"intermediate.gate.{leaf}"] = v[:I]
                out[p + f"intermediate.dense.{leaf}"] = v[I:]
            elif stem == "mlp.Wo":
                out[p + f"output.dense.{leaf}"] = v
            elif stem in norm_map:
                out[p + f"{norm_map[stem]}.{leaf}"] = v
        elif k == "embeddings.tok_embeddings.weight":
            out["embeddings.word_embeddings.weight"] = v
        elif k.startswith("embeddings.norm."):
            out["embeddings.LayerNorm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("final_norm."):
            out["final_ln." + k.rsplit(".", 1)[1]] = v
        else:
            out[k] = v
    out.setdefault("embeddings.token_type_embeddings.weight",
                   np.zeros((1, E), np.float32))
    # biasless model: synthesize zeros for every missing linear/norm bias
    # (HF weights are [out, in]; norms are [out] — bias length = shape[0])
    for k in list(out):
        if k.endswith(".weight") and not k.endswith("_embeddings.weight"):
            out.setdefault(k[:-len("weight")] + "bias",
                           np.zeros(out[k].shape[0], np.float32))
    # layer 0's Identity attention norm: ones/zeros placeholders (the
    # prenorm forward never applies them — ln_apply flag is 0 there)
    for i in range(n_layers):
        p = f"encoder.layer.{i}.attention.output.LayerNorm."
        out.setdefault(p + "weight", np.ones(E, np.float32))
        out.setdefault(p + "bias", zeros_e.copy())
    return out


def _translate_jina(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite a jina-bert-v2 state dict into BERT naming; no-op
    otherwise. Attention tensors already use BERT names; the GLU MLP
    maps as gate/up/down: ``mlp.gated_layers`` [2I, E] (no bias) splits
    row-wise into gate (first I rows) | up (last I rows) — the same
    split llama.cpp's converter applies (gated_layers_w -> ffn_gate,
    gated_layers_v -> ffn_up); later jina revisions ship the halves
    pre-split under those names. ``mlp.wo`` is the down projection and
    ``mlp.layernorm`` the block's output LayerNorm."""
    if not any(".mlp.wo." in k for k in sd):
        return sd
    out: dict[str, np.ndarray] = {}
    leaf_map = {"wo": "output.dense", "layernorm": "output.LayerNorm",
                "gated_layers_w": "intermediate.gate",
                "gated_layers_v": "intermediate.dense",
                # non-GLU jina variants (feed_forward_type "original")
                "up_layer": "intermediate.dense",
                "down_layer": "output.dense"}
    for k, v in sd.items():
        if k.startswith("encoder.layer.") and ".mlp." in k:
            _, _, i, rest = k.split(".", 3)
            stem, _, leaf = rest.rpartition(".")
            name = stem.removeprefix("mlp.")
            if name == "gated_layers":
                I = v.shape[0] // 2
                out[f"encoder.layer.{i}.intermediate.gate.{leaf}"] = v[:I]
                out[f"encoder.layer.{i}.intermediate.dense.{leaf}"] = v[I:]
                continue
            mapped = leaf_map.get(name)
            if mapped is not None:
                out[f"encoder.layer.{i}.{mapped}.{leaf}"] = v
        else:
            out[k] = v  # embeddings.* / attention.* names match BERT's
    # gated_layers has no bias: synthesize zeros so stack_lin is uniform
    # (HF Linear weights are [out, in] — bias length is shape[0])
    for k in list(out):
        if k.endswith((".intermediate.gate.weight",
                       ".intermediate.dense.weight")):
            out.setdefault(k[:-len("weight")] + "bias",
                           np.zeros(out[k].shape[0], np.float32))
    return out


def _build_moe_layers(sd: dict, config: BertConfig, layers: Params,
                      stack_ln, dtype) -> Params:
    """Split an HF-named layer stack into the (dense, moe) half-stacks
    of the nomic-v2-moe interleave (init_params' MoE layout).

    Expert tensors arrive in the HF NomicExpertMLP layout (translated
    by _translate_nomic / gguf_io.read_gguf): per odd layer i,
    ``encoder.layer.{i}.moe.router.weight`` [E, D],
    ``encoder.layer.{i}.moe.w1`` / ``.w2`` [E*I, D] (w1 applied as
    x @ w1_e.T, w2 as h @ w2_e — modeling_hf_nomic_bert NomicExpertMLP),
    and optional shared ``encoder.layer.{i}.moe.bias`` [D].
    """
    NL = config.num_hidden_layers
    if config.shared_layers or NL % 2 or config.moe_every_n_layers != 2:
        raise ValueError("MoE models need an even, non-shared layer "
                         "count with moe_every_n_layers=2")
    moe_idx = list(range(1, NL, 2))
    NLh, Ex = len(moe_idx), config.num_experts
    router_w = jnp.asarray(np.stack([np.ascontiguousarray(
        np.asarray(sd[f"encoder.layer.{i}.moe.router.weight"]).T)
        for i in moe_idx]), jnp.float32)                    # [NLh, D, Ex]
    w1 = np.stack([np.asarray(sd[f"encoder.layer.{i}.moe.w1"])
                   for i in moe_idx])                       # [NLh, Ex*I, D]
    w2 = np.stack([np.asarray(sd[f"encoder.layer.{i}.moe.w2"])
                   for i in moe_idx])
    D = w1.shape[-1]
    I = w1.shape[1] // Ex
    moe_mlp: Params = {
        "router": {"w": router_w},
        # our linear convention is [in, out]: up = w1_e.T, down = w2_e
        "up": {"w": jnp.asarray(np.swapaxes(
                   w1.reshape(NLh, Ex, I, D), -1, -2), dtype),
               "b": jnp.zeros((NLh, Ex, I), dtype)},
        "down": {"w": jnp.asarray(w2.reshape(NLh, Ex, I, D), dtype),
                 "b": jnp.zeros((NLh, Ex, D), dtype)},
        "ln": stack_ln("encoder.layer.{}.output.LayerNorm", moe_idx),
    }
    if f"encoder.layer.{moe_idx[0]}.moe.bias" in sd:
        moe_mlp["bias"] = jnp.asarray(np.stack(
            [np.asarray(sd[f"encoder.layer.{i}.moe.bias"])
             for i in moe_idx]), dtype)

    def take(t, s):
        return jax.tree_util.tree_map(lambda a: a[s], t)

    return {"dense": {"attn": take(layers["attn"], slice(0, None, 2)),
                      "mlp": layers["mlp"]},
            "moe": {"attn": take(layers["attn"], slice(1, None, 2)),
                    "mlp": moe_mlp}}


def from_hf_state_dict(sd: dict[str, np.ndarray], config: BertConfig,
                       dtype=jnp.float32) -> Params:
    """Map a HF BERT state dict to our pytree.

    Equivalent tensor mapping to the reference's loader name map
    (bert.cpp:595-645) and converter skip rules (convert-to-ggml.py:86:
    position_ids and pooler.dense.* are dropped).
    """
    sd = _strip_prefix({k: np.asarray(v) for k, v in sd.items()})
    # ALBERT shares one layer across the depth: store it once (the
    # forward re-applies it num_hidden_layers times)
    NL = 1 if config.shared_layers else config.num_hidden_layers

    def g(name: str) -> np.ndarray:
        return sd[name]

    def lin(name: str) -> np.ndarray:
        # HF Linear stores [out, in]; we store [in, out].
        return np.ascontiguousarray(g(name + ".weight").T)

    emb = {
        "word": jnp.asarray(g("embeddings.word_embeddings.weight"), dtype),
        "token_type": jnp.asarray(g("embeddings.token_type_embeddings.weight"), dtype),
    }
    if "embeddings.LayerNorm.weight" in sd:
        # absent for Qwen2-family decoders (bare token embedding)
        emb["ln"] = _ln(g("embeddings.LayerNorm.weight"),
                        g("embeddings.LayerNorm.bias"))
    if config.position_embedding_type == "absolute":
        emb["position"] = jnp.asarray(
            g("embeddings.position_embeddings.weight"), dtype)
    if "embeddings_project.weight" in sd:
        # RoFormer's factorized-embedding projection name
        sd = {**sd, "embeddings.proj.weight": sd["embeddings_project.weight"],
              "embeddings.proj.bias": sd["embeddings_project.bias"]}
    if "embeddings.proj.weight" in sd:
        # ALBERT factorized-embedding projection [E_emb -> H]
        emb["proj"] = {"w": jnp.asarray(lin("embeddings.proj"), dtype),
                       "b": jnp.asarray(g("embeddings.proj.bias"), dtype)}

    def stack_lin(fmt: str, idx=None):
        idx = range(NL) if idx is None else idx
        w = jnp.asarray(np.stack([np.ascontiguousarray(
            g(fmt.format(i) + ".weight").T) for i in idx]), dtype)
        b = jnp.asarray(np.stack([g(fmt.format(i) + ".bias")
                                  for i in idx]), dtype)
        return {"w": w, "b": b}

    def stack_ln(fmt: str, idx=None):
        idx = range(NL) if idx is None else idx
        return {"scale": jnp.asarray(np.stack([g(fmt.format(i) + ".weight")
                                               for i in idx]), jnp.float32),
                "bias": jnp.asarray(np.stack([g(fmt.format(i) + ".bias")
                                              for i in idx]), jnp.float32)}

    # MoE interleave (nomic-v2-moe): dense FFN tensors exist only at
    # even layers; odd layers carry router/expert tensors instead
    dense_idx = list(range(0, NL, 2)) if config.num_experts else None
    layers = {
        "attn": {
            "q": stack_lin("encoder.layer.{}.attention.self.query"),
            "k": stack_lin("encoder.layer.{}.attention.self.key"),
            "v": stack_lin("encoder.layer.{}.attention.self.value"),
            "o": stack_lin("encoder.layer.{}.attention.output.dense"),
            "ln": stack_ln("encoder.layer.{}.attention.output.LayerNorm"),
        },
        "mlp": {
            "up": stack_lin("encoder.layer.{}.intermediate.dense", dense_idx),
            "down": stack_lin("encoder.layer.{}.output.dense", dense_idx),
            "ln": stack_ln("encoder.layer.{}.output.LayerNorm", dense_idx),
        },
    }
    if "encoder.layer.0.intermediate.gate.weight" in sd:
        # nomic-bert gated MLP: down(act(gate(x)) * up(x))
        layers["mlp"]["gate"] = stack_lin(
            "encoder.layer.{}.intermediate.gate", dense_idx)
    if config.num_experts:
        layers = _build_moe_layers(sd, config, layers, stack_ln, dtype)
    out: Params = {"embeddings": emb, "layers": layers}
    if "rel_bias" in sd:
        # MPNet shared relative-attention-bias table [buckets, heads];
        # stays f32 (tiny, added to f32 attention logits)
        out["rel_bias"] = jnp.asarray(sd["rel_bias"], jnp.float32)
    if config.position_embedding_type == "alibi":
        # jina-bert-v2: slopes are derived from the head count, not
        # stored in the checkpoint; carried as a param so TP's head
        # split shards them alongside q/k/v (parallel/sharding.py)
        from ..ops.alibi import alibi_slopes
        out["alibi_slopes"] = jnp.asarray(
            alibi_slopes(config.num_attention_heads), jnp.float32)
    if "final_ln.weight" in sd:
        # ModernBERT post-stack norm
        out["final_ln"] = _ln(g("final_ln.weight"), g("final_ln.bias"))
    if "classifier.weight" in sd or "classifier.out_proj.weight" in sd:
        # cross-encoder reranker head (models/bert.score_pairs):
        # BERT style = pooler(tanh) -> classifier [num_labels, E]
        # (ms-marco cross-encoders); RoBERTa style = classifier.dense
        # (tanh) -> classifier.out_proj (bge-reranker family). The
        # pooler is only kept when a classifier rides on it — embedding
        # checkpoints drop it, matching the reference's converter
        # (convert-to-ggml.py:86).
        head: Params = {}
        if "classifier.out_proj.weight" in sd:
            head["dense"] = {"w": jnp.asarray(lin("classifier.dense"),
                                              dtype),
                             "b": jnp.asarray(g("classifier.dense.bias"),
                                              dtype)}
            head["out"] = {"w": jnp.asarray(lin("classifier.out_proj"),
                                            dtype),
                           "b": jnp.asarray(g("classifier.out_proj.bias"),
                                            dtype)}
        else:
            if "pooler.dense.weight" in sd:
                head["pooler"] = {"w": jnp.asarray(lin("pooler.dense"),
                                                   dtype),
                                  "b": jnp.asarray(g("pooler.dense.bias"),
                                                   dtype)}
            head["out"] = {"w": jnp.asarray(lin("classifier"), dtype),
                           "b": jnp.asarray(g("classifier.bias"), dtype)}
        out["cls_head"] = head
    return out


def _read_sd(d: Path) -> dict[str, np.ndarray]:
    """One checkpoint dir -> f32 numpy state dict (safetensors or
    pytorch_model.bin)."""
    st = d / "model.safetensors"
    pt = d / "pytorch_model.bin"
    if st.exists():
        from safetensors.numpy import load_file
        return load_file(str(st))
    if pt.exists():
        import torch
        return {k: v.float().numpy()
                for k, v in torch.load(pt, map_location="cpu",
                                       weights_only=True).items()}
    raise FileNotFoundError(f"no checkpoint in {d}")


def _load_st_modules(model_dir: Path, params: Params,
                     config: BertConfig) -> tuple[Params, BertConfig]:
    """Attach the SentenceTransformers module pipeline (modules.json):
    Dense modules (post-pooling projections — distiluse 768->512, LaBSE
    pooler) load as params["st_dense"]["0".."n"] with their activations
    recorded in config.st_dense_acts; a missing Normalize module turns
    embedding normalization OFF (distiluse ships un-normalized).
    Transformer/Pooling modules are already covered (encoder +
    detect_pooling); unknown module types fail loudly."""
    import dataclasses
    mj = model_dir / "modules.json"
    if not mj.exists():
        return params, config
    modules = json.loads(mj.read_text())
    dense, acts, has_norm = {}, [], False
    for m in modules:
        t = m.get("type", "")
        if t.endswith(".Transformer") or t.endswith(".Pooling"):
            continue
        if t.endswith(".Normalize"):
            has_norm = True
            continue
        if t.endswith(".Dense"):
            d = model_dir / m["path"]
            cfg = json.loads((d / "config.json").read_text())
            sd = _read_sd(d)
            w = np.ascontiguousarray(
                np.asarray(sd["linear.weight"], np.float32).T)
            entry = {"w": jnp.asarray(w)}
            if cfg.get("bias", True) and "linear.bias" in sd:
                entry["b"] = jnp.asarray(
                    np.asarray(sd["linear.bias"], np.float32))
            act = cfg.get("activation_function", "")
            acts.append("tanh" if act.endswith("Tanh") else "none")
            dense[str(len(dense))] = entry
            continue
        raise ValueError(
            f"unsupported sentence-transformers module type {t!r} in "
            f"{mj} (supported: Transformer, Pooling, Dense, Normalize)")
    if not dense:
        return params, config
    params = dict(params)
    params["st_dense"] = dense
    config = dataclasses.replace(config, st_dense_acts=tuple(acts),
                                 normalize_embeddings=has_norm)
    return params, config


def load_hf_dir(model_dir: str | Path, dtype=jnp.float32,
                config: BertConfig | None = None) -> tuple[Params, BertConfig]:
    """Load an HF model directory (config.json + model.safetensors or
    pytorch_model.bin), including the SentenceTransformers module
    pipeline (modules.json Dense/Normalize) when present."""
    model_dir = Path(model_dir)
    if config is None:
        config = BertConfig.from_json(model_dir / "config.json")
    sd = _read_sd(model_dir)
    params = from_hf_state_dict(sd, config, dtype)
    return _load_st_modules(model_dir, params, config)


def to_hf_state_dict(params: Params) -> dict[str, np.ndarray]:
    """Inverse of from_hf_state_dict: our pytree -> HF-named f32 arrays
    (linears transposed back to [out, in]). QuantizedTensors are
    dequantized. Used by the ggml .bin writer and for HF export."""
    from ..ops.quant import QuantizedTensor, dequantize

    def dense(x) -> np.ndarray:
        if isinstance(x, QuantizedTensor):
            return np.asarray(dequantize(x), np.float32)
        return np.asarray(x, np.float32)

    emb = params["embeddings"]
    if "proj" in emb:
        raise ValueError(
            "ALBERT-family params (factorized embeddings / shared layers) "
            "have no BERT-named state-dict form — the ggml/GGUF export "
            "formats cannot represent them")
    if "rel_bias" in params:
        raise ValueError(
            "MPNet-family params (relative attention bias) have no "
            "BERT-named state-dict form — the ggml/GGUF export formats "
            "cannot represent them")
    if "alibi_slopes" in params:
        raise ValueError(
            "ALiBi-family params (jina-bert-v2) have no BERT-named "
            "state-dict form — the ggml/GGUF export formats cannot "
            "represent them")
    if "st_dense" in params:
        raise ValueError(
            "sentence-transformers Dense modules (post-pooling "
            "projections) have no BERT-named state-dict form — the "
            "ggml/GGUF export formats cannot represent them")
    if "position" not in emb or "gate" in params["layers"].get("mlp", {}):
        raise ValueError(
            "rotary / gated-MLP params (RoFormer, nomic-bert) have no "
            "BERT-named state-dict form — the ggml/GGUF export formats "
            "cannot represent them")
    sd: dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": dense(emb["word"]),
        "embeddings.position_embeddings.weight": dense(emb["position"]),
        "embeddings.token_type_embeddings.weight": dense(emb["token_type"]),
        "embeddings.LayerNorm.weight": dense(emb["ln"]["scale"]),
        "embeddings.LayerNorm.bias": dense(emb["ln"]["bias"]),
    }
    layers = params["layers"]
    NL = len(dense(layers["attn"]["ln"]["scale"]))

    def put_lin(fmt: str, v: dict) -> None:
        w = dense(v["w"])   # [NL, in, out]
        b = dense(v["b"])
        for i in range(NL):
            sd[fmt.format(i) + ".weight"] = np.ascontiguousarray(w[i].T)
            sd[fmt.format(i) + ".bias"] = b[i]

    def put_ln(fmt: str, v: dict) -> None:
        s, b = dense(v["scale"]), dense(v["bias"])
        for i in range(NL):
            sd[fmt.format(i) + ".weight"] = s[i]
            sd[fmt.format(i) + ".bias"] = b[i]

    put_lin("encoder.layer.{}.attention.self.query", layers["attn"]["q"])
    put_lin("encoder.layer.{}.attention.self.key", layers["attn"]["k"])
    put_lin("encoder.layer.{}.attention.self.value", layers["attn"]["v"])
    put_lin("encoder.layer.{}.attention.output.dense", layers["attn"]["o"])
    put_ln("encoder.layer.{}.attention.output.LayerNorm", layers["attn"]["ln"])
    put_lin("encoder.layer.{}.intermediate.dense", layers["mlp"]["up"])
    put_lin("encoder.layer.{}.output.dense", layers["mlp"]["down"])
    put_ln("encoder.layer.{}.output.LayerNorm", layers["mlp"]["ln"])
    return sd


# ---------------------------------------------------------------------------
# Quantization over the pytree
# ---------------------------------------------------------------------------

def pack_q4_params(params: Params) -> Params:
    """Pack every int8-coded q4 matmul weight to the 4-bit nibble layout
    (quant.pack_q4; no-op for other leaves). Applied by load_model for q4
    dtypes so HBM weight footprint/bandwidth matches the true 4-bit size."""
    return jax.tree_util.tree_map(
        lambda x: pack_q4(x) if isinstance(x, QuantizedTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def unpack_q4_params(params: Params) -> Params:
    """Inverse of pack_q4_params: back to int8 codes. Mesh engines need
    this — tensor-parallel shards of the group-64 packed layout are only
    valid when each shard keeps whole 32-packed-row groups, which small
    models' TP factors break."""
    from ..ops.quant import codes_int8

    def unpack(x):
        if isinstance(x, QuantizedTensor) and x.packed:
            return QuantizedTensor(jnp.asarray(codes_int8(x)), x.scales,
                                   x.mins, x.kind, x.block_axis,
                                   packed=False)
        return x

    return jax.tree_util.tree_map(
        unpack, params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def quantize_params(params: Params, kind: str, *,
                    quantize_embeddings: bool = True,
                    pack4: bool = False) -> Params:
    """Quantize all 2-D matmul weights (+ the word-embedding table).

    Same selection rule as the reference (quantize.cpp:154-167: 2-D tensors
    named *.weight); biases and LayerNorms stay f32. Position/token-type
    tables are tiny and remain dense f32 (the reference quantizes them too —
    harmless either way for the Δ-vs-f16 budget; we keep them dense to skip
    two dequant-gathers per step).
    """
    from ..ops.quant import dequantize
    if kind in DENSE_KINDS:
        return cast_params(params, kind)
    assert kind in QUANT_KINDS, kind

    def qt(x, block_axis=-2):
        if isinstance(x, QuantizedTensor):
            # re-quantization (cmd_quantize on an already-quantized
            # checkpoint): go through dense f32 first
            x = dequantize(x)
        return quantize(np.asarray(x, np.float32), kind,
                        block_axis=block_axis, pack4=pack4)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    emb = dict(out["embeddings"])
    if quantize_embeddings:
        emb["word"] = qt(params["embeddings"]["word"], block_axis=-1)
    out["embeddings"] = emb

    def quantize_linears(d):
        return {k: ({"w": qt(v["w"]), "b": v["b"]}
                    if isinstance(v, dict) and "w" in v else v)
                for k, v in d.items()}

    if "dense" in params["layers"]:
        # MoE interleave: attention + dense-half FFN quantize as usual;
        # the router stays f32 (routing decisions are precision-
        # sensitive and the weight is tiny) and the expert stacks stay
        # dense in their load dtype (per-(layer, expert) 3-D stacks
        # don't fit the stacked-2-D quantized-matmul kernel layout)
        out["layers"] = {
            "dense": {"attn": quantize_linears(
                          params["layers"]["dense"]["attn"]),
                      "mlp": quantize_linears(
                          params["layers"]["dense"]["mlp"])},
            "moe": {"attn": quantize_linears(
                        params["layers"]["moe"]["attn"]),
                    "mlp": params["layers"]["moe"]["mlp"]},
        }
        return out
    out["layers"] = {
        "attn": quantize_linears(params["layers"]["attn"]),
        "mlp": quantize_linears(params["layers"]["mlp"]),
    }
    return out


def cast_params(params: Params, kind: str) -> Params:
    """Cast matmul weights + embedding tables to f32/bf16/f16; LayerNorm
    params and biases stay f32 (matches the reference's f16 mode,
    convert-to-ggml.py:93-98: only 2-D .weight tensors become f16)."""
    from ..ops.quant import dequantize
    target = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}[kind]

    def cast(path, x):
        name = "/".join(str(p) for p in path)
        if isinstance(x, QuantizedTensor):
            # casting a quantized checkpoint to a dense kind must yield
            # dense weights (re-quantization path), not a silently
            # still-quantized tensor labeled f32
            x = dequantize(x)
        if (x.ndim >= 2 and "ln" not in name and "rel_bias" not in name
                and "router" not in name):
            # router weights stay f32: routing decisions are precision-
            # sensitive and route_topk computes logits in f32 anyway
            return x.astype(target)
        return x

    return jax.tree_util.tree_map_with_path(
        cast, params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def fuse_qkv(params: Params) -> Params:
    """Merge the q/k/v projections into one [E, 3E] matmul (single-device
    optimization: one kernel launch, x read from HBM once). The output
    columns are laid out [q | k | v] (each E wide, heads contiguous) so
    the forward splits by contiguous column slice. Not used with tensor
    parallelism (the concat axis would shard across the q/k/v boundary)."""
    if "dense" in params["layers"]:
        # MoE interleave: fuse each half-stack's attention independently
        out = dict(params)
        out["layers"] = {
            h: {**params["layers"][h],
                "attn": fuse_qkv({"layers": params["layers"][h]}
                                 )["layers"]["attn"]}
            for h in ("dense", "moe")}
        return out
    attn = params["layers"]["attn"]
    if "qkv" in attn:
        return params
    q, k, v = attn["q"], attn["k"], attn["v"]
    if k["b"].shape[-1] != q["b"].shape[-1]:
        # GQA (Qwen2 family): unequal q/k widths — the forward's
        # split-by-thirds contract would break; keep separate projections
        return params

    def cat(xs, axis):
        if isinstance(xs[0], QuantizedTensor):
            assert len({x.packed for x in xs}) == 1
            return QuantizedTensor(
                jnp.concatenate([x.codes for x in xs], axis=axis),
                jnp.concatenate([x.scales for x in xs], axis=axis),
                (jnp.concatenate([x.mins for x in xs], axis=axis)
                 if xs[0].mins is not None else None),
                xs[0].kind, xs[0].block_axis, xs[0].packed)
        return jnp.concatenate(xs, axis=axis)

    fused = {"w": cat([q["w"], k["w"], v["w"]], axis=-1),
             "b": jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)}
    new_attn = {n: x for n, x in attn.items() if n not in ("q", "k", "v")}
    new_attn["qkv"] = fused
    out = dict(params)
    out["layers"] = {"attn": new_attn, "mlp": params["layers"]["mlp"]}
    return out


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Native checkpoint (.npz): flat names -> arrays, QuantizedTensor expanded
# into .codes/.scales/.mins leaves. This is our analogue of the reference's
# ggml .bin format (bert.cpp:434-766) — vocab travels separately.
# ---------------------------------------------------------------------------

def save_native(path: str | Path, params: Params, config: BertConfig) -> None:
    flat: dict[str, np.ndarray] = {}

    def visit(prefix: str, node) -> None:
        if isinstance(node, QuantizedTensor):
            flat[prefix + ".__quant__"] = np.array(
                [node.kind, str(node.block_axis),
                 "1" if node.packed else "0"], dtype=object)
            # packed codes are uint8 nibble pairs; unpacked are int8
            # (explicit cast: jnp.int4 codes would otherwise save as raw
            # void bytes that np.load cannot hand back to JAX)
            codes = np.asarray(node.codes.astype(
                jnp.uint8 if node.packed else jnp.int8))
            flat[prefix + ".codes"] = codes
            flat[prefix + ".scales"] = np.asarray(node.scales)
            if node.mins is not None:
                flat[prefix + ".mins"] = np.asarray(node.mins)
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    visit("", params)
    flat["__config__"] = np.frombuffer(
        json.dumps(config.to_dict()).encode(), dtype=np.uint8)
    np.savez(path, **{k: v for k, v in flat.items()})


def load_native(path: str | Path) -> tuple[Params, BertConfig]:
    data = np.load(path, allow_pickle=True)
    cfg_d = json.loads(bytes(data["__config__"]).decode())
    config = BertConfig(**cfg_d)
    tree: dict[str, Any] = {}
    quants: dict[str, dict] = {}
    for key in data.files:
        if key == "__config__":
            continue
        if key.endswith(".__quant__"):
            base = key[: -len(".__quant__")]
            rec = list(data[key])
            quants.setdefault(base, {})["kind"] = str(rec[0])
            quants[base]["block_axis"] = int(rec[1])
            quants[base]["packed"] = len(rec) > 2 and str(rec[2]) == "1"

            continue
        for suffix in (".codes", ".scales", ".mins"):
            if key.endswith(suffix):
                base = key[: -len(suffix)]
                quants.setdefault(base, {})[suffix[1:]] = data[key]
                break
        else:
            _set_path(tree, key.split("."), jnp.asarray(data[key]))
    for base, q in quants.items():
        qt = QuantizedTensor(
            jnp.asarray(q["codes"]), jnp.asarray(q["scales"]),
            jnp.asarray(q["mins"]) if "mins" in q else None,
            q["kind"], q["block_axis"], q.get("packed", False))
        _set_path(tree, base.split("."), qt)
    return tree, config


def _set_path(tree: dict, path: list[str], value) -> None:
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value
