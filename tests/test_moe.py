"""Mixture-of-experts FFN (nomic-embed-text-v2-moe family).

The reference engine is dense-only; the MoE semantics anchored here are
the HF nomic-bert-moe modeling code (NomicRouter: softmax over all
experts then top-k, no renormalization; NomicExpertMLP: per-expert
w1/w2 with x @ w1_e.T and h @ w2_e; NomicExperts: shared output bias
added once after the combine) and llama.cpp's LLM_ARCH_NOMIC_BERT_MOE
graph (MoE FFN at layers with i % moe_every_n_layers == 1, ungated
GELU everywhere).
"""

from __future__ import annotations

import math
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.ops.moe import moe_ffn, route_topk

try:
    from jax import shard_map
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

MOE_HF_DICT = {
    "model_type": "nomic_bert",
    "vocab_size": 96,
    "n_embd": 64, "n_layer": 4, "n_head": 4, "n_inner": 128,
    "n_positions": 64,
    "activation_function": "gelu",
    "rotary_emb_base": 1000.0, "rotary_emb_fraction": 1.0,
    "rotary_emb_interleaved": False,
    "layer_norm_epsilon": 1e-12,
    "type_vocab_size": 2,
    "prenorm": False,
    "num_experts": 4, "moe_top_k": 2, "moe_every_n_layers": 2,
    "moe_normalize_expert_weights": None,
}


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _moe_state_dict(rng, cfg):
    """Synthetic nomic-v2-moe checkpoint in HF naming: dense GELU FFN at
    even layers, router + fused expert stacks at odd layers."""
    E, F_, NL = cfg["n_embd"], cfg["n_inner"], cfg["n_layer"]
    V, T, Ex = cfg["vocab_size"], cfg["type_vocab_size"], cfg["num_experts"]

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"embeddings.word_embeddings.weight": w(V, E),
          "embeddings.token_type_embeddings.weight": w(T, E),
          "emb_ln.weight": 1.0 + w(E), "emb_ln.bias": w(E)}
    for i in range(NL):
        p = f"encoder.layers.{i}."
        sd.update({
            p + "attn.Wqkv.weight": w(3 * E, E),
            p + "attn.Wqkv.bias": w(3 * E),
            p + "attn.out_proj.weight": w(E, E),
            p + "attn.out_proj.bias": w(E),
            p + "norm1.weight": 1.0 + w(E), p + "norm1.bias": w(E),
            p + "norm2.weight": 1.0 + w(E), p + "norm2.bias": w(E),
        })
        if i % 2 == 0:
            sd.update({
                p + "mlp.fc1.weight": w(F_, E), p + "mlp.fc1.bias": w(F_),
                p + "mlp.fc2.weight": w(E, F_), p + "mlp.fc2.bias": w(E),
            })
        else:
            sd.update({
                p + "mlp.router.layer.weight": w(Ex, E),
                p + "mlp.experts.mlp.w1": w(Ex * F_, E),
                p + "mlp.experts.mlp.w2": w(Ex * F_, E),
                p + "mlp.experts.bias": w(E),
            })
    return sd


def _torch_moe_forward(sd, cfg, ids, mask):
    """Plain-torch replication of the nomic-bert-moe block graph."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.tensor(v) for k, v in sd.items()}
    ids = torch.tensor(ids)
    B, L = ids.shape
    E, H, F_ = cfg["n_embd"], cfg["n_head"], cfg["n_inner"]
    Ex, K = cfg["num_experts"], cfg["moe_top_k"]
    D = E // H
    x = F.embedding(ids, t["embeddings.word_embeddings.weight"])
    x = x + t["embeddings.token_type_embeddings.weight"][0]
    x = F.layer_norm(x, (E,), t["emb_ln.weight"], t["emb_ln.bias"], 1e-12)

    half = D // 2
    inv = cfg["rotary_emb_base"] ** (-torch.arange(half).float() / half)
    ang = torch.arange(L).float()[:, None] * inv
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rope(v):  # [B, H, L, D] half-split
        v1, v2 = v[..., :half], v[..., half:]
        return torch.cat([v1 * cos - v2 * sin, v2 * cos + v1 * sin], -1)

    mb = (1.0 - torch.tensor(mask).float()) * -1e9
    for i in range(cfg["n_layer"]):
        p = f"encoder.layers.{i}."
        qkv = x @ t[p + "attn.Wqkv.weight"].T + t[p + "attn.Wqkv.bias"]
        q, k, v = qkv.split(E, dim=-1)
        q = rope(q.view(B, L, H, D).transpose(1, 2))
        k = rope(k.view(B, L, H, D).transpose(1, 2))
        v = v.view(B, L, H, D).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / math.sqrt(D) + mb[:, None, None, :]
        ctx = (F.softmax(s, dim=-1) @ v).transpose(1, 2).reshape(B, L, E)
        ctx = ctx @ t[p + "attn.out_proj.weight"].T \
            + t[p + "attn.out_proj.bias"]
        x = F.layer_norm(x + ctx, (E,), t[p + "norm1.weight"],
                         t[p + "norm1.bias"], 1e-12)
        if i % 2 == 0:
            h = F.gelu(x @ t[p + "mlp.fc1.weight"].T
                       + t[p + "mlp.fc1.bias"])
            h = h @ t[p + "mlp.fc2.weight"].T + t[p + "mlp.fc2.bias"]
        else:
            xt = x.reshape(-1, E)
            scores = (xt @ t[p + "mlp.router.layer.weight"].T).softmax(-1)
            top_w, top_e = scores.topk(K, dim=-1)
            w1 = t[p + "mlp.experts.mlp.w1"].view(Ex, F_, E)
            w2 = t[p + "mlp.experts.mlp.w2"].view(Ex, F_, E)
            out = torch.zeros_like(xt)
            # HF NomicExperts: per selected expert, weighted expert MLP
            for tok in range(xt.shape[0]):
                for j in range(K):
                    e = int(top_e[tok, j])
                    h1 = F.gelu(xt[tok] @ w1[e].T)
                    out[tok] += top_w[tok, j] * (h1 @ w2[e])
            out = out + t[p + "mlp.experts.bias"]
            h = out.reshape(B, L, E)
        x = F.layer_norm(x + h, (E,), t[p + "norm2.weight"],
                         t[p + "norm2.bias"], 1e-12)
    return x.numpy()


def test_moe_config_from_hf_dict():
    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    assert cfg.num_experts == 4 and cfg.moe_top_k == 2
    assert cfg.moe_every_n_layers == 2 and not cfg.moe_normalize_topk
    assert not cfg.gated_mlp and cfg.hidden_act == "gelu"
    assert cfg.position_embedding_type == "rotary"


def test_route_topk_matches_torch(rng):
    import torch

    T_, D, Ex, K = 37, 16, 8, 2
    x = rng.standard_normal((T_, D)).astype(np.float32)
    wr = rng.standard_normal((D, Ex)).astype(np.float32)
    got = np.asarray(route_topk(jnp.asarray(x), jnp.asarray(wr), None,
                                top_k=K))
    scores = torch.tensor(x @ wr).softmax(-1)
    top_w, top_e = scores.topk(K, dim=-1)
    ref = np.zeros((T_, Ex), np.float32)
    for t in range(T_):
        for j in range(K):
            ref[t, int(top_e[t, j])] = float(top_w[t, j])
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # normalized variant sums to 1 over the kept experts
    norm = np.asarray(route_topk(jnp.asarray(x), jnp.asarray(wr), None,
                                 top_k=K, normalize=True))
    np.testing.assert_allclose(norm.sum(-1), 1.0, atol=1e-6)


def test_moe_matches_torch_reference(rng):
    """State-dict translation + (dense, moe) interleave end-to-end vs the
    plain-torch replication of the nomic-v2-moe block."""
    sd = _moe_state_dict(rng, MOE_HF_DICT)
    ids = rng.integers(5, 96, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[1, 18:] = 0
    ref = _torch_moe_forward(sd, MOE_HF_DICT, ids, mask)

    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(sd, cfg)
    assert "dense" in params["layers"] and "moe" in params["layers"]
    got = np.asarray(bert.encode_tokens(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), return_hidden=True))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_moe_single_expert_equals_dense(rng):
    """num_experts=1 / top_k=1 routes every token to the one expert with
    weight exactly 1.0 — the model must match the dense forward built
    from the same weights."""
    E, F_, NL, V = 32, 64, 4, 64
    dense_cfg = BertConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=NL,
        num_attention_heads=2, intermediate_size=F_,
        max_position_embeddings=32)
    dp = P.init_params(dense_cfg, rng=3)
    moe_cfg = BertConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=NL,
        num_attention_heads=2, intermediate_size=F_,
        max_position_embeddings=32, num_experts=1, moe_top_k=1,
        moe_every_n_layers=2)

    def take(t, s):
        return jax.tree_util.tree_map(lambda a: a[s], t)

    odd = take(dp["layers"], slice(1, None, 2))
    NLh = NL // 2
    mp = {
        "embeddings": dp["embeddings"],
        "layers": {
            "dense": take(dp["layers"], slice(0, None, 2)),
            "moe": {"attn": odd["attn"],
                    "mlp": {"router": {"w": jnp.zeros((NLh, E, 1))},
                            "up": {"w": odd["mlp"]["up"]["w"][:, None],
                                   "b": odd["mlp"]["up"]["b"][:, None]},
                            "down": {"w": odd["mlp"]["down"]["w"][:, None],
                                     "b": odd["mlp"]["down"]["b"][:, None]},
                            "ln": odd["mlp"]["ln"]}},
        },
    }
    ids = jnp.asarray(rng.integers(5, V, (3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(dp, dense_cfg, ids, mask))
    got = np.asarray(bert.encode_tokens(mp, moe_cfg, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _single_moe_params(rng, D, I, Ex):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.1)

    return {"router": {"w": w(D, Ex)},
            "up": {"w": w(Ex, D, I), "b": w(Ex, I)},
            "down": {"w": w(Ex, I, D), "b": w(Ex, D)},
            "bias": w(D)}


def test_moe_ffn_expert_parallel_matches_single_device(rng):
    """EP under shard_map (tokens sharded over the expert axis, local
    experts only per shard) reproduces the single-device evaluation."""
    from jax.sharding import Mesh, PartitionSpec as Sp

    D, I, Ex, T_ = 32, 48, 4, 64
    moe = _single_moe_params(rng, D, I, Ex)
    x = jnp.asarray(rng.standard_normal((T_, D)).astype(np.float32))
    ref = np.asarray(moe_ffn(x, moe, top_k=2, act="gelu"))

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("ep",))
    pspecs = {"router": {"w": Sp()},
              "up": {"w": Sp("ep"), "b": Sp("ep")},
              "down": {"w": Sp("ep"), "b": Sp("ep")},
              "bias": Sp()}

    f = shard_map(
        lambda xs, ms: moe_ffn(xs, ms, top_k=2, act="gelu", ep_axis="ep"),
        mesh=mesh, in_specs=(Sp("ep"), pspecs), out_specs=Sp("ep"),
        check_vma=False)
    got = np.asarray(jax.jit(f)(x, moe))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_moe_quantized_keeps_experts_dense(rng):
    """quantize_params on the MoE tree: attention + dense-half FFN
    quantize; router stays f32 and expert stacks stay dense."""
    from embeddings_tpu.ops.quant import QuantizedTensor

    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(_moe_state_dict(rng, MOE_HF_DICT), cfg)
    qp = P.quantize_params(params, "q4_0")
    assert isinstance(qp["layers"]["dense"]["mlp"]["up"]["w"],
                      QuantizedTensor)
    assert isinstance(qp["layers"]["moe"]["attn"]["q"]["w"],
                      QuantizedTensor)
    moe_mlp = qp["layers"]["moe"]["mlp"]
    assert not isinstance(moe_mlp["up"]["w"], QuantizedTensor)
    assert moe_mlp["router"]["w"].dtype == jnp.float32

    ids = jnp.asarray(rng.integers(5, 96, (3, 24)), jnp.int32)
    mask = jnp.ones((3, 24), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    got = np.asarray(bert.encode_tokens(qp, cfg, ids, mask))
    assert (ref * got).sum(-1).min() > 0.99

    # bf16 cast also keeps the router in f32
    bp = P.cast_params(params, "bf16")
    assert bp["layers"]["moe"]["mlp"]["router"]["w"].dtype == jnp.float32
    assert bp["layers"]["moe"]["mlp"]["up"]["w"].dtype == jnp.bfloat16


def test_moe_fuse_qkv(rng):
    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(_moe_state_dict(rng, MOE_HF_DICT), cfg)
    fused = P.fuse_qkv(params)
    assert "qkv" in fused["layers"]["dense"]["attn"]
    assert "qkv" in fused["layers"]["moe"]["attn"]
    ids = jnp.asarray(rng.integers(5, 96, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    got = np.asarray(bert.encode_tokens(fused, cfg, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_moe_engine_end_to_end(rng, tmp_path):
    """load_model on a nomic-v2-moe-style HF dir: config translation,
    MoE restructure, encode + quantized encode."""
    import json
    from safetensors.numpy import save_file
    from embeddings_tpu.runtime.engine import load_model

    sd = _moe_state_dict(rng, MOE_HF_DICT)
    d = tmp_path / "moe"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(MOE_HF_DICT))
    save_file(sd, str(d / "model.safetensors"))
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world"]
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")

    eng = load_model(d)
    assert eng.config.num_experts == 4
    emb = eng.encode_batch(["hello world", "world hello", "hello world"])
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    qeng = load_model(d, dtype="q8_0")
    qemb = qeng.encode_batch(["hello world"])
    assert float((emb[0] * qemb[0]).sum()) > 0.995


def _write_moe_gguf(path, sd, cfg, tokens):
    """Hand-assembled nomic-bert-moe GGUF v3 (f32 tensors) mirroring
    llama.cpp's tensor naming for LLM_ARCH_NOMIC_BERT_MOE."""
    from embeddings_tpu.models.gguf_io import (ALIGNMENT, MAGIC, T_ARRAY,
                                               T_F32, T_STRING, T_U32)
    E, F_, NL, Ex = (cfg["n_embd"], cfg["n_inner"], cfg["n_layer"],
                     cfg["num_experts"])
    tensors: list[tuple[str, np.ndarray]] = [
        ("token_embd.weight", sd["embeddings.word_embeddings.weight"]),
        ("token_types.weight",
         sd["embeddings.token_type_embeddings.weight"]),
        ("token_embd_norm.weight", sd["emb_ln.weight"]),
        ("token_embd_norm.bias", sd["emb_ln.bias"]),
    ]
    for i in range(NL):
        p = f"encoder.layers.{i}."
        b = f"blk.{i}."
        tensors += [
            (b + "attn_qkv.weight", sd[p + "attn.Wqkv.weight"]),
            (b + "attn_qkv.bias", sd[p + "attn.Wqkv.bias"]),
            (b + "attn_output.weight", sd[p + "attn.out_proj.weight"]),
            (b + "attn_output.bias", sd[p + "attn.out_proj.bias"]),
            (b + "attn_output_norm.weight", sd[p + "norm1.weight"]),
            (b + "attn_output_norm.bias", sd[p + "norm1.bias"]),
            (b + "layer_output_norm.weight", sd[p + "norm2.weight"]),
            (b + "layer_output_norm.bias", sd[p + "norm2.bias"]),
        ]
        if i % 2 == 0:
            tensors += [
                (b + "ffn_up.weight", sd[p + "mlp.fc1.weight"]),
                (b + "ffn_up.bias", sd[p + "mlp.fc1.bias"]),
                (b + "ffn_down.weight", sd[p + "mlp.fc2.weight"]),
                (b + "ffn_down.bias", sd[p + "mlp.fc2.bias"]),
            ]
        else:
            # ggml numpy orientations: up_exps [Ex, I, D] = w1 view;
            # down_exps [Ex, D, I] = per-expert transpose of w2 view
            w1 = sd[p + "mlp.experts.mlp.w1"].reshape(Ex, F_, E)
            w2 = sd[p + "mlp.experts.mlp.w2"].reshape(Ex, F_, E)
            tensors += [
                (b + "ffn_gate_inp.weight",
                 sd[p + "mlp.router.layer.weight"]),
                (b + "ffn_up_exps.weight", w1),
                (b + "ffn_down_exps.weight",
                 np.ascontiguousarray(w2.transpose(0, 2, 1))),
            ]
    kv = [
        ("general.architecture", T_STRING, "nomic-bert-moe"),
        ("nomic-bert-moe.block_count", T_U32, NL),
        ("nomic-bert-moe.context_length", T_U32, cfg["n_positions"]),
        ("nomic-bert-moe.embedding_length", T_U32, E),
        ("nomic-bert-moe.feed_forward_length", T_U32, F_),
        ("nomic-bert-moe.attention.head_count", T_U32, cfg["n_head"]),
        ("nomic-bert-moe.rope.freq_base", T_F32,
         cfg["rotary_emb_base"]),
        ("nomic-bert-moe.expert_count", T_U32, Ex),
        ("nomic-bert-moe.expert_used_count", T_U32, cfg["moe_top_k"]),
        ("nomic-bert-moe.moe_every_n_layers", T_U32, 2),
        ("nomic-bert-moe.pooling_type", T_U32, 1),
        ("tokenizer.ggml.tokens", T_ARRAY, tokens),
    ]

    def w_str(f, s):
        raw = s.encode()
        f.write(struct.pack("<Q", len(raw)) + raw)

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", MAGIC, 3, len(tensors), len(kv)))
        for key, vt, v in kv:
            w_str(f, key)
            f.write(struct.pack("<I", vt))
            if vt == T_STRING:
                w_str(f, v)
            elif vt == T_U32:
                f.write(struct.pack("<I", int(v)))
            elif vt == T_F32:
                f.write(struct.pack("<f", float(v)))
            else:  # string array
                f.write(struct.pack("<IQ", T_STRING, len(v)))
                for s in v:
                    w_str(f, s)
        off = 0
        for name, a in tensors:
            w_str(f, name)
            ne = a.shape[::-1]
            f.write(struct.pack("<I", len(ne)))
            f.write(struct.pack(f"<{len(ne)}Q", *ne))
            f.write(struct.pack("<IQ", 0, off))  # GGML_F32
            off += (a.nbytes + ALIGNMENT - 1) // ALIGNMENT * ALIGNMENT
        pad = (-f.tell()) % ALIGNMENT
        f.write(b"\0" * pad)
        for _, a in tensors:
            f.write(np.ascontiguousarray(a, np.float32).tobytes())
            f.write(b"\0" * ((-a.nbytes) % ALIGNMENT))


def test_moe_gguf_read(rng, tmp_path):
    """A hand-built nomic-bert-moe GGUF loads and reproduces the forward
    of the HF-loaded params (shared expert bias zeroed: llama.cpp's
    tensor set doesn't carry it)."""
    from embeddings_tpu.models.gguf_io import load_gguf_model

    sd = _moe_state_dict(rng, MOE_HF_DICT)
    for i in range(1, MOE_HF_DICT["n_layer"], 2):
        sd[f"encoder.layers.{i}.mlp.experts.bias"] = np.zeros(
            MOE_HF_DICT["n_embd"], np.float32)
    tokens = [f"tok{j}" for j in range(MOE_HF_DICT["vocab_size"])]
    path = tmp_path / "moe.gguf"
    _write_moe_gguf(path, sd, MOE_HF_DICT, tokens)

    params, cfg, tok = load_gguf_model(path)
    assert cfg.num_experts == 4 and cfg.moe_top_k == 2
    assert cfg.position_embedding_type == "rotary"
    assert cfg.hidden_act == "gelu" and not cfg.gated_mlp

    ref_cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    ref_p = P.from_hf_state_dict(sd, ref_cfg)
    ids = jnp.asarray(rng.integers(5, 96, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(ref_p, ref_cfg, ids, mask))
    got = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_moe_tp_ep_sharded_forward_matches_single(rng):
    """DP x TP mesh on the MoE model: attention runs Megatron-TP, the
    expert stacks shard over the SAME model axis (EP), one psum per MoE
    layer. Must match the single-device forward."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    from embeddings_tpu.parallel.sharding import param_pspecs
    from embeddings_tpu.parallel.mesh import MODEL_AXIS

    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(_moe_state_dict(rng, MOE_HF_DICT), cfg)
    ids = jnp.asarray(rng.integers(5, 96, (8, 16)), jnp.int32)
    mask = np.ones((8, 16), np.int32)
    mask[3, 10:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))

    for dp, tp in ((4, 2), (2, 4)):
        mesh = make_mesh(dp=dp, tp=tp)
        specs = param_pspecs(params, mesh)
        up_spec = specs["layers"]["moe"]["mlp"]["up"]["w"]
        assert MODEL_AXIS in tuple(up_spec)  # experts really sharded
        sp = shard_params(params, cfg, mesh)
        fwd = make_sharded_forward(cfg, mesh)
        got = np.asarray(fwd(sp, ids, mask))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_moe_tp_expert_replication_fallback(rng):
    """num_experts=3 does not divide tp=2: expert stacks fall back to
    replication (spec check) and the forward stays correct — the
    shape-detected all-experts-local path emits no psum."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    from embeddings_tpu.parallel.sharding import param_pspecs

    hf = {**MOE_HF_DICT, "num_experts": 3}
    cfg = BertConfig.from_hf_dict(hf)
    params = P.from_hf_state_dict(_moe_state_dict(rng, hf), cfg)
    ids = jnp.asarray(rng.integers(5, 96, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))

    mesh = make_mesh(dp=4, tp=2)
    specs = param_pspecs(params, mesh)
    assert tuple(specs["layers"]["moe"]["mlp"]["up"]["w"]) == ()
    sp = shard_params(params, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_moe_quantized_tp_forward(rng):
    """q8_0-quantized MoE model under DP x TP: quantized attention +
    dense-half shards ride the TP kernels while dense expert stacks ride
    EP."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)

    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(_moe_state_dict(rng, MOE_HF_DICT), cfg)
    qp = P.quantize_params(params, "q8_0")
    ids = jnp.asarray(rng.integers(5, 96, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(qp, cfg, ids, mask))

    mesh = make_mesh(dp=4, tp=2)
    sp = shard_params(qp, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_moe_ragged_dispatch_matches_dense_eval(rng):
    """moe_ffn_ragged (lax.ragged_dot grouped matmuls over sorted
    (token, expert) pairs) reproduces the dense-evaluation moe_ffn for
    several (top_k, act, normalize) combinations."""
    from embeddings_tpu.ops.moe import moe_ffn_ragged

    D, I, Ex, T_ = 32, 48, 8, 97
    moe = _single_moe_params(rng, D, I, Ex)
    x = jnp.asarray(rng.standard_normal((T_, D)).astype(np.float32))
    for k, act, norm in ((2, "gelu", False), (1, "gelu", False),
                         (3, "silu", True), (8, "relu", False)):
        ref = np.asarray(moe_ffn(x, moe, top_k=k, act=act,
                                 normalize_topk=norm))
        got = np.asarray(moe_ffn_ragged(x, moe, top_k=k, act=act,
                                        normalize_topk=norm))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_moe_dispatch_config_paths_agree(rng):
    """config.moe_dispatch routes the forward: 'dense' and 'ragged'
    produce the same embeddings (auto = ragged on a single device)."""
    import dataclasses

    sd = _moe_state_dict(rng, MOE_HF_DICT)
    cfg = BertConfig.from_hf_dict(MOE_HF_DICT)
    params = P.from_hf_state_dict(sd, cfg)
    ids = jnp.asarray(rng.integers(5, 96, (3, 24)), jnp.int32)
    mask = jnp.ones((3, 24), jnp.int32)
    outs = {}
    for d in ("dense", "ragged", "auto"):
        c = dataclasses.replace(cfg, moe_dispatch=d)
        outs[d] = np.asarray(bert.encode_tokens(params, c, ids, mask))
    np.testing.assert_allclose(outs["ragged"], outs["dense"], atol=1e-5)
    np.testing.assert_allclose(outs["auto"], outs["ragged"], atol=1e-6)
