"""Rotary position embeddings (RoFormer / nomic-bert-2048 families).

The HF-torch oracle for the interleaved convention is RoFormerModel
(transformers ships it; rotary math at
modeling_roformer.apply_rotary_position_embeddings). The half-split
(GPT-NeoX / nomic) convention is checked against a local numpy
reference, and the nomic state-dict translation against a hand-built
torch forward replicating nomic-bert's block ordering.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import pytest

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.ops.rotary import (apply_rotary, apply_rotary_qkv,
                                       rope_tables)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def np_rotary(x, positions, base, interleaved):
    """Reference rotation of [B, L, H, D] by numpy."""
    B, L, H, D = x.shape
    half = D // 2
    inv = base ** (-np.arange(half) / half)
    ang = positions[:, None] * inv          # [L, half]
    cos, sin = np.cos(ang), np.sin(ang)
    out = np.empty_like(x)
    if interleaved:
        x1, x2 = x[..., 0::2], x[..., 1::2]
        out[..., 0::2] = x1 * cos[None, :, None] - x2 * sin[None, :, None]
        out[..., 1::2] = x2 * cos[None, :, None] + x1 * sin[None, :, None]
    else:
        x1, x2 = x[..., :half], x[..., half:]
        out[..., :half] = x1 * cos[None, :, None] - x2 * sin[None, :, None]
        out[..., half:] = x2 * cos[None, :, None] + x1 * sin[None, :, None]
    return out


@pytest.mark.parametrize("interleaved", [False, True])
def test_apply_rotary_matches_numpy(interleaved, rng):
    B, L, H, D = 2, 16, 3, 32
    x = rng.standard_normal((B, L, H, D)).astype(np.float32)
    pos = np.arange(L)
    cos, sin = rope_tables(jnp.arange(L), D, 10000.0)
    got = np.asarray(apply_rotary(jnp.asarray(x), cos, sin, interleaved))
    ref = np_rotary(x, pos, 10000.0, interleaved)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_apply_rotary_norm_preserving(rng):
    # a rotation: per-token per-head L2 norms are invariant
    x = rng.standard_normal((1, 8, 2, 64)).astype(np.float32)
    cos, sin = rope_tables(jnp.arange(8), 64, 1000.0)
    y = np.asarray(apply_rotary(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_apply_rotary_qkv_rotates_qk_only(rng):
    B, L, H, D = 2, 8, 2, 32
    E = H * D
    qkv = rng.standard_normal((B, L, 3 * E)).astype(np.float32)
    cos, sin = rope_tables(jnp.arange(L), D, 10000.0)
    got = np.asarray(apply_rotary_qkv(jnp.asarray(qkv), cos, sin, H=H, D=D))
    for third, rotated in ((0, True), (1, True), (2, False)):
        part = qkv[..., third * E:(third + 1) * E].reshape(B, L, H, D)
        want = (np_rotary(part, np.arange(L), 10000.0, False)
                if rotated else part)
        np.testing.assert_allclose(
            got[..., third * E:(third + 1) * E].reshape(B, L, H, D),
            want, atol=1e-5)


def _roformer_oracle(rng, L=24, rotary_value=False):
    import torch
    from transformers import RoFormerConfig, RoFormerModel
    hf_cfg = RoFormerConfig(
        vocab_size=256, embedding_size=64, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        rotary_value=rotary_value, hidden_act="gelu")
    torch.manual_seed(0)
    model = RoFormerModel(hf_cfg).eval()
    ids = rng.integers(5, 256, (2, L)).astype(np.int64)
    mask = np.ones((2, L), np.int64)
    mask[1, L - 6:] = 0
    with torch.no_grad():
        out = model(torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return hf_cfg, sd, ids, mask, out.numpy()


def test_roformer_matches_hf_torch(rng):
    """Interleaved rotary end-to-end vs the HF RoFormerModel oracle."""
    hf_cfg, sd, ids, mask, ref = _roformer_oracle(rng)
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.position_embedding_type == "rotary"
    assert cfg.rotary_interleaved
    params = P.from_hf_state_dict(sd, cfg)
    assert "position" not in params["embeddings"]
    got = np.asarray(bert.encode_tokens(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), return_hidden=True))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_roformer_fused_kernel_path_matches_einsum(rng):
    """Rotary q/k feed the fused VMEM attention kernel identically to
    the einsum path (pallas interpret mode on CPU)."""
    from embeddings_tpu.ops.linear import pallas_mode
    hf_cfg, sd, ids, mask, _ = _roformer_oracle(rng, L=32)
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    params = P.from_hf_state_dict(sd, cfg)
    idsj = jnp.asarray(ids, jnp.int32)
    maskj = jnp.asarray(mask, jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, idsj, maskj))
    with pallas_mode("always"):
        got = np.asarray(bert.encode_tokens(params, cfg, idsj, maskj))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_roformer_rotary_value_refused():
    with pytest.raises(ValueError, match="rotary_value"):
        BertConfig.from_hf_dict({"model_type": "roformer",
                                 "rotary_value": True, "vocab_size": 10,
                                 "hidden_size": 8, "num_hidden_layers": 1,
                                 "num_attention_heads": 2,
                                 "intermediate_size": 16})


# ---------------------------------------------------------------------------
# nomic-bert-2048 (half-split rotary + SwiGLU gated MLP)
# ---------------------------------------------------------------------------

NOMIC_HF_DICT = {
    "model_type": "nomic_bert",
    "vocab_size": 96,
    "n_embd": 64, "n_layer": 2, "n_head": 2, "n_inner": 128,
    "n_positions": 64,
    "activation_function": "swiglu",
    "rotary_emb_base": 1000.0, "rotary_emb_fraction": 1.0,
    "rotary_emb_interleaved": False,
    "layer_norm_epsilon": 1e-12,
    "type_vocab_size": 2,
    "prenorm": False,
}


def test_nomic_config_from_hf_dict():
    cfg = BertConfig.from_hf_dict(NOMIC_HF_DICT)
    assert cfg.position_embedding_type == "rotary"
    assert not cfg.rotary_interleaved
    assert cfg.rotary_base == 1000.0
    assert cfg.gated_mlp and cfg.hidden_act == "silu"
    assert cfg.hidden_size == 64 and cfg.intermediate_size == 128
    assert cfg.max_position_embeddings == 64


def test_nomic_prenorm_refused():
    with pytest.raises(ValueError, match="prenorm"):
        BertConfig.from_hf_dict({**NOMIC_HF_DICT, "prenorm": True})
    with pytest.raises(ValueError, match="rotary_emb_fraction"):
        BertConfig.from_hf_dict({**NOMIC_HF_DICT,
                                 "rotary_emb_fraction": 0.5})


def _torch_nomic_forward(sd, cfg, ids, mask):
    """Reference forward replicating nomic-bert-2048's module graph
    (embeddings+emb_ln -> [Wqkv, half-split rope, attn, out_proj, norm1,
    fc2(silu(fc11)*fc12), norm2] x N) in plain torch."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.tensor(v) for k, v in sd.items()}
    ids = torch.tensor(ids)
    B, L = ids.shape
    E, H = cfg["n_embd"], cfg["n_head"]
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
        h = (F.silu(x @ t[p + "mlp.fc11.weight"].T + t[p + "mlp.fc11.bias"])
             * (x @ t[p + "mlp.fc12.weight"].T + t[p + "mlp.fc12.bias"]))
        h = h @ t[p + "mlp.fc2.weight"].T + t[p + "mlp.fc2.bias"]
        x = F.layer_norm(x + h, (E,), t[p + "norm2.weight"],
                         t[p + "norm2.bias"], 1e-12)
    return x.numpy()


def _nomic_state_dict(rng, cfg):
    E, F_, NL = cfg["n_embd"], cfg["n_inner"], cfg["n_layer"]
    V, T = cfg["vocab_size"], cfg["type_vocab_size"]

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
            p + "mlp.fc11.weight": w(F_, E), p + "mlp.fc11.bias": w(F_),
            p + "mlp.fc12.weight": w(F_, E), p + "mlp.fc12.bias": w(F_),
            p + "mlp.fc2.weight": w(E, F_), p + "mlp.fc2.bias": w(E),
        })
    return sd


def test_nomic_matches_torch_reference(rng):
    """State-dict translation + half-split rotary + SwiGLU end-to-end vs
    the plain-torch replication of nomic-bert's block."""
    sd = _nomic_state_dict(rng, NOMIC_HF_DICT)
    ids = rng.integers(5, 96, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[1, 18:] = 0
    ref = _torch_nomic_forward(sd, NOMIC_HF_DICT, ids, mask)

    cfg = BertConfig.from_hf_dict(NOMIC_HF_DICT)
    params = P.from_hf_state_dict(sd, cfg)
    assert "gate" in params["layers"]["mlp"]
    got = np.asarray(bert.encode_tokens(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), return_hidden=True))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_nomic_quantized_cosine(rng):
    """q4_0-quantized nomic forward stays close to f32 (gated-MLP weights
    ride the same quantized kernels)."""
    cfg = BertConfig.from_hf_dict(NOMIC_HF_DICT)
    params = P.init_params(cfg, rng=0)
    ids = jnp.asarray(rng.integers(5, 96, (3, 32)), jnp.int32)
    mask = jnp.ones((3, 32), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    qp = P.quantize_params(params, "q4_0")
    got = np.asarray(bert.encode_tokens(qp, cfg, ids, mask))
    cos = (ref * got).sum(-1)
    assert cos.min() > 0.99


def test_nomic_engine_end_to_end(rng, tmp_path):
    """load_model on a nomic-bert-2048-style HF dir: config translation,
    Wqkv split, WordPiece tokenizer pickup, and an L>512 encode — the
    engine seq bucketing past the learned-position cap that rotary
    removes (max_position_embeddings here is a context cap, not a table
    size)."""
    import json
    from safetensors.numpy import save_file
    from embeddings_tpu.runtime.engine import load_model

    hf = {**NOMIC_HF_DICT, "n_positions": 1024}
    sd = _nomic_state_dict(rng, hf)
    d = tmp_path / "nomic"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf))
    save_file(sd, str(d / "model.safetensors"))
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world", "##ing"]
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")

    eng = load_model(d)
    assert eng.config.position_embedding_type == "rotary"
    assert eng.config.gated_mlp
    assert eng.max_seq_len == 1024
    texts = ["hello world", "walk walking", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    # int8 via the load_model kwarg must KEEP the model-aware context
    # length — the quality evaluators once passed a bare
    # EngineConfig(int8_compute=True), silently truncating long docs to
    # the 512 default and misreporting the int8 mode's long-context
    # quality (round-4 regression)
    eng8 = load_model(d, dtype="q4_0", int8_compute=True)
    assert eng8.engine_config.int8_compute
    assert eng8.max_seq_len == 1024

    # engine path == direct forward on the same tokens
    ids = np.asarray([eng.tokenize("hello world")], np.int32)
    cfg = BertConfig.from_hf_dict(hf)
    params = P.from_hf_state_dict(sd, cfg)
    ref = np.asarray(bert.encode_tokens(
        params, cfg, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids))))[0]
    assert float((emb[0] * ref).sum()) > 0.9999

    # a >512-token input encodes (rotary: no position-table cap); its
    # embedding matches the raw forward on the same truncated ids
    long_text = "hello world " * 300
    toks = eng.tokenize(long_text)
    assert len(toks) > 512
    e_long = eng.encode_batch([long_text])[0]
    ids = np.asarray([toks], np.int32)
    ref = np.asarray(bert.encode_tokens(
        params, cfg, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids))))[0]
    assert float((e_long * ref).sum()) > 0.9999


def test_nomic_long_context_2048(rng):
    """Rotary removes the position-table cap: a 2048-token forward runs
    (tiny dims; CPU einsum path) and mask-invariance holds — padding
    beyond a row's length does not change its embedding."""
    cfg = BertConfig(**{
        "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 2048,
        "position_embedding_type": "rotary", "rotary_base": 1000.0,
        "gated_mlp": True, "hidden_act": "silu", "type_vocab_size": 2})
    params = P.init_params(cfg, rng=0)
    ids = jnp.asarray(rng.integers(5, 64, (1, 2048)), jnp.int32)
    mask = np.zeros((1, 2048), np.int32)
    mask[0, :1500] = 1
    long = np.asarray(bert.encode_tokens(params, cfg, ids,
                                         jnp.asarray(mask)))
    short = np.asarray(bert.encode_tokens(
        params, cfg, ids[:, :1536],
        jnp.asarray(mask[:, :1536])))
    np.testing.assert_allclose(long, short, atol=1e-5)


def test_fused_qkv_einsum_path_single_rotation(rng):
    """Regression: the fused-qkv projection falling through to the
    einsum attention path must rotate q/k exactly once (the rotation
    used to be applied both before the fused-kernel dispatch check and
    at the shared tail). Unit-scale weights so scores are O(1) — tiny
    init weights make softmax near-uniform and hide the bug."""
    from embeddings_tpu.ops.linear import pallas_mode
    import jax
    cfg = BertConfig(vocab_size=96, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=128,
                     max_position_embeddings=64,
                     position_embedding_type="rotary", rotary_base=1000.0)
    p = P.init_params(cfg, rng=0)
    # unit-scale q/k so the rotation visibly moves the scores
    p = jax.tree_util.tree_map_with_path(
        lambda path, a: a * 40.0 if any(
            getattr(k, "key", None) in ("q", "k") for k in path) else a, p)
    x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    rope = rope_tables(jnp.arange(16), cfg.head_dim, cfg.rotary_base)
    layer_sep = jax.tree.map(lambda a: a[0], p["layers"])
    layer_fused = jax.tree.map(lambda a: a[0], P.fuse_qkv(p)["layers"])
    mb = jnp.zeros((2, 1, 1, 16), jnp.float32)
    with pallas_mode("never"):
        c1 = np.asarray(bert.attention_context(layer_sep, cfg, x, mb,
                                               rope=rope))
        c2 = np.asarray(bert.attention_context(layer_fused, cfg, x, mb,
                                               rope=rope))
    np.testing.assert_allclose(c2, c1, atol=2e-4)


def test_nomic_fuse_qkv_and_packed_consistent(rng):
    """fuse_qkv keeps rotary numerics; the packed (segmented) path with
    per-segment position restarts matches per-sentence encodes."""
    cfg = BertConfig.from_hf_dict({**NOMIC_HF_DICT, "n_positions": 128})
    params = P.init_params(cfg, rng=0)
    ids = jnp.asarray(rng.integers(5, 96, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    got = np.asarray(bert.encode_tokens(P.fuse_qkv(params), cfg, ids, mask))
    # fused-qkv matmul changes the accumulation split vs separate q/k/v
    np.testing.assert_allclose(got, ref, atol=1e-4)
