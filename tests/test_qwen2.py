"""Qwen2 decoder-embedder family: HF-torch parity + end-to-end loading.

Decoder-based embedders (gte-Qwen2-*-instruct; e5-mistral-style) sit on
the Qwen2/Llama block: RMSNorm pre-norm, grouped-query attention,
SwiGLU, RoPE, causal masking (gte flips it bidirectional via
is_causal=false), last-token pooling, eos-only token wrapping. Beyond
the reference's model zoo (BERT-family only, bert.cpp:575-647).
transformers ships Qwen2Model — the oracle is the real HF forward.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 288
HIDDEN = 64
HEADS = 4
KV_HEADS = 2
INTER = 96
NL = 3

QWEN2_REGEX = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
               r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
               r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")


def qwen2_config_dict(**over):
    d = dict(model_type="qwen2", vocab_size=VOCAB, hidden_size=HIDDEN,
             num_hidden_layers=NL, num_attention_heads=HEADS,
             num_key_value_heads=KV_HEADS, intermediate_size=INTER,
             max_position_embeddings=64, rope_theta=1000000.0,
             rms_norm_eps=1e-6, hidden_act="silu", eos_token_id=2,
             bos_token_id=None, pad_token_id=0)
    d.update(over)
    return d


@pytest.fixture(scope="module")
def hf_qwen2_and_params():
    from transformers import Qwen2Config as HFConfig, Qwen2Model
    hf_cfg = HFConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                      num_hidden_layers=NL, num_attention_heads=HEADS,
                      num_key_value_heads=KV_HEADS,
                      intermediate_size=INTER,
                      max_position_embeddings=64,
                      rope_theta=1000000.0, rms_norm_eps=1e-6,
                      attention_dropout=0.0)
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen2Model(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(qwen2_config_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def _rand_batch(B=3, L=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, VOCAB, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    if B > 1:
        mask[1, 8:] = 0
    if B > 2:
        mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_config_mapping():
    cfg = BertConfig.from_hf_dict(qwen2_config_dict())
    assert cfg.norm_style == "pre" and cfg.norm_type == "rmsnorm"
    assert cfg.causal and cfg.num_key_value_heads == KV_HEADS
    assert cfg.position_embedding_type == "rotary"
    assert cfg.rotary_base == 1000000.0
    assert cfg.gated_mlp and cfg.hidden_act == "silu"
    assert cfg.pooling == "lasttoken"
    assert cfg.layer_norm_eps == 1e-6
    # gte-Qwen2 publishes is_causal=false (bidirectional attention)
    cfg2 = BertConfig.from_hf_dict(qwen2_config_dict(is_causal=False))
    assert not cfg2.causal


def test_params_structure(hf_qwen2_and_params):
    _, our, _ = hf_qwen2_and_params
    emb = our["embeddings"]
    assert "position" not in emb and "ln" not in emb
    assert "final_ln" in our
    D = HIDDEN // HEADS
    assert our["layers"]["attn"]["k"]["w"].shape == (NL, HIDDEN,
                                                     KV_HEADS * D)
    assert our["layers"]["attn"]["q"]["w"].shape == (NL, HIDDEN, HIDDEN)
    # q/k/v biases carried through (HF zero-inits them, so check shape,
    # not magnitude); o/mlp biases synthesized zeros
    assert our["layers"]["attn"]["q"]["b"].shape == (NL, HIDDEN)
    assert our["layers"]["attn"]["k"]["b"].shape == (NL, KV_HEADS * D)
    assert float(jnp.abs(our["layers"]["attn"]["o"]["b"]).max()) == 0.0
    assert float(jnp.abs(our["layers"]["mlp"]["down"]["b"]).max()) == 0.0
    # GQA widths differ: fuse_qkv must refuse
    fused = P.fuse_qkv(our)
    assert "qkv" not in fused["layers"]["attn"]


def test_hidden_states_match_torch(hf_qwen2_and_params):
    """Full-stack parity: RMSNorm, GQA repeat order, causal mask, RoPE
    theta, SwiGLU, final norm."""
    model, our, cfg = hf_qwen2_and_params
    ids, mask = _rand_batch()
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                    attention_mask=torch.tensor(np.asarray(mask, np.int64))
                    ).last_hidden_state.numpy()
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=3e-4, rtol=1e-3)


def test_causal_matters(hf_qwen2_and_params):
    """Sanity: flipping causal off changes the output (the mask is
    live), and position i only sees j <= i when causal."""
    import dataclasses
    _, our, cfg = hf_qwen2_and_params
    ids, mask = _rand_batch(B=1, L=10, seed=2)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    # prefix invariance: changing a LATER token must not change an
    # earlier position's hidden state under causal attention
    ids2 = ids.copy()
    ids2[0, 7] = (ids2[0, 7] + 1) % VOCAB
    got2 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids2),
                                         jnp.asarray(mask),
                                         return_hidden=True))
    np.testing.assert_allclose(got[0, :7], got2[0, :7], atol=1e-5)
    assert np.abs(got[0, 7:] - got2[0, 7:]).max() > 1e-4
    bidir = dataclasses.replace(cfg, causal=False)
    got3 = np.asarray(bert.encode_tokens(our, bidir, jnp.asarray(ids),
                                         jnp.asarray(mask),
                                         return_hidden=True))
    assert np.abs(got - got3).max() > 1e-3


def test_lasttoken_pooling(hf_qwen2_and_params):
    model, our, cfg = hf_qwen2_and_params
    ids, mask = _rand_batch(seed=3)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                      attention_mask=torch.tensor(np.asarray(mask, np.int64))
                      ).last_hidden_state.numpy()
    lens = mask.sum(1)
    ref = np.stack([ref_h[b, lens[b] - 1] for b in range(len(lens))])
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        pooling="lasttoken",
                                        normalize=True))
    assert (got * ref).sum(-1).min() > 0.99999


def test_quantized_forward_close(hf_qwen2_and_params):
    _, our, cfg = hf_qwen2_and_params
    ids, mask = _rand_batch(seed=4)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    q = P.quantize_params(our, "q4_0")
    got = np.asarray(bert.encode_tokens(q, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    # last-token pooling reads ONE position (no mean-pool averaging of
    # quantization noise), so a tiny random-init model sits lower than
    # the 0.98 the mean-pooled families use
    assert (got * ref).sum(-1).min() > 0.95


def test_packed_matches_single(hf_qwen2_and_params):
    """Packed causal rows: the row-global triangular mask restricted to
    a segment equals within-segment causal; lasttoken pool weights."""
    _, our, cfg = hf_qwen2_and_params
    s1 = np.array([5, 6, 7, 8, 2], np.int32)
    s2 = np.array([9, 8, 2], np.int32)
    L = 16
    ids = np.zeros((1, L), np.int32)
    ids[0, :5] = s1
    ids[0, 5:8] = s2
    seg = np.full((1, L), -1, np.int32)
    seg[0, :5] = 0
    seg[0, 5:8] = 1
    pos = np.zeros((1, L), np.int32)
    pos[0, :5] = np.arange(5)
    pos[0, 5:8] = np.arange(3)
    pool = np.zeros((1, 2, L), np.float32)
    pool[0, 0, 4] = 1.0   # lasttoken of each segment
    pool[0, 1, 7] = 1.0
    packed = np.asarray(bert.encode_packed(
        our, cfg, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(pool)))[0]
    for row, toks in ((0, s1), (1, s2)):
        one = np.asarray(bert.encode_tokens(
            our, cfg, jnp.asarray(toks[None]),
            jnp.ones((1, len(toks)), np.int32), pooling="lasttoken"))[0]
        assert float((packed[row] * one).sum()) > 0.9999


def test_forward_dispatches_causal_stream_kernel():
    """At kernel-supported shapes the causal forward must route through
    the streaming kernel's causal mode."""
    from unittest import mock
    import importlib
    import embeddings_tpu.ops.attention as attn_ops
    linear_mod = importlib.import_module("embeddings_tpu.ops.linear")
    cfg = BertConfig.from_hf_dict(qwen2_config_dict(
        hidden_size=128, num_attention_heads=4, num_key_value_heads=2))
    params = P.init_params(cfg, rng=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, VOCAB, (2, 256)),
                      jnp.int32)
    mask = jnp.ones((2, 256), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    calls = []
    orig = attn_ops.fused_attention_stream

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw, interpret=True)

    with mock.patch.object(linear_mod, "_use_pallas", lambda: True), \
         mock.patch.object(attn_ops, "fused_attention_stream", spy):
        got = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    assert calls and all(kw.get("causal") for kw in calls), calls
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999, cos


def _write_qwen2_dir(tmp_path, model):
    """HF-style dir: config.json + pytorch_model.bin + tokenizer.json
    (byte-level BPE with Qwen2's Split regex and <|endoftext|>)."""
    from embeddings_tpu.tokenizer.bpe import bytes_to_unicode
    d = tmp_path / "qwen2"
    d.mkdir()
    alphabet = sorted(set(bytes_to_unicode().values()))
    vocab = {t: i for i, t in enumerate(alphabet)}
    vocab["<|endoftext|>"] = len(vocab)
    eos = vocab["<|endoftext|>"]
    assert len(vocab) <= VOCAB
    (d / "config.json").write_text(json.dumps(
        qwen2_config_dict(eos_token_id=eos, pad_token_id=None)))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": QWEN2_REGEX},
             "behavior": "Isolated"},
            {"type": "ByteLevel", "add_prefix_space": False,
             "use_regex": False},
        ]},
        "added_tokens": [{"content": "<|endoftext|>", "id": eos}],
    }))
    return d


def test_engine_end_to_end(hf_qwen2_and_params, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.tokenizer.bpe import ByteLevelBPETokenizer
    model, our, cfg = hf_qwen2_and_params
    d = _write_qwen2_dir(tmp_path, model)
    eng = load_model(d)
    assert isinstance(eng.tokenizer, ByteLevelBPETokenizer)
    assert eng.tokenizer.special_style == "eos_only"
    assert eng.config.pooling == "lasttoken" and eng.config.causal
    # Qwen2's regex splits digit RUNS into single digits (GPT-2 keeps
    # runs); eos appended, no cls
    toks = eng.tokenize("ab 12")
    assert toks[-1] == eng.tokenizer.sep_id
    assert len(eng.tokenize("123")) == 3 + 1
    texts = ["hello world", "abc", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    ids = np.asarray([eng.tokenize("hello world")], np.int32)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(np.asarray(ids, np.int64))
                      ).last_hidden_state.numpy()
    ref = ref_h[0, -1]
    ref = ref / np.linalg.norm(ref)
    assert float((emb[0] * ref).sum()) > 0.9999

    emb_q = load_model(d, dtype="q4_0").encode_batch(texts)
    assert float((emb_q * emb).sum(-1).min()) > 0.98

    # engine packed path with lasttoken pooling
    emb_p = eng.encode_batch_packed(texts)
    assert float((emb_p * emb).sum(-1).min()) > 0.9999


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
def test_sharded_forward_matches_single(hf_qwen2_and_params):
    """DP-only mesh (GQA K/V with 2 heads cannot head-split at tp=4;
    non-divisible weights replicate — correctness either way)."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    _, our, cfg = hf_qwen2_and_params
    ids, mask = _rand_batch(B=8, seed=7)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    mesh = make_mesh(dp=8, tp=1)
    sp = shard_params(our, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_export_refused(hf_qwen2_and_params):
    _, our, _ = hf_qwen2_and_params
    with pytest.raises(ValueError):
        P.to_hf_state_dict(our)


def test_cp_refused(hf_qwen2_and_params):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from embeddings_tpu.parallel.context import make_cp_forward, make_mesh_cp
    _, _, cfg = hf_qwen2_and_params
    mesh = make_mesh_cp(dp=1, sp=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="post-LN"):
        make_cp_forward(cfg, mesh)
