"""ModernBERT family: HF-torch numerical parity + end-to-end loading.

ModernBERT (ModernBERT-base behind gte-modernbert-base and nomic's
modernbert-embed-base) is the current-generation encoder: pre-norm
biasless blocks (layer 0's attention norm is an identity), RoPE with
separate global/local thetas, attention alternating global / 128-token
sliding-window (global every 3rd layer), a GeGLU MLP whose Wi packs
act-half|mult-half, and one final norm after the stack. Beyond the
reference's model zoo (BERT-family only, bert.cpp:575-647).
transformers ships ModernBertModel — the oracle is the real HF forward.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 288  # >= 5 specials + the 256-char byte-level alphabet
HIDDEN = 64
HEADS = 4
INTER = 96
NL = 5  # layers 0 and 3 global, 1/2/4 local


@pytest.fixture(scope="module")
def hf_modernbert_and_params():
    from transformers import ModernBertConfig as HFConfig, ModernBertModel
    hf_cfg = HFConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                      num_hidden_layers=NL, num_attention_heads=HEADS,
                      intermediate_size=INTER,
                      max_position_embeddings=64,
                      global_attn_every_n_layers=3, local_attention=8,
                      global_rope_theta=160000.0, local_rope_theta=10000.0,
                      pad_token_id=0, cls_token_id=1, sep_token_id=2,
                      attention_dropout=0.0, mlp_dropout=0.0,
                      embedding_dropout=0.0)
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = ModernBertModel(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
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
    cfg = BertConfig.from_hf_dict(dict(
        model_type="modernbert", vocab_size=VOCAB, hidden_size=HIDDEN,
        num_hidden_layers=NL, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=64,
        global_attn_every_n_layers=3, local_attention=8,
        global_rope_theta=160000.0, local_rope_theta=10000.0,
        norm_eps=1e-5, hidden_activation="gelu", pad_token_id=0,
        cls_token_id=1, sep_token_id=2))
    assert cfg.norm_style == "pre"
    assert cfg.position_embedding_type == "rotary"
    assert not cfg.rotary_interleaved  # HF half-split convention
    assert cfg.rotary_base == 160000.0
    assert cfg.local_rotary_base == 10000.0
    assert cfg.global_attn_every_n_layers == 3
    assert cfg.local_attention_window == 8
    assert cfg.gated_mlp and cfg.hidden_act == "gelu"
    assert cfg.layer_norm_eps == 1e-5
    assert (cfg.cls_token_id, cfg.sep_token_id) == (1, 2)


def test_params_structure(hf_modernbert_and_params):
    _, our, _ = hf_modernbert_and_params
    assert "position" not in our["embeddings"]
    assert "final_ln" in our
    assert our["layers"]["mlp"]["gate"]["w"].shape == (NL, HIDDEN, INTER)
    assert our["layers"]["mlp"]["up"]["w"].shape == (NL, HIDDEN, INTER)
    # biasless model: every synthesized bias is zero
    for grp in ("attn", "mlp"):
        for name, v in our["layers"][grp].items():
            if isinstance(v, dict) and "b" in v:
                assert float(jnp.abs(v["b"]).max()) == 0.0, (grp, name)


def test_wi_split_order(hf_modernbert_and_params):
    """HF's MLP is act(chunk[0]) * chunk[1]: rows 0..I of Wi are the
    activated half (our 'gate'), rows I.. the multiplier (our 'up')."""
    model, our, _ = hf_modernbert_and_params
    wi = model.state_dict()["layers.0.mlp.Wi.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["gate"]["w"][0]), wi[:INTER].T)
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["up"]["w"][0]), wi[INTER:].T)


def test_hidden_states_match_torch(hf_modernbert_and_params):
    """Full-stack parity incl. the sliding-window layers, both RoPE
    thetas, layer-0 identity norm, and the final norm."""
    model, our, cfg = hf_modernbert_and_params
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


def test_window_matters(hf_modernbert_and_params):
    """Sanity that the test exercises locality: zeroing the window bias
    (treating local layers as global) must CHANGE the output."""
    import dataclasses
    _, our, cfg = hf_modernbert_and_params
    ids, mask = _rand_batch(B=1, L=14, seed=2)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    cfg_all_global = dataclasses.replace(cfg, local_attention_window=0)
    got2 = np.asarray(bert.encode_tokens(our, cfg_all_global,
                                         jnp.asarray(ids),
                                         jnp.asarray(mask),
                                         return_hidden=True))
    assert np.abs(got - got2).max() > 1e-3


def test_mean_pooled_matches_torch(hf_modernbert_and_params):
    model, our, cfg = hf_modernbert_and_params
    ids, mask = _rand_batch(seed=3)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                      attention_mask=torch.tensor(np.asarray(mask, np.int64))
                      ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (ref_h * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask), pooling="mean",
                                        normalize=True))
    assert (got * ref).sum(-1).min() > 0.99999


def test_quantized_forward_close(hf_modernbert_and_params):
    _, our, cfg = hf_modernbert_and_params
    ids, mask = _rand_batch(seed=4)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    q = P.quantize_params(our, "q4_0")
    got = np.asarray(bert.encode_tokens(q, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    assert (got * ref).sum(-1).min() > 0.98


def test_packed_matches_single(hf_modernbert_and_params):
    """Packed rows: per-segment positions drive both RoPE tables and the
    window distances; cross-segment pairs masked."""
    _, our, cfg = hf_modernbert_and_params
    s1 = np.array([1, 5, 6, 7, 8, 9, 10, 2], np.int32)  # 8 > window/2
    s2 = np.array([1, 11, 12, 2], np.int32)
    L = 16
    ids = np.zeros((1, L), np.int32)
    ids[0, :8] = s1
    ids[0, 8:12] = s2
    seg = np.full((1, L), -1, np.int32)
    seg[0, :8] = 0
    seg[0, 8:12] = 1
    pos = np.zeros((1, L), np.int32)
    pos[0, :8] = np.arange(8)
    pos[0, 8:12] = np.arange(4)
    pool = np.zeros((1, 2, L), np.float32)
    pool[0, 0, :8] = 1.0 / 8
    pool[0, 1, 8:12] = 1.0 / 4
    packed = np.asarray(bert.encode_packed(
        our, cfg, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(pool)))[0]
    for row, toks in ((0, s1), (1, s2)):
        one = np.asarray(bert.encode_tokens(
            our, cfg, jnp.asarray(toks[None]),
            jnp.ones((1, len(toks)), np.int32), pooling="mean"))[0]
        assert float((packed[row] * one).sum()) > 0.9999


def _write_modernbert_dir(tmp_path, model, hf_cfg):
    """HF-style dir: config.json + pytorch_model.bin + tokenizer.json
    (byte-level BPE with [CLS]-style added_tokens, ModernBERT's
    convention)."""
    from embeddings_tpu.tokenizer.bpe import bytes_to_unicode
    d = tmp_path / "modernbert"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {**hf_cfg.to_dict(), "model_type": "modernbert"}))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    alphabet = sorted(set(bytes_to_unicode().values()))
    specials = ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"]
    vocab = {t: i for i, t in enumerate(specials + alphabet)}
    assert len(vocab) <= VOCAB
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "added_tokens": [{"content": t, "id": vocab[t]} for t in specials],
    }))
    return d


def test_engine_end_to_end(hf_modernbert_and_params, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.tokenizer.bpe import ByteLevelBPETokenizer
    model, our, cfg = hf_modernbert_and_params
    d = _write_modernbert_dir(tmp_path, model, model.config)
    eng = load_model(d)
    assert isinstance(eng.tokenizer, ByteLevelBPETokenizer)
    assert eng.tokenizer.cls_id == 1 and eng.tokenizer.sep_id == 2
    assert eng.config.norm_style == "pre"
    texts = ["hello world", "abc", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    # engine path == direct HF forward on the same token ids
    toks = eng.tokenize("hello world")
    ids = np.asarray([toks], np.int32)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(np.asarray(ids, np.int64))
                      ).last_hidden_state.numpy()
    ref = ref_h.mean(1)[0]
    ref = ref / np.linalg.norm(ref)
    assert float((emb[0] * ref).sum()) > 0.9999

    emb_q = load_model(d, dtype="q4_0").encode_batch(texts)
    assert float((emb_q * emb).sum(-1).min()) > 0.98


def test_fused_window_path_matches_einsum():
    """The sliding-window mask riding the fused bias kernel (zeroed on
    global layers) must reproduce the einsum path (interpret mode)."""
    import functools
    import importlib
    import embeddings_tpu.ops.attention as attn_ops
    # ops/__init__ re-exports the linear *function* under the same name
    # as the module — import the module explicitly
    linmod = importlib.import_module("embeddings_tpu.ops.linear")
    cfg = BertConfig(vocab_size=VOCAB, hidden_size=128,
                     num_hidden_layers=NL, num_attention_heads=4,
                     intermediate_size=96, max_position_embeddings=64,
                     position_embedding_type="rotary",
                     rotary_base=160000.0, local_rotary_base=10000.0,
                     global_attn_every_n_layers=3,
                     local_attention_window=8, gated_mlp=True,
                     norm_style="pre", layer_norm_eps=1e-5,
                     type_vocab_size=1)
    params = P.init_params(cfg, rng=1)
    rng = np.random.default_rng(9)
    ids = rng.integers(5, VOCAB, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 9:] = 0
    ref = np.asarray(bert.encode_tokens(params, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    linmod.set_pallas_mode("always")
    origs = (attn_ops.fused_attention, attn_ops.fused_attention_bias)
    try:
        attn_ops.fused_attention = functools.partial(origs[0],
                                                     interpret=True)
        attn_ops.fused_attention_bias = functools.partial(origs[1],
                                                          interpret=True)
        got = np.asarray(bert.encode_tokens(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    finally:
        attn_ops.fused_attention, attn_ops.fused_attention_bias = origs
        linmod.set_pallas_mode("auto")
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999, cos


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_forward_matches_single(hf_modernbert_and_params, dp, tp):
    """Pre-norm TP: row-parallel o/down with bias-after-psum."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    _, our, cfg = hf_modernbert_and_params
    ids, mask = _rand_batch(B=8, seed=7)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    mesh = make_mesh(dp=dp, tp=tp)
    sp = shard_params(our, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_export_refused(hf_modernbert_and_params):
    _, our, _ = hf_modernbert_and_params
    with pytest.raises(ValueError):
        P.to_hf_state_dict(our)


def test_forward_dispatches_window_kernel():
    """At kernel-supported shapes the prenorm stack must route local
    layers to fused_attention_window and global layers to the plain
    fused kernel (lax.cond traces both)."""
    import functools
    from unittest import mock
    import embeddings_tpu.ops.attention as attn_ops
    import importlib
    linear_mod = importlib.import_module("embeddings_tpu.ops.linear")
    cfg = BertConfig(vocab_size=VOCAB, hidden_size=128,
                     num_hidden_layers=NL, num_attention_heads=4,
                     intermediate_size=96, max_position_embeddings=512,
                     position_embedding_type="rotary",
                     rotary_base=160000.0, local_rotary_base=10000.0,
                     global_attn_every_n_layers=3,
                     local_attention_window=8, gated_mlp=True,
                     norm_style="pre", layer_norm_eps=1e-5,
                     type_vocab_size=1)
    params = P.init_params(cfg, rng=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, VOCAB, (2, 256)),
                      jnp.int32)
    mask = jnp.ones((2, 256), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    calls = {"window": 0, "global": 0}
    ow, og = attn_ops.fused_attention_window, attn_ops.fused_attention

    def spy_w(*a, **kw):
        calls["window"] += 1
        return ow(*a, **kw, interpret=True)

    def spy_g(*a, **kw):
        calls["global"] += 1
        return og(*a, **kw, interpret=True)

    with mock.patch.object(linear_mod, "_use_pallas", lambda: True), \
         mock.patch.object(attn_ops, "fused_attention_window", spy_w), \
         mock.patch.object(attn_ops, "fused_attention", spy_g):
        got = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    assert calls["window"] and calls["global"], calls
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999, cos


def test_cp_refused(hf_modernbert_and_params):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from embeddings_tpu.parallel.context import make_cp_forward, make_mesh_cp
    _, _, cfg = hf_modernbert_and_params
    mesh = make_mesh_cp(dp=1, sp=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="post-LN"):
        make_cp_forward(cfg, mesh)
