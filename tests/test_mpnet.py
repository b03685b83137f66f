"""MPNet family: HF-torch numerical parity + end-to-end engine loading.

MPNet (all-mpnet-base-v2, the most-downloaded SentenceTransformers
encoder) = BERT's post-LN block + a T5-style bucketed relative position
bias added to every layer's attention logits from one shared
[num_buckets, heads] table, with RoBERTa's embedding contract
(position offset, no token-type table). Beyond the reference's model
zoo (BERT-family only, bert.cpp:575-647). Attention routes through the
additive-mask einsum path (the fused kernel has no bias operand).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 220
HIDDEN = 64
L_MAX = 66   # usable 64 + offset 2


@pytest.fixture(scope="module")
def hf_mpnet_and_params():
    from transformers import MPNetConfig as HFConfig, MPNetModel
    hf_cfg = HFConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                      num_hidden_layers=3, num_attention_heads=4,
                      intermediate_size=128,
                      max_position_embeddings=L_MAX,
                      relative_attention_num_buckets=32,
                      pad_token_id=1, bos_token_id=0, eos_token_id=2,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = MPNetModel(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def _rand_batch(cfg, B=3, L=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, cfg.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = cfg.pad_token_id  # HF derives positions from pad ids
    return ids, mask


def test_config_mapping():
    cfg = BertConfig.from_hf_dict(dict(
        model_type="mpnet", vocab_size=VOCAB, hidden_size=HIDDEN,
        num_hidden_layers=3, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L_MAX, pad_token_id=1, bos_token_id=0,
        eos_token_id=2, relative_attention_num_buckets=32,
        layer_norm_eps=1e-5))
    assert cfg.position_offset == 2
    assert cfg.relative_attention_num_buckets == 32
    assert cfg.type_vocab_size == 1
    assert (cfg.cls_token_id, cfg.sep_token_id,
            cfg.pad_token_id, cfg.unk_token_id) == (0, 2, 1, 3)


def test_bucket_matches_torch():
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder
    rel = np.arange(-200, 201).reshape(1, -1)
    ref = MPNetEncoder.relative_position_bucket(
        torch.tensor(rel), num_buckets=32, max_distance=128).numpy()
    got = np.asarray(bert._relative_position_bucket(
        jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(got, ref)


def test_rel_bias_param_loaded(hf_mpnet_and_params):
    _, our, cfg = hf_mpnet_and_params
    assert "rel_bias" in our
    assert our["rel_bias"].shape == (32, 4)
    # no token-type table in MPNet: synthesized zeros row
    assert our["embeddings"]["token_type"].shape == (1, HIDDEN)
    assert float(jnp.abs(our["embeddings"]["token_type"]).max()) == 0.0


def test_hidden_states_match_torch(hf_mpnet_and_params):
    model, our, cfg = hf_mpnet_and_params
    ids, mask = _rand_batch(cfg)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=1e-3)


def test_mean_pooled_matches_torch(hf_mpnet_and_params):
    model, our, cfg = hf_mpnet_and_params
    ids, mask = _rand_batch(cfg, seed=3)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)
                      ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (ref_h * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask), pooling="mean",
                                        normalize=True))
    assert (got * ref).sum(-1).min() > 0.99999


def test_quantized_forward_close(hf_mpnet_and_params):
    _, our, cfg = hf_mpnet_and_params
    ids, mask = _rand_batch(cfg, seed=5)
    f32 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    q = P.quantize_params(our, "q4_0")
    assert q["rel_bias"].dtype == jnp.float32  # bias table stays dense
    got = np.asarray(bert.encode_tokens(q, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    assert float((f32 * got).sum(-1).min()) > 0.98


def test_packed_matches_single(hf_mpnet_and_params):
    """Packed rows: per-segment position restart + relative bias from
    those positions must reproduce the single-sentence encodings."""
    _, our, cfg = hf_mpnet_and_params
    s1 = np.array([0, 5, 6, 7, 2], np.int32)
    s2 = np.array([0, 9, 8, 2], np.int32)
    L = 16
    ids = np.full((1, L), cfg.pad_token_id, np.int32)
    ids[0, :5] = s1
    ids[0, 5:9] = s2
    seg = np.full((1, L), -1, np.int32)
    seg[0, :5] = 0
    seg[0, 5:9] = 1
    pos = np.zeros((1, L), np.int32)
    pos[0, :5] = np.arange(5)
    pos[0, 5:9] = np.arange(4)
    pool = np.zeros((1, 2, L), np.float32)
    pool[0, 0, :5] = 1.0 / 5
    pool[0, 1, 5:9] = 1.0 / 4
    packed = np.asarray(bert.encode_packed(
        our, cfg, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(pool)))[0]
    for row, toks in ((0, s1), (1, s2)):
        one = np.asarray(bert.encode_tokens(
            our, cfg, jnp.asarray(toks[None]),
            jnp.ones((1, len(toks)), np.int32), pooling="mean"))[0]
        assert float((packed[row] * one).sum()) > 0.9999


def _write_mpnet_dir(tmp_path, model, hf_cfg):
    """HF-style model directory: config.json + pytorch_model.bin +
    vocab.txt with MPNet's <s>/</s>-style specials."""
    d = tmp_path / "mpnet"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {**hf_cfg.to_dict(), "model_type": "mpnet"}))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    tokens += [c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world", "##ing"]
    assert len(tokens) <= VOCAB
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"do_lower_case": True, "cls_token": "<s>", "sep_token": "</s>",
         "unk_token": "<unk>", "pad_token": "<pad>",
         "mask_token": "<mask>"}))
    return d


def test_engine_end_to_end(hf_mpnet_and_params, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    model, our, cfg = hf_mpnet_and_params
    d = _write_mpnet_dir(tmp_path, model, model.config)
    eng = load_model(d)
    assert eng.config.relative_attention_num_buckets == 32
    assert eng.config.position_offset == 2
    assert eng.tokenizer.cls_id == 0 and eng.tokenizer.sep_id == 2
    texts = ["hello world", "walking", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    # engine path == direct torch forward on the same token ids
    toks = eng.tokenize("hello world")
    ids = np.asarray([toks], np.int32)
    with torch.no_grad():
        ref_h = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ref = ref_h.mean(1)[0]
    ref = ref / np.linalg.norm(ref)
    assert float((emb[0] * ref).sum()) > 0.9999

    # quantized load stays close on the same checkpoint
    emb_q = load_model(d, dtype="q4_0").encode_batch(texts)
    assert float((emb_q * emb).sum(-1).min()) > 0.98


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_forward_matches_single(hf_mpnet_and_params, dp, tp):
    """TP head split: each shard biases exactly its local heads from its
    [buckets, H/tp] rel_bias shard."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    _, our, cfg = hf_mpnet_and_params
    ids, mask = _rand_batch(cfg, B=8, seed=7)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    mesh = make_mesh(dp=dp, tp=tp)
    sp = shard_params(our, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_export_refused(hf_mpnet_and_params):
    _, our, _ = hf_mpnet_and_params
    with pytest.raises(ValueError, match="relative attention"):
        P.to_hf_state_dict(our)
