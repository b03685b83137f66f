"""RoBERTa family: HF-torch numerical parity + end-to-end engine loading.

The reference supports BERT-family only (its loader refuses anything but
the 16-tensor-per-layer BERT naming, bert.cpp:575-647). RoBERTa reuses
BERT's encoder math; the differences under test here are the position-
embedding offset (padding_idx+1 = 2), the byte-level BPE tokenizer, and
the <s>/</s>/<pad> = 0/2/1 special-token contract.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 262   # 5 specials + 256 byte alphabet + 1 merge product
L_MAX = 66   # max_position_embeddings = usable 64 + offset 2


@pytest.fixture(scope="module")
def hf_roberta_and_params():
    from transformers import RobertaConfig as HFConfig, RobertaModel
    hf_cfg = HFConfig(vocab_size=VOCAB, hidden_size=64, num_hidden_layers=3,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=L_MAX, type_vocab_size=1,
                      pad_token_id=1, bos_token_id=0, eos_token_id=2,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = RobertaModel(hf_cfg).eval()
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
    d = dict(model_type="roberta", vocab_size=VOCAB, hidden_size=64,
             num_hidden_layers=3, num_attention_heads=4,
             intermediate_size=128, max_position_embeddings=L_MAX,
             type_vocab_size=1, pad_token_id=1, bos_token_id=0,
             eos_token_id=2, layer_norm_eps=1e-5)
    cfg = BertConfig.from_hf_dict(d)
    assert cfg.position_offset == 2
    assert (cfg.cls_token_id, cfg.sep_token_id,
            cfg.pad_token_id, cfg.unk_token_id) == (0, 2, 1, 3)
    assert cfg.layer_norm_eps == 1e-5


def test_hidden_states_match_torch(hf_roberta_and_params):
    model, our, cfg = hf_roberta_and_params
    assert cfg.position_offset == 2
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


def test_mean_pooled_matches_torch(hf_roberta_and_params):
    model, our, cfg = hf_roberta_and_params
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


def _write_roberta_dir(tmp_path, model, hf_cfg):
    """HF-style model directory: config.json + pytorch_model.bin +
    vocab.json/merges.txt (byte-level alphabet, a few merges)."""
    from embeddings_tpu.tokenizer.bpe import bytes_to_unicode
    d = tmp_path / "roberta"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {**hf_cfg.to_dict(), "model_type": "roberta"}))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    alphabet = sorted(set(bytes_to_unicode().values()))
    tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + alphabet
    vocab = {t: i for i, t in enumerate(tokens)}
    assert len(vocab) <= VOCAB
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return d


def test_engine_end_to_end(hf_roberta_and_params, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.tokenizer.bpe import ByteLevelBPETokenizer
    model, our, cfg = hf_roberta_and_params
    d = _write_roberta_dir(tmp_path, model, model.config)
    eng = load_model(d)
    assert isinstance(eng.tokenizer, ByteLevelBPETokenizer)
    assert eng.config.position_offset == 2
    assert eng.max_seq_len == 64  # 66 rows - 2 reserved
    texts = ["hello world", "abc", "hello world"]
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


def test_packed_positions_respect_offset(hf_roberta_and_params):
    """Packed rows restart positions per segment; with an offset the
    looked-up rows must be offset+pos (two single-sentence encodings ==
    one packed row of both)."""
    model, our, cfg = hf_roberta_and_params
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
