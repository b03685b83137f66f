"""DistilBERT family support: numerical parity vs HuggingFace torch
DistilBertModel (beyond the reference, which is BERT-only — DistilBERT
powers popular sentence-transformers like multi-qa-distilbert)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P


@pytest.fixture(scope="module")
def hf_distil():
    from transformers import DistilBertConfig, DistilBertModel
    hf_cfg = DistilBertConfig(vocab_size=256, dim=64, n_layers=3,
                              n_heads=4, hidden_dim=128,
                              max_position_embeddings=64,
                              dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    model = DistilBertModel(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def _rand_batch(rng, cfg, B=3, L=12):
    ids = rng.integers(5, cfg.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_config_mapping(hf_distil):
    _, _, cfg = hf_distil
    assert cfg.hidden_size == 64
    assert cfg.num_hidden_layers == 3
    assert cfg.num_attention_heads == 4
    assert cfg.intermediate_size == 128
    assert cfg.type_vocab_size == 1
    assert cfg.hidden_act == "gelu"


def test_hidden_states_match_torch(hf_distil, rng):
    model, our, cfg = hf_distil
    ids, mask = _rand_batch(rng, cfg)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=1e-3)


def test_quantized_cosine(hf_distil, rng):
    _, our, cfg = hf_distil
    ids, mask = _rand_batch(rng, cfg)
    f32 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    q4 = np.asarray(bert.encode_tokens(P.quantize_params(our, "q4_0"), cfg,
                                       jnp.asarray(ids), jnp.asarray(mask)))
    cos = (f32 * q4).sum(-1)
    assert cos.min() > 0.98, cos


def test_load_model_from_distilbert_dir(tmp_path, hf_distil, small_vocab,
                                        rng):
    """End-to-end: an HF DistilBERT directory loads through load_model
    (config.json model_type=distilbert + safetensors + vocab.txt)."""
    model, our, cfg = hf_distil
    from transformers import DistilBertConfig
    d = tmp_path / "distil"
    d.mkdir()
    model.save_pretrained(d)
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    from embeddings_tpu.runtime.engine import load_model
    # vocab_size mismatch between config (256) and vocab.txt is fine for
    # the engine (ids from the tokenizer stay below the table size)
    eng = load_model(d)
    out = eng.encode(["hello world", "the quick brown fox"])
    assert out.shape == (2, cfg.hidden_size)
    assert np.allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)
    # engine output matches the raw forward on the same token ids
    toks = [eng.tokenize(t) for t in ["hello world"]]
    ids = np.zeros((1, 8), np.int32)
    mask = np.zeros((1, 8), np.int32)
    ids[0, : len(toks[0])] = toks[0]
    mask[0, : len(toks[0])] = 1
    direct = np.asarray(bert.encode_tokens(our, eng.config,
                                           jnp.asarray(ids),
                                           jnp.asarray(mask)))
    np.testing.assert_allclose(out[0], direct[0], atol=2e-4)
