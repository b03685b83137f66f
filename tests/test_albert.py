"""ALBERT family: HF-torch numerical parity + end-to-end engine loading.

ALBERT = BERT's encoder block with (a) factorized embeddings (tables at
embedding_size, projected to hidden_size) and (b) one parameter-shared
layer applied num_hidden_layers times. Beyond the reference's model zoo
(BERT-family only, bert.cpp:575-647); the shared layer maps naturally
onto our scan-over-layers design (models/bert.py _scan_layers).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 220
E_EMB = 32
HIDDEN = 64


@pytest.fixture(scope="module")
def hf_albert_and_params():
    from transformers import AlbertConfig as HFConfig, AlbertModel
    hf_cfg = HFConfig(vocab_size=VOCAB, embedding_size=E_EMB,
                      hidden_size=HIDDEN, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, type_vocab_size=2,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      classifier_dropout_prob=0.0)
    torch.manual_seed(0)
    model = AlbertModel(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def test_config_mapping():
    cfg = BertConfig.from_hf_dict(dict(
        model_type="albert", vocab_size=VOCAB, embedding_size=E_EMB,
        hidden_size=HIDDEN, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=64,
        type_vocab_size=2))
    assert cfg.embedding_size == E_EMB
    assert cfg.shared_layers
    assert cfg.hidden_act == "gelu_tanh"  # ALBERT default gelu_new
    with pytest.raises(ValueError):
        BertConfig.from_hf_dict(dict(
            model_type="albert", vocab_size=VOCAB, hidden_size=HIDDEN,
            num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=128, num_hidden_groups=2))


def test_params_shape(hf_albert_and_params):
    _, our, cfg = hf_albert_and_params
    assert our["embeddings"]["word"].shape == (VOCAB, E_EMB)
    assert our["embeddings"]["proj"]["w"].shape == (E_EMB, HIDDEN)
    # one stored layer, applied num_hidden_layers times
    assert our["layers"]["mlp"]["up"]["w"].shape[0] == 1


def test_hidden_states_match_torch(hf_albert_and_params):
    model, our, cfg = hf_albert_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(5, VOCAB, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=3e-4, rtol=1e-3)


def test_depth_actually_applied(hf_albert_and_params):
    """Shared-layer scan must run num_hidden_layers times, not once:
    a 1-layer config over the same params gives a different output."""
    _, our, cfg = hf_albert_and_params
    import dataclasses
    ids = jnp.asarray(np.arange(5, 13, dtype=np.int32)[None])
    mask = jnp.ones((1, 8), jnp.int32)
    full = np.asarray(bert.encode_tokens(our, cfg, ids, mask,
                                         return_hidden=True))
    one = np.asarray(bert.encode_tokens(
        our, dataclasses.replace(cfg, num_hidden_layers=1), ids, mask,
        return_hidden=True))
    assert not np.allclose(full, one, atol=1e-3)


def _write_albert_dir(tmp_path, model, hf_cfg):
    from tokenizers import (Tokenizer, models, normalizers,
                            pre_tokenizers, trainers)
    d = tmp_path / "albert"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFKD(), normalizers.Lowercase(),
         normalizers.StripAccents()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=200, show_progress=False,
        special_tokens=["<pad>", "<unk>", "[CLS]", "[SEP]", "[MASK]"],
        unk_token="<unk>")
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "albert shares layers"] * 5,
        trainer)
    tok.save(str(d / "tokenizer.json"))
    return d


def test_engine_end_to_end(hf_albert_and_params, tmp_path):
    pytest.importorskip("tokenizers")
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.tokenizer import UnigramTokenizer
    model, our, cfg = hf_albert_and_params
    d = _write_albert_dir(tmp_path, model, model.config)
    eng = load_model(d)
    assert isinstance(eng.tokenizer, UnigramTokenizer)
    assert eng.config.shared_layers
    assert eng.n_embd == HIDDEN
    texts = ["hello world", "the quick brown fox", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    toks = eng.tokenize("hello world")
    with torch.no_grad():
        h = model(input_ids=torch.tensor([toks])).last_hidden_state.numpy()
    ref = h.mean(1)[0]
    ref = ref / np.linalg.norm(ref)
    assert float((emb[0] * ref).sum()) > 0.9999

    # quantized + packed load works on the shared layer too
    eng_q = load_model(d, dtype="q4_0")
    emb_q = eng_q.encode_batch(texts)
    assert float((emb_q * emb).sum(-1).min()) > 0.98
    # packed token path (several sentences per row)
    emb_p = eng.encode_batch_packed(texts, row_len=32)
    assert float((emb_p * emb).sum(-1).min()) > 0.9999


def test_native_checkpoint_roundtrip(hf_albert_and_params, tmp_path):
    from embeddings_tpu.models import params as P2
    _, our, cfg = hf_albert_and_params
    p = tmp_path / "albert.npz"
    P2.save_native(p, our, cfg)
    loaded, cfg2 = P2.load_native(p)
    assert cfg2.shared_layers and cfg2.embedding_size == E_EMB
    np.testing.assert_array_equal(
        np.asarray(loaded["embeddings"]["proj"]["w"]),
        np.asarray(our["embeddings"]["proj"]["w"]))


def test_ggml_export_refused(hf_albert_and_params):
    _, our, _ = hf_albert_and_params
    with pytest.raises(ValueError, match="ALBERT"):
        P.to_hf_state_dict(our)


def test_dp_mesh_forward_matches_single(hf_albert_and_params):
    """ALBERT params (proj + single stored layer) through the shard_map
    DP mesh path."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from embeddings_tpu.parallel.mesh import make_mesh
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    model, our, cfg = hf_albert_and_params
    vocab = WordPieceVocab.from_tokens(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "ha", "##llo", "welt"])
    tok = WordPieceTokenizer(vocab)
    mesh = make_mesh(tp=1)  # dp = all virtual devices
    texts = ["hallo welt", "welt", "hallo hallo", "welt welt hallo",
             "welt hallo", "hallo", "welt welt", "hallo welt welt"]
    ref = Engine(our, cfg, tok).encode_batch(texts)
    got = Engine(our, cfg, tok, mesh=mesh).encode_batch(texts)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
