"""XLM-RoBERTa family: HF-torch parity + end-to-end engine loading with a
Unigram (sentencepiece-style) tokenizer.

XLM-R is RoBERTa's architecture (position offset padding_idx+1, single
token-type row, <s>/</s>/<pad> = 0/2/1) with a Unigram tokenizer — the
family behind multilingual-e5 / paraphrase-multilingual models. Beyond
the reference (WordPiece-only BERT, bert.cpp:199-417).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tokenizers = pytest.importorskip("tokenizers")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import params as P

VOCAB = 300
L_MAX = 66


def _train_unigram(tmp_path):
    from tokenizers import (Tokenizer, models, normalizers,
                            pre_tokenizers, trainers)
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=VOCAB, show_progress=False,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        unk_token="<unk>")
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "multilingual text here",
         "sentence embeddings again"] * 5, trainer)
    tok.save(str(tmp_path / "tokenizer.json"))


@pytest.fixture(scope="module")
def xlmr_dir(tmp_path_factory):
    from transformers import XLMRobertaConfig, XLMRobertaModel
    d = tmp_path_factory.mktemp("xlmr")
    hf_cfg = XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L_MAX, type_vocab_size=1,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg).eval()
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    _train_unigram(d)
    return d, model


def test_config_is_roberta_family():
    cfg = BertConfig.from_hf_dict(dict(
        model_type="xlm-roberta", vocab_size=VOCAB, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L_MAX, type_vocab_size=1, pad_token_id=1))
    assert cfg.position_offset == 2
    assert (cfg.cls_token_id, cfg.sep_token_id, cfg.pad_token_id) == (0, 2, 1)


def test_engine_end_to_end_matches_torch(xlmr_dir):
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.tokenizer import UnigramTokenizer
    d, model = xlmr_dir
    eng = load_model(d)
    assert isinstance(eng.tokenizer, UnigramTokenizer)
    assert eng.config.position_offset == 2
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


def test_tokenizer_specials_flow_into_config(xlmr_dir):
    from embeddings_tpu.runtime.engine import load_model
    d, _ = xlmr_dir
    eng = load_model(d)
    assert eng.tokenizer.pad_id == 1
    assert eng.config.pad_token_id == 1
    assert eng.tokenize("hello")[0] == 0    # <s>
    assert eng.tokenize("hello")[-1] == 2   # </s>
