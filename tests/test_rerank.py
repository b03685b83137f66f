"""Cross-encoder reranking: HF-torch parity + engine end-to-end.

Rerankers score (query, document) pairs with a classification head on
the CLS position — the retrieval-stack companion the embedding
ecosystem expects (llama.cpp ships the same capability). Two published
head styles: BERT (ms-marco cross-encoders: model pooler tanh ->
classifier) and RoBERTa/XLM-R (bge-reranker family: classifier.dense
tanh -> classifier.out_proj). Oracles: the real HF
*ForSequenceClassification forwards.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P

VOCAB = 96
HIDDEN = 64


@pytest.fixture(scope="module")
def hf_bert_reranker():
    from transformers import (BertConfig as HFConfig,
                              BertForSequenceClassification)
    hf = HFConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=128, max_position_embeddings=64,
                  num_labels=1, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0,
                  classifier_dropout=0.0)
    torch.manual_seed(0)
    model = BertForSequenceClassification(hf).eval()
    cfg = BertConfig.from_hf_dict(hf.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


@pytest.fixture(scope="module")
def hf_xlmr_reranker():
    from transformers import (XLMRobertaConfig,
                              XLMRobertaForSequenceClassification)
    hf = XLMRobertaConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=128,
                          max_position_embeddings=66, pad_token_id=1,
                          bos_token_id=0, eos_token_id=2, num_labels=1,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          classifier_dropout=0.0)
    torch.manual_seed(1)
    model = XLMRobertaForSequenceClassification(hf).eval()
    cfg = BertConfig.from_hf_dict(hf.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def _pair_batch(cfg, B=3, L=14, seed=0, with_types=True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, VOCAB, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 9:] = 0
    mask[2, 6:] = 0
    ids[mask == 0] = cfg.pad_token_id
    types = np.zeros((B, L), np.int32)
    if with_types:
        for b in range(B):
            types[b, 5: mask[b].sum()] = 1  # "document" span
    return ids, mask, types


def test_head_loaded(hf_bert_reranker, hf_xlmr_reranker):
    _, bert_p, _ = hf_bert_reranker
    assert "pooler" in bert_p["cls_head"] and "out" in bert_p["cls_head"]
    assert bert_p["cls_head"]["out"]["w"].shape == (HIDDEN, 1)
    _, xlmr_p, _ = hf_xlmr_reranker
    assert "dense" in xlmr_p["cls_head"] and "out" in xlmr_p["cls_head"]


def test_embedding_checkpoints_have_no_head():
    """Plain embedding checkpoints must NOT grow a head (the pooler is
    dropped, matching the reference's converter rule)."""
    from transformers import BertConfig as HFConfig, BertModel
    hf = HFConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                  num_hidden_layers=1, num_attention_heads=4,
                  intermediate_size=64, max_position_embeddings=32)
    torch.manual_seed(0)
    m = BertModel(hf).eval()
    cfg = BertConfig.from_hf_dict(hf.to_dict())
    our = P.from_hf_state_dict({k: v.numpy()
                                for k, v in m.state_dict().items()}, cfg)
    assert "cls_head" not in our


def test_bert_scores_match_torch(hf_bert_reranker):
    model, our, cfg = hf_bert_reranker
    ids, mask, types = _pair_batch(cfg)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                    attention_mask=torch.tensor(np.asarray(mask, np.int64)),
                    token_type_ids=torch.tensor(np.asarray(types, np.int64))
                    ).logits.numpy()[:, 0]
    got = np.asarray(bert.score_pairs(our, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask),
                                      jnp.asarray(types)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_xlmr_scores_match_torch(hf_xlmr_reranker):
    model, our, cfg = hf_xlmr_reranker
    ids, mask, _ = _pair_batch(cfg, seed=2, with_types=False)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(np.asarray(ids, np.int64)),
                    attention_mask=torch.tensor(np.asarray(mask, np.int64))
                    ).logits.numpy()[:, 0]
    got = np.asarray(bert.score_pairs(our, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_quantized_scores_close(hf_xlmr_reranker):
    _, our, cfg = hf_xlmr_reranker
    ids, mask, _ = _pair_batch(cfg, seed=3, with_types=False)
    ref = np.asarray(bert.score_pairs(our, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    q = P.quantize_params(our, "q4_0")
    assert "cls_head" in q  # the head survives quantization (stays dense)
    got = np.asarray(bert.score_pairs(q, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=0.3)


def test_encode_pair_wordpiece():
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(
        ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "hello", "world", "doc"]))
    ids, types = tok.encode_pair("hello world", "doc")
    assert ids == [1, 4, 5, 2, 6, 2]
    assert types == [0, 0, 0, 0, 1, 1]
    # longest_first truncation trims the longer side
    ids2, types2 = tok.encode_pair("hello world hello world", "doc",
                                   max_len=6)
    assert len(ids2) == 6 and ids2[0] == 1 and ids2[-1] == 2
    assert ids2.count(2) == 2 and types2[-2:] == [1, 1]


def test_encode_pair_matches_hf_bert():
    """Pair encoding (ids AND token types) matches HF BertTokenizer's
    text-pair call on a real-vocab fixture."""
    from transformers import BertTokenizerFast
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world", "what", "is", "the", "##ing"]
    import tempfile
    from pathlib import Path
    d = Path(tempfile.mkdtemp())
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")
    hf = BertTokenizerFast(str(d / "vocab.txt"), do_lower_case=True)
    ours = WordPieceTokenizer(WordPieceVocab.from_tokens(tokens))
    for q, doc in [("what is the world", "hello world testing"),
                   ("hello", "abc def"), ("", "doc"), ("q", "")]:
        ref = hf(q, doc)
        ids, types = ours.encode_pair(q, doc)
        assert ids == ref["input_ids"], (q, doc)
        assert types == ref["token_type_ids"], (q, doc)
        # truncation semantics too
        ref_t = hf(q, doc, truncation=True, max_length=8)
        ids_t, types_t = ours.encode_pair(q, doc, max_len=8)
        assert ids_t == ref_t["input_ids"], (q, doc)
        assert types_t == ref_t["token_type_ids"], (q, doc)


def test_encode_pair_matches_hf_roberta():
    from transformers import RobertaTokenizerFast
    from embeddings_tpu.tokenizer.bpe import (ByteLevelBPETokenizer,
                                              bytes_to_unicode)
    import tempfile
    from pathlib import Path
    alphabet = sorted(set(bytes_to_unicode().values()))
    vocab = {t: i + 5 for i, t in enumerate(alphabet)}
    vocab.update({"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
                  "<mask>": 4})
    d = Path(tempfile.mkdtemp())
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    hf = RobertaTokenizerFast(str(d / "vocab.json"), str(d / "merges.txt"))
    ours = ByteLevelBPETokenizer(vocab, [])
    for q, doc in [("ab", "cd ef"), ("hello", "x")]:
        ref = hf(q, doc)
        ids, _ = ours.encode_pair(q, doc)
        assert ids == ref["input_ids"], (q, doc)


def _write_reranker_dir(tmp_path, model, hf_cfg):
    d = tmp_path / "reranker"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    tokens = ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world", "relevant", "document"]
    assert len(tokens) <= VOCAB
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")
    return d


def test_engine_rerank_end_to_end(hf_bert_reranker, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    model, our, cfg = hf_bert_reranker
    d = _write_reranker_dir(tmp_path, model, model.config)
    eng = load_model(d)
    assert "cls_head" in eng.params
    docs = ["relevant document", "hello world", "abc", "relevant world"]
    scores = eng.rerank("hello relevant", docs)
    assert scores.shape == (4,) and np.isfinite(scores).all()

    # engine path == HF forward on the same pair tokens
    ids, types = eng.tokenizer.encode_pair("hello relevant", docs[0],
                                           max_len=eng.max_seq_len)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids]),
                    token_type_ids=torch.tensor([types])
                    ).logits.numpy()[0, 0]
    np.testing.assert_allclose(scores[0], ref, atol=3e-4, rtol=1e-3)

    # quantized rerank stays close in ranking order on identical input
    sq = load_model(d, dtype="q8_0").rerank("hello relevant", docs)
    assert np.isfinite(sq).all()
    np.testing.assert_allclose(sq, scores, atol=0.3)


def test_engine_rerank_refused_without_head(tmp_path):
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(
        ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "a"]))
    cfg = BertConfig(vocab_size=5, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32)
    eng = Engine(P.init_params(cfg, rng=0), cfg, tok,
                 EngineConfig(seq_buckets=(16,), max_seq_len=16,
                              batch_size=2, batch_buckets=(1, 2)))
    with pytest.raises(ValueError, match="classification head"):
        eng.rerank("q", ["d"])


def test_cli_rerank(hf_bert_reranker, tmp_path):
    import subprocess
    import sys
    model, _, _ = hf_bert_reranker
    d = _write_reranker_dir(tmp_path, model, model.config)
    proc = subprocess.run(
        [sys.executable, "-m", "embeddings_tpu.cli", "rerank",
         "-m", str(d), "-q", "hello relevant", "--format", "json",
         "relevant document", "world"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout)
    assert len(out["results"]) == 2
    scores = [r["relevance_score"] for r in out["results"]]
    assert scores == sorted(scores, reverse=True)
    assert {r["document"] for r in out["results"]} == {
        "relevant document", "world"}
