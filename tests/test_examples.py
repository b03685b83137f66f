"""Examples: similarity search index/query logic (sample_dylib.py analogue)
with an in-process tiny engine."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import similarity_search as ss

from embeddings_tpu.config import BertConfig, EngineConfig
from embeddings_tpu.models import params as P
from embeddings_tpu.runtime.engine import Engine
from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab


@pytest.fixture(scope="module")
def engine(small_vocab):
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    params = P.init_params(cfg, rng=0)
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=8,
                      batch_buckets=(1, 2, 4, 8))
    return Engine(params, cfg, tok, ec)


def test_corpus_file_loads():
    texts = ss.load_corpus(ss.DEFAULT_CORPUS)
    assert len(texts) >= 50
    assert all(isinstance(t, str) and t for t in texts)


def test_build_index_and_search(engine):
    texts = ["hello world", "the quick brown fox", "a lazy dog",
             "hello hello world world", "apple banana water"]
    encode = lambda ts, bs: engine.encode_batch(ts, batch_size=bs)
    index = ss.build_index(encode, texts)
    assert index.shape == (len(texts), engine.n_embd)
    np.testing.assert_allclose(np.linalg.norm(index, axis=-1), 1.0, atol=1e-5)

    # query identical to a corpus entry must retrieve it at rank 1, score ~1
    q = engine.encode("the quick brown fox")
    hits = ss.search(index, q, k=3)
    assert hits[0][0] == 1
    assert hits[0][1] == pytest.approx(1.0, abs=1e-4)
    # scores sorted descending
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)


def test_search_k_clamps(engine):
    texts = ["hello", "world"]
    encode = lambda ts, bs: engine.encode_batch(ts, batch_size=bs)
    index = ss.build_index(encode, texts)
    hits = ss.search(index, engine.encode("hello"), k=10)
    assert len(hits) == 2
