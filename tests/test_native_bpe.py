"""Native C++ byte-level BPE vs the Python implementation.

The Python ByteLevelBPETokenizer is itself conformance-tested against
the HF rust `tokenizers` oracle (test_bpe_tokenizer.py); this suite
pins the native scanner/merger (native/bpe.cpp) to it token-for-token,
for BOTH supported pre-tokenization patterns (GPT-2 and Qwen2), so
native -> Python -> rust agreement is transitive.
"""

from __future__ import annotations

import random
import threading

import pytest

from embeddings_tpu.tokenizer import native as N
from embeddings_tpu.tokenizer.bpe import (_GPT2_PATTERN, _QWEN2_PATTERN,
                                          ByteLevelBPETokenizer,
                                          bytes_to_unicode)

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native tokenizer not built")


def make_tok(pattern, **kw):
    alphabet = sorted(set(bytes_to_unicode().values()))
    vocab = {t: i for i, t in enumerate(alphabet)}
    merges = []
    for pair in [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                 ("Ġ", "w"), ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "l"),
                 ("t", "h"), ("th", "e"), ("Ġ", "t"), ("Ġt", "he"),
                 ("1", "2"), ("12", "3"), ("a", "b"), ("ab", "c"),
                 ("Ċ", "Ċ"), ("Ġ", "Ġ"), ("ĠĠ", "ĠĠ"), (".", "."),
                 ("'", "s")]:
        merges.append(pair)
        m = pair[0] + pair[1]
        if m not in vocab:
            vocab[m] = len(vocab)
    return ByteLevelBPETokenizer(vocab, merges, pattern=pattern, **kw)


EDGE_TEXTS = [
    "", " ", "  ", "hello world", "the quick brown fox",
    "  leading and   inner ", "trailing   ",
    "abc 123 'll 'LL don't 'S'T'RE've",
    "tab\there\nnewline\r\n\r\n next", "\n\n\nx", "x\n\n\n",
    " \n mixed \r\n\t tail\t", "...!!?  ok", "a b", "12345", "1 2 3",
    "汉字 mixed テキスト", "emoji 🤖 test", "café naïve",
    "\xa0nbsp ls ps\x85nel", "\x0b\x0c verticals",
    "\x00control\x1fchars", "mixed汉123字abc",
    "'", "''", "'l", "'ll", "Ⅻ ⅻ ①②③",  # Nl / No numerics
    "under_score-dash.dot", "a" * 300, " " * 50, "\n" * 20,
    "\r \n \r\n  \n\r", "word\r\nword", "  \r\n  \r\n",
]


@pytest.mark.parametrize("pattern", [_GPT2_PATTERN, _QWEN2_PATTERN])
@pytest.mark.parametrize("prefix_space", [False, True])
def test_conformance_edges(pattern, prefix_space):
    py = make_tok(pattern, add_prefix_space=prefix_space)
    nt = N.NativeBPETokenizer.wrap(py)
    assert nt is not None
    for t in EDGE_TEXTS:
        assert nt.encode(t) == py.encode(t), repr(t)
        assert nt.encode(t, max_len=8) == py.encode(t, max_len=8), repr(t)


@pytest.mark.parametrize("pattern", [_GPT2_PATTERN, _QWEN2_PATTERN])
def test_conformance_fuzz(pattern):
    py = make_tok(pattern)
    nt = N.NativeBPETokenizer.wrap(py)
    rng = random.Random(7)
    chars = "abcdefgh ABC 123.!?'\t\n\r汉🤖 é\xa0 \x1c"
    for _ in range(3000):
        t = "".join(rng.choice(chars) for _ in range(rng.randint(0, 80)))
        assert nt.encode(t) == py.encode(t), repr(t)


def test_eos_only_style():
    py = make_tok(_QWEN2_PATTERN)
    py.special_style = "eos_only"
    nt = N.NativeBPETokenizer.wrap(py)
    got = nt.encode("hello world")
    assert got == py.encode("hello world")
    assert got[-1] == py.sep_id and got[0] != py.cls_id


def test_custom_pattern_not_wrapped():
    py = make_tok(r"\p{L}+|\s+|[^\s\p{L}]+")
    assert N.NativeBPETokenizer.wrap(py) is None


def test_wrap_fast_dispatch():
    from embeddings_tpu.tokenizer import (WordPieceTokenizer,
                                          WordPieceVocab)
    wp = WordPieceTokenizer(WordPieceVocab.from_tokens(
        ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "hello", "##s"]))
    assert isinstance(N.wrap_fast(wp), N.NativeWordPieceTokenizer)
    bpe = make_tok(_GPT2_PATTERN)
    assert isinstance(N.wrap_fast(bpe), N.NativeBPETokenizer)


def test_thread_hammer():
    """Concurrent encodes from many threads must agree with the Python
    path (the object is read-only after construction; scratch buffers
    are per-thread)."""
    py = make_tok(_GPT2_PATTERN)
    nt = N.NativeBPETokenizer.wrap(py)
    texts = EDGE_TEXTS * 8
    want = [py.encode(t) for t in texts]
    errs = []

    def worker():
        for t, w in zip(texts, want):
            if nt.encode(t) != w:
                errs.append(t)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs[:3]


def test_engine_picks_native_bpe(tmp_path):
    """An Engine over a BPE-tokenized model uses the native fast path."""
    import numpy as np
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import Engine
    py = make_tok(_GPT2_PATTERN)
    cfg = BertConfig(vocab_size=max(py.token_to_id.values()) + 1,
                     hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=1)
    eng = Engine(P.init_params(cfg, rng=0), cfg, py,
                 EngineConfig(seq_buckets=(16, 32), max_seq_len=32,
                              batch_size=2, batch_buckets=(1, 2)))
    assert isinstance(eng._fast_tokenizer, N.NativeBPETokenizer)
    assert eng.tokenize("hello world") == py.encode("hello world",
                                                    max_len=32)
    emb = eng.encode_batch(["hello world", "hello world"])
    assert np.allclose(emb[0], emb[1])
