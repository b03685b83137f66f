"""Native Unigram (native/unigram.cpp) conformance.

Three oracles, in increasing independence:
 1. the Python UnigramTokenizer (the conformance-tested engine path) on
    fuzzed synthetic vocabs across every config axis (fuse_unk,
    byte_fallback, prepend_scheme, normalizers);
 2. the shared CORPUS/PROMPTS suite with a rust-`tokenizers`-trained
    vocab (the same fixture test_unigram_tokenizer.py uses);
 3. the rust `tokenizers` Unigram pipeline directly (trained vocab +
    NFKC + Metaspace), so native conformance does not merely inherit
    from the Python implementation.

Skips (like the other native-tokenizer suites) when libetok.so isn't
built — tests/conftest.py auto-builds it when `make` is available.
"""

from __future__ import annotations

import json

import pytest

from embeddings_tpu.tokenizer.native import (NativeUnigramTokenizer,
                                             _bind_unigram, _load_lib,
                                             available)
from embeddings_tpu.tokenizer.unigram import SPIECE, UnigramTokenizer

from tests.test_unigram_tokenizer import CORPUS, PROMPTS

pytestmark = pytest.mark.skipif(
    not available() or not _bind_unigram(_load_lib()),
    reason="native tokenizer ext not built (make -C native)")


def _synth_vocab(rng, n=400, byte_pieces=False):
    """Deterministic synthetic vocab: specials, singles (with gaps so
    unk paths trigger), multi-char pieces, optional <0xNN> pieces."""
    letters = "abcdefghijklmnop"
    pieces = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0), ("<pad>", 0.0)]
    pieces += [(SPIECE, -2.0)]
    for c in letters[:12]:  # NOT all singles: m-p only via multi pieces
        pieces.append((c, -float(rng.integers(2, 9))))
        pieces.append((SPIECE + c, -float(rng.integers(2, 9))))
    seen = {p for p, _ in pieces}
    while len(pieces) < n:
        ln = int(rng.integers(2, 7))
        w = "".join(letters[rng.integers(len(letters))] for _ in range(ln))
        if rng.random() < 0.5:
            w = SPIECE + w
        if w not in seen:
            seen.add(w)
            pieces.append((w, -float(rng.uniform(1.0, 14.0))))
    if byte_pieces:
        for b in range(256):
            pieces.append((f"<0x{b:02X}>", -10.0))
    return pieces


def _texts(rng, n=60):
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = ["", " ", "  ", "a", " a", "a ", "aa  bb", "▁manual",
           "你好 mixed", "ligature ﬁne", "emoji \U0001f600 x",
           "péché naïve", "a" * 90]
    for _ in range(n):
        words = []
        for _ in range(int(rng.integers(1, 9))):
            ln = int(rng.integers(1, 11))
            words.append("".join(letters[rng.integers(len(letters))]
                                 for _ in range(ln)))
        out.append(" ".join(words))
    return out


@pytest.mark.parametrize("fuse_unk", [True, False])
@pytest.mark.parametrize("byte_fallback", [False, True])
@pytest.mark.parametrize("prepend", ["always", "never"])
def test_fuzz_matches_python(fuse_unk, byte_fallback, prepend):
    import numpy as np
    rng = np.random.default_rng(hash((fuse_unk, byte_fallback,
                                      prepend)) % 2**31)
    vocab = _synth_vocab(rng, byte_pieces=byte_fallback)
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc",
                          fuse_unk=fuse_unk, byte_fallback=byte_fallback,
                          prepend_scheme=prepend)
    nat = NativeUnigramTokenizer.wrap(py)
    assert nat is not None
    for t in _texts(rng):
        assert nat.tokenize_to_ids(t) == py.tokenize_to_ids(t), repr(t)
        assert nat.encode(t) == py.encode(t), repr(t)
        assert nat.encode(t, max_len=8) == py.encode(t, max_len=8)


def test_duplicate_piece_last_definition_wins():
    vocab = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
             (SPIECE + "ab", -1.0), ("c", -1.0),
             (SPIECE + "ab", -0.5)]  # duplicate string, later id
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="none")
    nat = NativeUnigramTokenizer.wrap(py)
    assert nat.tokenize_to_ids("ab c") == py.tokenize_to_ids("ab c")
    assert 5 in nat.tokenize_to_ids("ab")  # the later id


def test_tie_break_keeps_earliest_start():
    # two segmentations with equal total score: python keeps the one the
    # ascending-start scan found first; native must agree
    vocab = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
             (SPIECE, -1.0), ("a", -1.0), ("aa", -2.0), ("aaa", -3.0)]
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="none")
    nat = NativeUnigramTokenizer.wrap(py)
    for t in ("aaaa", "aaa", "aaaaaaa", "a aa aaa"):
        assert nat.tokenize_to_ids(t) == py.tokenize_to_ids(t), t


def test_corpus_prompts_match_python_trained_vocab():
    """The rust-trained 300-piece vocab + full PROMPTS suite (incl. NFKC
    folds and multi-script), normalizer chain running in Python for both
    paths — bitwise-identical ids."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, \
        pre_tokenizers, trainers
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300, show_progress=False,
        special_tokens=["<unk>", "<s>", "</s>"], unk_token="<unk>")
    tok.train_from_iterator([s.lower() for s in CORPUS] * 5, trainer)
    vocab = [(p, float(s))
             for p, s in json.loads(tok.to_str())["model"]["vocab"]]
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc")
    nat = NativeUnigramTokenizer.wrap(py)
    for t in PROMPTS:
        assert nat.tokenize_to_ids(t) == py.tokenize_to_ids(t), repr(t)


def test_rust_oracle_direct():
    """Independent oracle: the rust Unigram pipeline itself (not via the
    Python implementation) on lowercase prompts."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, \
        pre_tokenizers, trainers
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300, show_progress=False,
        special_tokens=["<unk>", "<s>", "</s>"], unk_token="<unk>")
    tok.train_from_iterator([s.lower() for s in CORPUS] * 5, trainer)
    vocab = [(p, float(s))
             for p, s in json.loads(tok.to_str())["model"]["vocab"]]
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc")
    nat = NativeUnigramTokenizer.wrap(py)
    for t in [s.lower() for s in PROMPTS]:
        assert nat.tokenize_to_ids(t) == tok.encode(t).ids, repr(t)


def test_encode_pair_layout():
    import numpy as np
    rng = np.random.default_rng(3)
    vocab = _synth_vocab(rng)
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc")
    nat = NativeUnigramTokenizer.wrap(py)
    for a, b in [("ab cd", "ef gh"), ("hello", ""), ("x" * 50, "y" * 50)]:
        assert nat.encode_pair(a, b) == py.encode_pair(a, b)
        assert nat.encode_pair(a, b, max_len=16) == \
            py.encode_pair(a, b, max_len=16)


def test_scratch_overflow_regrows():
    import numpy as np
    rng = np.random.default_rng(4)
    vocab = _synth_vocab(rng)
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc")
    nat = NativeUnigramTokenizer.wrap(py)
    long = " ".join("qqq" for _ in range(6000))  # > 8192 ids via unks
    assert nat.tokenize_to_ids(long) == py.tokenize_to_ids(long)


def test_wrap_rejects_non_unigram():
    from embeddings_tpu.tokenizer.wordpiece import (WordPieceTokenizer,
                                                    WordPieceVocab)
    wp = WordPieceTokenizer(WordPieceVocab.from_tokens(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a"]))
    assert NativeUnigramTokenizer.wrap(wp) is None


def test_wrap_fast_dispatches_unigram():
    import numpy as np
    from embeddings_tpu.tokenizer.native import wrap_fast
    vocab = _synth_vocab(np.random.default_rng(5))
    py = UnigramTokenizer(vocab, unk_id=0, normalizer="nfkc")
    fast = wrap_fast(py)
    assert isinstance(fast, NativeUnigramTokenizer)
