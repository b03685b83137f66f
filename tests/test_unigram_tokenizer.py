"""Unigram tokenizer conformance vs the HF rust `tokenizers` oracle.

Same offline-oracle method as the WordPiece and BPE conformance tests:
train a real rust Unigram tokenizer (NFKC + Metaspace, the XLM-R-style
pipeline) on a deterministic corpus, serialize to tokenizer.json, load
it with our pure-Python implementation, and diff token ids.
"""

from __future__ import annotations

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from embeddings_tpu.tokenizer.unigram import UnigramTokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "sentence embeddings are useful for retrieval and clustering",
    "unigram language models segment text by likelihood",
    "hello world again and again and again",
    "multilingual models tokenize many scripts",
    "numbers 12345 and symbols # @ % live here too",
    "viterbi decoding finds the best segmentation",
]

PROMPTS = CORPUS + [
    "",
    " ",
    "   ",
    "hello",
    " leading space",
    "trailing space ",
    "double  space",
    "UPPERCASE letters are out of alphabet",
    "xyzzy qwfp unseen words",
    "ligature ﬁne office",        # NFKC folds ﬁ -> fi
    "ﬁ",
    "①②③ numerals",               # NFKC folds circled digits
    "emoji \U0001f600 end",
    "mixed 你好 cjk",
    "a" * 120,
    ("dog " * 50).strip(),
]


@pytest.fixture(scope="module")
def oracle_and_ours(tmp_path_factory):
    from tokenizers import (Tokenizer, models, normalizers,
                            pre_tokenizers, trainers)
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300, show_progress=False,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        unk_token="<unk>")
    tok.train_from_iterator(CORPUS * 5, trainer)
    d = tmp_path_factory.mktemp("unigram_fixture")
    path = d / "tokenizer.json"
    tok.save(str(path))
    ours = UnigramTokenizer.from_tokenizer_json(path)
    return tok, ours


def test_pipeline_config_parsed(oracle_and_ours):
    _, ours = oracle_and_ours
    assert ours.normalizer == "nfkc"
    assert ours.prepend_scheme == "always"
    assert ours.unk_id_model == 3
    assert (ours.cls_id, ours.pad_id, ours.sep_id) == (0, 1, 2)


def test_conformance_prompts(oracle_and_ours):
    oracle, ours = oracle_and_ours
    bad = []
    for p in PROMPTS:
        ref = oracle.encode(p).ids
        got = ours.tokenize_to_ids(p)
        if ref != got:
            bad.append((p, ref, got, oracle.encode(p).tokens))
    assert not bad, bad[:3]


def test_conformance_random(oracle_and_ours):
    oracle, ours = oracle_and_ours
    rng = np.random.default_rng(11)
    chars = np.array(list("etaoin shrdlu xyzq. 0129"))
    for _ in range(300):
        n = int(rng.integers(0, 50))
        s = "".join(rng.choice(chars, size=n))
        assert oracle.encode(s).ids == ours.tokenize_to_ids(s), repr(s)


def test_conformance_random_unicode(oracle_and_ours):
    oracle, ours = oracle_and_ours
    rng = np.random.default_rng(13)
    for _ in range(150):
        n = int(rng.integers(1, 25))
        cps = rng.integers(0x20, 0x3000, size=n)
        s = "".join(chr(c) for c in cps if not (0xD800 <= c <= 0xDFFF))
        assert oracle.encode(s).ids == ours.tokenize_to_ids(s), repr(s)


def test_encode_contract(oracle_and_ours):
    _, ours = oracle_and_ours
    ids = ours.encode("hello dog")
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id
    t = ours.encode("the quick brown fox jumps over it", max_len=6)
    assert len(t) == 6 and t[-1] == ours.sep_id
    with pytest.raises(ValueError):
        ours.encode("x", max_len=1)


def test_decode(oracle_and_ours):
    _, ours = oracle_and_ours
    s = "the quick brown fox"
    assert ours.decode(ours.encode(s)) == s


def test_albert_style_normalizer_sequence(tmp_path):
    """ALBERT's sentencepiece pipeline: Replace + NFKD + Lowercase +
    StripAccents in a Sequence — conformance vs the rust oracle."""
    from tokenizers import (Tokenizer, models, normalizers,
                            pre_tokenizers, trainers)
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([
        normalizers.Replace("``", '"'),
        normalizers.NFKD(), normalizers.Lowercase(),
        normalizers.StripAccents()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=200, show_progress=False,
        special_tokens=["<pad>", "<unk>", "[CLS]", "[SEP]", "[MASK]"],
        unk_token="<unk>")
    tok.train_from_iterator(CORPUS * 5, trainer)
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    ours = UnigramTokenizer.from_tokenizer_json(path)
    assert isinstance(ours.normalizer, list)
    prompts = PROMPTS + ["Naïve Café Protégé", "``quoted`` text",
                         "ÜBER Zürich STRASSE", "İstanbul fiancée"]
    oracle = tok
    for p in prompts:
        assert oracle.encode(p).ids == ours.tokenize_to_ids(p), repr(p)


def test_unknown_chars_emit_unk(oracle_and_ours):
    oracle, ours = oracle_and_ours
    ref = oracle.encode("✨").ids
    got = ours.tokenize_to_ids("✨")
    assert got == ref
    assert ours.unk_id_model in got
