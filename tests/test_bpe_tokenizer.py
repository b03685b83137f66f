"""Byte-level BPE tokenizer conformance vs the HF rust `tokenizers` oracle.

Mirrors the WordPiece conformance strategy (tests/test_tokenizer_conformance
.py, itself modeled on the reference's examples/test_hf_tokenizer.py method):
train a real rust ByteLevel+BPE tokenizer offline on a deterministic corpus,
then diff our pure-Python implementation token-for-token on a prompt set
plus randomized inputs. Zero egress — the oracle is built locally.
"""

from __future__ import annotations

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from embeddings_tpu.tokenizer.bpe import ByteLevelBPETokenizer, bytes_to_unicode

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Sentence embeddings are useful for retrieval and clustering!",
    "I don't think it's over; they've said they'll win, we'd see.",
    "def f(x): return x**2  # code-ish input with symbols <>|&^~",
    "Numbers: 123 4567 3.14159 0xFF 2e-4 100,000",
    "naive cafe protege uber facade Zurich Munchen",
    "multi  spaces\tand\nnewlines   everywhere ",
    "quotes 'single' \"double\" and dashes -- --- em",
    "URLs http://example.com/path?q=1&r=2 and emails a.b@c.de",
    "Mixed CJK and Latin in one line",
    "short",
    "a",
    "ALL CAPS AND MiXeD CaSe tokens",
]

PROMPTS = CORPUS + [
    "",
    " ",
    "   ",
    "\t\n",
    "don't it's they'll we'd I'm you're he’s",  # curly apostrophe
    "trailing space ",
    " leading space",
    "hyphen-ated co-operate re-enter",
    "!!!???...,,;;::",
    "x",
    "The the THE tHe",
    "123abc abc123 1a2b3c",
    "éèêë üöä ß",  # accents (bytes > 127)
    "你好世界",                            # CJK (unseen bytes)
    "emoji \U0001f600 \U0001f680 end",
    "tab\tseparated\tfields",
    "new\nline\nsplit",
    "a" * 300,
    ("word " * 200).strip(),
]


@pytest.fixture(scope="module")
def oracle_and_ours(tmp_path_factory):
    """Train a rust ByteLevel BPE (vocab 600) and load the saved
    vocab.json/merges.txt into our implementation."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=600, min_frequency=1, show_progress=False,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS * 3, trainer)
    d = tmp_path_factory.mktemp("bpe_fixture")
    tok.model.save(str(d))
    ours = ByteLevelBPETokenizer.from_pretrained(d)
    return tok, ours


def test_conformance_prompts(oracle_and_ours):
    oracle, ours = oracle_and_ours
    bad = []
    for p in PROMPTS:
        ref = oracle.encode(p).ids
        got = ours.tokenize_to_ids(p)
        if ref != got:
            bad.append((p, ref, got))
    assert not bad, bad[:3]


def test_conformance_random_ascii(oracle_and_ours):
    oracle, ours = oracle_and_ours
    rng = np.random.default_rng(42)
    chars = np.array(list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789 .,'!?-_()[]{}<>\t\n"))
    for _ in range(200):
        n = int(rng.integers(0, 60))
        s = "".join(rng.choice(chars, size=n))
        assert oracle.encode(s).ids == ours.tokenize_to_ids(s), repr(s)


def test_conformance_random_unicode(oracle_and_ours):
    oracle, ours = oracle_and_ours
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(0, 40))
        cps = rng.integers(1, 0x2FFFF, size=n)
        s = "".join(chr(c) for c in cps
                    if not (0xD800 <= c <= 0xDFFF))
        assert oracle.encode(s).ids == ours.tokenize_to_ids(s), repr(s)


def test_byte_table_is_reversible():
    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256
    # spot values from the published GPT-2 table
    assert t[ord("A")] == "A" and t[32] == "Ġ" and t[10] == "Ċ"


def test_specials_and_encode(oracle_and_ours):
    _, ours = oracle_and_ours
    assert (ours.cls_id, ours.pad_id, ours.sep_id, ours.unk_id,
            ours.mask_id) == (0, 1, 2, 3, 4)
    ids = ours.encode("quick fox")
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id
    # truncation keeps the final </s> (same contract as WordPiece.encode)
    t = ours.encode("the quick brown fox jumps over the lazy dog", max_len=5)
    assert len(t) == 5 and t[0] == ours.cls_id and t[-1] == ours.sep_id
    with pytest.raises(ValueError):
        ours.encode("x", max_len=1)


def test_decode_roundtrip(oracle_and_ours):
    _, ours = oracle_and_ours
    for s in ["The quick brown fox", "don't stop", "a  b"]:
        assert ours.decode(ours.encode(s)) == s


def test_add_prefix_space():
    vocab = {c: i for i, c in enumerate(
        sorted(set(bytes_to_unicode().values())))}
    n = len(vocab)
    vocab["Ġa"] = n  # "Ġa" = " a"
    tok = ByteLevelBPETokenizer(vocab, [("Ġ", "a")],
                                add_prefix_space=True)
    ids = tok.tokenize_to_ids("a")
    assert ids == [n]  # leading space injected then merged


def test_unknown_symbol_maps_to_unk():
    # tiny vocab missing most byte symbols: unseen bytes -> unk_id
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "a": 4}
    tok = ByteLevelBPETokenizer(vocab, [])
    assert tok.tokenize_to_ids("ab") == [4, 3]


def test_native_matches_rust_oracle(oracle_and_ours):
    """Direct native-C++ vs rust-oracle conformance on the trained
    600-token BPE (not just transitively through the Python engine)."""
    from embeddings_tpu.tokenizer import native as N
    oracle, ours = oracle_and_ours
    nt = N.NativeBPETokenizer.wrap(ours)
    if nt is None:
        pytest.skip("native tokenizer not built")
    rng = np.random.default_rng(3)
    texts = list(PROMPTS)
    for _ in range(300):
        n = int(rng.integers(0, 50))
        cps = rng.integers(1, 0x2FFFF, size=n)
        texts.append("".join(chr(c) for c in cps
                             if not (0xD800 <= c <= 0xDFFF)))
    for s in texts:
        ref = oracle.encode(s).ids
        got = nt._raw(s)
        assert ref == got, repr(s)
