"""Tokenizer conformance vs the HuggingFace rust `tokenizers` library.

Replicates the reference's golden-file method (examples/test_hf_tokenizer.py
generates HF ids; examples/test_tokenizer.cpp diffs bert_tokenize against
them) but as in-process pytest against the same oracle.
"""

import unicodedata

import pytest

from embeddings_tpu.tokenizer import normalize, pre_tokenize

# The same coverage categories as the reference's examples/test_prompts.txt:
# English, contractions/punct, code, Chinese, Japanese, mixed CJK+Latin.
PROMPTS = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "you know, this is a test... isn't it?",
    'def print_code(x): return x + 1  # comment',
    "你好世界",
    "我们在测试中文模型",
    "日本語のテキスト",
    "mixed 中文 and English 模型 test",
    "UPPER CASE lower case MiXeD",
    "Café naïve résumé Zürich",  # accents
    "  multiple   spaces\tand\ttabs\nnewlines  ",
    "punctuation!!! ??? ... ,,, ;;;",
    "emoji 😀 and symbols © ® ™",
    "a" * 150,  # longer than max_input_chars_per_word
    "",
    " ",
    "1234567890",
    "word-with-hyphens and_underscores",
    "ＦＵＬＬｗｉｄｔｈ ｔｅｘｔ",  # fullwidth forms
    "ﾊﾝｶｸ ｶﾀｶﾅ",
    "ǅungla Ǆ ǉubav",  # titlecase digraphs
    "İstanbul ı İ",
    "a\x00null�char",
    "한국어 텍스트",  # Hangul (not CJK-spaced by HF)
    "𫡐𫤰",  # around the 0x2B920 quirk boundary
    "combining á è marks",
    "\uF900 a\uF900b",  # CJK compat ideograph: NFD maps U+F900 -> U+8C48
]


@pytest.mark.parametrize("text", PROMPTS, ids=range(len(PROMPTS)))
def test_normalize_matches_hf(text, hf_tokenizer):
    ours = normalize(text)
    theirs = hf_tokenizer.normalizer.normalize_str(text)
    assert ours == theirs


@pytest.mark.parametrize("text", PROMPTS, ids=range(len(PROMPTS)))
def test_pretokenize_matches_hf(text, hf_tokenizer):
    norm = hf_tokenizer.normalizer.normalize_str(text)
    ours = pre_tokenize(norm)
    theirs = [w for w, _ in hf_tokenizer.pre_tokenizer.pre_tokenize_str(norm)]
    assert ours == theirs


@pytest.mark.parametrize("text", PROMPTS, ids=range(len(PROMPTS)))
def test_encode_matches_hf(text, hf_tokenizer, our_tokenizer):
    ours = our_tokenizer.encode(text)
    theirs = hf_tokenizer.encode(text).ids
    assert ours == theirs, (
        f"ours={[our_tokenizer.id_to_token(i) for i in ours]} "
        f"theirs={[our_tokenizer.id_to_token(i) for i in theirs]}")


def test_special_ids_from_vocab(our_tokenizer, small_vocab):
    assert our_tokenizer.cls_id == small_vocab.index("[CLS]")
    assert our_tokenizer.sep_id == small_vocab.index("[SEP]")
    assert our_tokenizer.unk_id == small_vocab.index("[UNK]")
    assert our_tokenizer.pad_id == small_vocab.index("[PAD]")


def test_truncation(our_tokenizer):
    # Reference truncates at n_max_tokens-1 keeping [SEP] (bert.cpp:386).
    ids = our_tokenizer.encode("the " * 100, max_len=16)
    assert len(ids) == 16
    assert ids[0] == our_tokenizer.cls_id
    assert ids[-1] == our_tokenizer.sep_id


def test_long_word_is_unk(our_tokenizer):
    ids = our_tokenizer.encode("a" * 150)
    assert ids == [our_tokenizer.cls_id, our_tokenizer.unk_id,
                   our_tokenizer.sep_id]


def test_cjk_quirk_boundary(our_tokenizer, hf_tokenizer):
    # 0x2B850 is NOT CJK-spaced by hf-rust (quirk), 0x2B930 is.
    for cp in (0x2B850, 0x2B930, 0x4E2D, 0x3400):
        t = f"a{chr(cp)}b"
        assert normalize(t) == hf_tokenizer.normalizer.normalize_str(t), hex(cp)


def test_decode_roundtrip(our_tokenizer):
    ids = our_tokenizer.encode("hello world")
    text = our_tokenizer.decode(ids[1:-1])
    assert text == "hello world"


def test_encode_batch(our_tokenizer):
    out = our_tokenizer.encode_batch(["hello", "world test"])
    assert len(out) == 2
    assert all(ids[0] == our_tokenizer.cls_id for ids in out)
