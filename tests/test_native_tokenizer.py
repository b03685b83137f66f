"""Native C++ tokenizer: token-for-token conformance with the Python
implementation (which is itself HF-conformant) + throughput sanity."""

import time

import pytest

from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
from embeddings_tpu.tokenizer import native as nat

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="native tokenizer not built (make -C native)")

from tests.test_tokenizer import PROMPTS  # same conformance prompt set


@pytest.fixture(scope="module")
def pair(small_vocab):
    py = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cc = nat.NativeWordPieceTokenizer.wrap(py)
    assert cc is not None
    return py, cc


@pytest.mark.parametrize("text", PROMPTS, ids=range(len(PROMPTS)))
def test_native_matches_python(pair, text):
    py, cc = pair
    assert cc.encode(text) == py.encode(text)


def test_native_matches_python_truncation(pair):
    py, cc = pair
    for max_len in (4, 16, 64):
        t = "the quick brown fox " * 30
        assert cc.encode(t, max_len=max_len) == py.encode(t, max_len=max_len)


def test_special_ids(pair, small_vocab):
    _, cc = pair
    assert cc.cls_id == small_vocab.index("[CLS]")
    assert cc.pad_id == small_vocab.index("[PAD]")


def test_large_input_regrows_buffer(pair):
    py, cc = pair
    t = "the " * 20000  # body exceeds the 8192-token scratch buffer
    assert cc.encode(t) == py.encode(t)


def test_native_is_faster(pair):
    py, cc = pair
    corpus = ["the quick brown fox jumps over the lazy dog 你好 world! " * 4
              ] * 300

    t0 = time.perf_counter()
    a = [py.encode(t) for t in corpus]
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = [cc.encode(t) for t in corpus]
    t_cc = time.perf_counter() - t0
    assert a == b
    # native must be decisively faster (it's the point of having it)
    assert t_cc < t_py / 2, (t_py, t_cc)


def test_wrap_refuses_unrepresentable_configs(small_vocab):
    """Configs the C++ side cannot represent must fall back to Python
    (returning None) rather than silently tokenizing differently."""
    # strip_accents decoupled from lowercasing: not representable
    t1 = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab),
                            lowercase=True, strip_accents=False)
    assert nat.NativeWordPieceTokenizer.wrap(t1) is None
    # explicit strip_accents matching lowercase: representable
    t2 = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab),
                            lowercase=True, strip_accents=True)
    assert nat.NativeWordPieceTokenizer.wrap(t2) is not None
    # custom special tokens that don't resolve natively: not representable
    vocab = ["<pad>", "<unk>", "<s>", "</s>"] + small_vocab
    t3 = WordPieceTokenizer(WordPieceVocab.from_tokens(vocab),
                            cls_token="<s>", sep_token="</s>",
                            unk_token="<unk>", pad_token="<pad>")
    assert nat.NativeWordPieceTokenizer.wrap(t3) is None


def test_concurrent_encode_thread_safety(pair):
    """The serving layer runs encode from multiple worker threads at once
    (ctypes releases the GIL): concurrent encodes must not interleave ids
    through a shared scratch buffer."""
    import concurrent.futures

    py, cc = pair
    texts = [f"the quick brown fox {'walk talk run ' * (i % 7)}jumps {i}"
             for i in range(200)]
    expected = [py.encode(t) for t in texts]

    def worker(seed):
        import random
        order = list(range(len(texts)))
        random.Random(seed).shuffle(order)
        for i in order:
            if cc.encode(texts[i]) != expected[i]:
                return i
        return -1

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        bad = [r for r in ex.map(worker, range(8)) if r != -1]
    assert not bad, f"corrupted ids for texts {bad}"


def test_degenerate_max_len_rejected(pair):
    py, cc = pair
    for tok in pair:
        with pytest.raises(ValueError):
            tok.encode("hello world", max_len=1)
    # max_len=2 -> [CLS] [SEP] on both paths
    assert py.encode("hello world", max_len=2) == \
        cc.encode("hello world", max_len=2) == [py.cls_id, py.sep_id]
