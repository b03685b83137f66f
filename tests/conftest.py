"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Mirrors the multi-host test strategy from SURVEY.md §4: sharding logic is
validated on faked CPU devices via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The image's sitecustomize imports jax at interpreter startup (before this
# conftest), so JAX_PLATFORMS=axon is already baked into jax.config — the
# env var alone doesn't stick. Override through the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    """Auto-build the native tokenizer ext so a fresh clone doesn't
    silently skip its ~45 tests (the skips' reason string is clear but
    nothing fails loudly). Opt out with ET_SKIP_NATIVE_BUILD=1; a failed
    build degrades to one unmissable warning instead of an error."""
    if os.environ.get("ET_SKIP_NATIVE_BUILD"):
        return
    from pathlib import Path
    root = Path(__file__).resolve().parent.parent
    build_dir = os.environ.get("ET_NATIVE_BUILD_DIR", "build")
    lib = root / "native" / build_dir / "libetok.so"
    if lib.exists() or not (root / "native" / "Makefile").exists():
        return
    import shutil
    import subprocess
    if shutil.which("make") is None:
        config.issue_config_time_warning(
            pytest.PytestConfigWarning(
                "native/build/libetok.so is not built and `make` is "
                "unavailable - the ~45 native-tokenizer tests will be "
                "SKIPPED. Build with: make -C native"), stacklevel=2)
        return
    print("[conftest] building native tokenizer ext (make -C native; "
          "set ET_SKIP_NATIVE_BUILD=1 to opt out) ...")
    proc = subprocess.run(["make", "-C", str(root / "native")],
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0 or not lib.exists():
        config.issue_config_time_warning(
            pytest.PytestConfigWarning(
                "native ext auto-build FAILED - the ~45 native-tokenizer "
                "tests will be SKIPPED. Run `make -C native` manually; "
                f"build output tail:\n{proc.stdout[-800:]}"
                f"\n{proc.stderr[-800:]}"), stacklevel=2)


@pytest.fixture(scope="session")
def small_vocab():
    """A compact WordPiece vocab good enough for real English + CJK tests."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ("the a an and is was were be to of in on for with at by this "
             "that it he she they we you i hello world test sentence "
             "embedding model quick brown fox jumps over lazy dog un "
             "know ##ing ##s ##ed ##er ##est ##ly ##able run walk talk "
             "do ##n't can won great good bad new old big small "
             "##orm ##ation inform trans form ##ength str l code c "
             "print def return int float if else while 1 2 3 4 5 6 7 8 9 0 "
             "##1 ##2 ##3 ##0 apple banana water fire earth").split()
    # single ascii letters + punctuation as word and subword pieces
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    punct = list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
    cjk = list("你好世界中文模型测试的是我们在一个这了不有和日本語")
    tokens += words + letters + ["##" + l for l in letters] + punct + cjk
    seen, out = set(), []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


@pytest.fixture(scope="session")
def hf_tokenizer(small_vocab):
    """HF rust tokenizers BertWordPiece pipeline — the conformance oracle
    (the reference's test generates golden ids with HF the same way,
    examples/test_hf_tokenizer.py)."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    vocab = {t: i for i, t in enumerate(small_vocab)}
    tok = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]",
                                     max_input_chars_per_word=100))
    tok.normalizer = normalizers.BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=None,
        lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])])
    return tok


@pytest.fixture(scope="session")
def our_tokenizer(small_vocab):
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    return WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))


@pytest.fixture(scope="session")
def tiny_config():
    from embeddings_tpu.config import BertConfig
    return BertConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
