"""C ABI shim (native/capi.cpp): build, dlopen via the demo binary, and
drive load/tokenize/encode_batch/forward through the exported C surface —
the conformance test for the reference's libbert.so capability set
(bert.h:33-90)."""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
# ET_NATIVE_BUILD_DIR selects an alternate build flavor (sanitizer builds)
BUILD_DIR = os.environ.get("ET_NATIVE_BUILD_DIR", "build")
LIB = ROOT / "native" / BUILD_DIR / "libembeddings_c.so"
DEMO = ROOT / "native" / BUILD_DIR / "capi_demo"


@pytest.fixture(scope="module")
def binaries():
    make_args = ["make", "-C", str(ROOT / "native"), "capi", "demo"]
    san = os.environ.get("ET_NATIVE_SANITIZE")
    if san:
        make_args.append(f"SANITIZE={san}")
    r = subprocess.run(make_args, capture_output=True, text=True)
    if r.returncode != 0 or not (LIB.exists() and DEMO.exists()):
        pytest.skip(f"C ABI shim did not build: {r.stderr[-500:]}")
    return LIB, DEMO


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory, small_vocab):
    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import params as P
    d = tmp_path_factory.mktemp("capi_model")
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    P.save_native(str(d / "tiny.npz"), P.init_params(cfg, rng=0), cfg)
    return d / "tiny.npz"


def test_capi_end_to_end(binaries, tiny_checkpoint):
    lib, demo = binaries
    env = {**os.environ, "EMBEDDINGS_TPU_PLATFORM": "cpu",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [str(demo), str(lib), str(tiny_checkpoint), "f32",
         "hello world", "the quick brown fox"],
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "n_embd=64" in out
    # tokenizer path: [CLS] ... [SEP] visible through et_id_to_token
    assert "[CLS]" in out and "[SEP]" in out
    # embeddings are unit-norm
    assert out.count("|x|=1.0000") == 2, out
    # pre-tokenized et_forward matches et_encode
    m = re.search(r"forward parity: max\|[^|]*\| = ([0-9.e+-]+)", out)
    assert m, out
    assert float(m.group(1)) < 1e-4, out
    # capacity edges: cap=0 -> error (no write), cap=4 -> <=4 ids written
    m = re.search(r"tokenize caps: rc\(cap=0\)=(-?\d+) rc\(cap=4\)=(-?\d+) "
                  r"n_tiny=(\d+)", out)
    assert m, out
    assert int(m.group(1)) == -1 and int(m.group(2)) == 0, out
    assert 0 < int(m.group(3)) <= 4, out


def test_capi_error_reporting(binaries):
    lib, demo = binaries
    env = {**os.environ, "EMBEDDINGS_TPU_PLATFORM": "cpu",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [str(demo), str(lib), "/nonexistent/model.npz"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode != 0
    assert "load failed" in r.stderr, r.stderr[-2000:]
