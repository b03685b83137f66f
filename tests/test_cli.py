"""CLI surface: encode / tokenize / convert / quantize round trips."""

import json

import numpy as np
import pytest

from embeddings_tpu.cli import main
from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import params as P


@pytest.fixture(scope="module")
def model_npz(tmp_path_factory, small_vocab):
    """A native checkpoint + vocab.txt, as `convert` would produce."""
    d = tmp_path_factory.mktemp("model")
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    params = P.init_params(cfg, rng=0)
    path = d / "model.npz"
    P.save_native(path, params, cfg)
    (d / "vocab.txt").write_text("\n".join(small_vocab) + "\n",
                                 encoding="utf-8")
    return str(path)


def test_encode(model_npz, capsys):
    rc = main(["encode", "-m", model_npz, "-p", "hello world",
               "--format", "json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    emb = np.asarray(out["embeddings"])
    assert emb.shape == (1, 64)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)


def test_encode_multiple_prompts_quantized(model_npz, capsys):
    rc = main(["encode", "-m", model_npz, "-p", "hello", "-p", "world",
               "--dtype", "q4_0"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 2
    assert len(lines[0].split()) == 64


def test_tokenize(model_npz, capsys):
    rc = main(["tokenize", "-m", model_npz, "-p", "hello world"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[CLS]" in out and "[SEP]" in out


def test_quantize_roundtrip(model_npz, tmp_path, capsys):
    out = str(tmp_path / "model-q4.npz")
    rc = main(["quantize", model_npz, out, "--dtype", "q4_0"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "nibble histogram" in text
    import os
    # 4-bit codes stored as int8 for now: ~4x smaller than f32 weights
    assert os.path.getsize(out) < os.path.getsize(model_npz) * 0.6

    # quantized checkpoint loads and encodes
    import shutil, pathlib
    shutil.copy(pathlib.Path(model_npz).parent / "vocab.txt",
                tmp_path / "vocab.txt")
    rc = main(["encode", "-m", out, "-p", "hello world", "--format", "json"])
    assert rc == 0


def test_bad_args(model_npz):
    with pytest.raises(SystemExit):
        main(["encode"])  # missing -m
    with pytest.raises(SystemExit):
        main(["quantize", model_npz, "x.npz"])  # missing --dtype
    with pytest.raises(SystemExit):
        main(["nonsense"])
