"""Pooling auto-detection for HF/SentenceTransformers model dirs.

The reference mean-pools every model (bert.cpp:1087-1089) — including the
CLS-pooled bge-* family. load_model must do better: read
``1_Pooling/config.json`` when present, else recognize known model names,
so the README quickstart yields correct BGE embeddings without flags.
"""

import json

import pytest

from embeddings_tpu.config import BertConfig, detect_pooling
from embeddings_tpu.models import params as P


def _write_hf_dir(d, cfg, small_vocab, name_or_path=None):
    d.mkdir(parents=True, exist_ok=True)
    hf = dict(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
              num_hidden_layers=cfg.num_hidden_layers,
              num_attention_heads=cfg.num_attention_heads,
              intermediate_size=cfg.intermediate_size,
              max_position_embeddings=cfg.max_position_embeddings,
              model_type="bert")
    if name_or_path:
        hf["_name_or_path"] = name_or_path
    (d / "config.json").write_text(json.dumps(hf))
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    from safetensors.numpy import save_file
    sd = P.to_hf_state_dict(P.init_params(cfg, rng=0))
    save_file(sd, str(d / "model.safetensors"))
    return d


@pytest.fixture(scope="module")
def cfg(small_vocab):
    return BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128, max_position_embeddings=64)


def test_sentence_transformers_pooling_config_wins(tmp_path, cfg, small_vocab):
    d = _write_hf_dir(tmp_path / "some-model", cfg, small_vocab)
    pool_dir = d / "1_Pooling"
    pool_dir.mkdir()
    (pool_dir / "config.json").write_text(json.dumps({
        "word_embedding_dimension": 64,
        "pooling_mode_cls_token": True,
        "pooling_mode_mean_tokens": False,
        "pooling_mode_max_tokens": False,
    }))
    assert detect_pooling(d) == "cls"
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    assert eng.config.pooling == "cls"


def test_known_model_name_detected(tmp_path, cfg, small_vocab):
    d = _write_hf_dir(tmp_path / "bge-base-en-v1.5", cfg, small_vocab)
    assert detect_pooling(d) == "cls"
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    assert eng.config.pooling == "cls"


def test_name_or_path_detected(tmp_path, cfg, small_vocab):
    d = _write_hf_dir(tmp_path / "local-copy", cfg, small_vocab,
                      name_or_path="BAAI/bge-small-en-v1.5")
    assert detect_pooling(d) == "cls"


def test_unsupported_pooling_config_is_authoritative(tmp_path, cfg,
                                                     small_vocab):
    """A 1_Pooling/config.json declaring a mode we don't implement must
    NOT fall through to the name heuristic (the file is authoritative);
    detection returns None and the default stays."""
    d = _write_hf_dir(tmp_path / "bge-base-en-v1.5", cfg, small_vocab)
    pool_dir = d / "1_Pooling"
    pool_dir.mkdir()
    (pool_dir / "config.json").write_text(json.dumps({
        "pooling_mode_cls_token": False,
        "pooling_mode_mean_tokens": False,
        "pooling_mode_max_tokens": False,
        "pooling_mode_weightedmean_tokens": True,
    }))
    assert detect_pooling(d) is None


def test_minilm_stays_mean(tmp_path, cfg, small_vocab):
    d = _write_hf_dir(tmp_path / "all-MiniLM-L6-v2", cfg, small_vocab)
    assert detect_pooling(d) == "mean"


def test_unknown_dir_returns_none_and_defaults_mean(tmp_path, cfg,
                                                    small_vocab):
    d = _write_hf_dir(tmp_path / "mystery-model", cfg, small_vocab)
    assert detect_pooling(d) is None
    from embeddings_tpu.runtime.engine import load_model
    assert load_model(d).config.pooling == "mean"


def test_explicit_flag_overrides_detection(tmp_path, cfg, small_vocab):
    d = _write_hf_dir(tmp_path / "bge-base-en-v1.5", cfg, small_vocab)
    from embeddings_tpu.runtime.engine import load_model
    assert load_model(d, pooling="mean").config.pooling == "mean"


def test_cls_vs_mean_actually_differ(tmp_path, cfg, small_vocab):
    """Guard that detection matters: the two poolings give different
    embeddings for the same text."""
    import numpy as np
    d = _write_hf_dir(tmp_path / "bge-base-en-v1.5", cfg, small_vocab)
    from embeddings_tpu.runtime.engine import load_model
    e_cls = load_model(d).encode("hello world test")
    e_mean = load_model(d, pooling="mean").encode("hello world test")
    assert not np.allclose(e_cls, e_mean)


def test_no_signal_logs_default_notice(tmp_path, cfg, small_vocab, caplog):
    """An unknown model dir with no pooling signal must say it is
    defaulting to mean (diagnosable, not silent)."""
    import logging
    d = _write_hf_dir(tmp_path / "mystery-model", cfg, small_vocab)
    with caplog.at_level(logging.INFO, logger="embeddings_tpu.config"):
        assert detect_pooling(d) is None
    assert any("defaulting to mean" in r.message for r in caplog.records)
