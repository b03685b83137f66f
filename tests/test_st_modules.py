"""SentenceTransformers module pipeline (modules.json): Dense post-pooling
projections + the Normalize flag.

The reference supports only Transformer+Pooling checkpoints
(/root/reference/bert.cpp:1087-1095 mean-pools and L2-normalizes
unconditionally); ST models like distiluse-base-multilingual (Dense
768->512, tanh, NO Normalize) or LaBSE (Dense + Normalize) carry extra
modules that change the output embedding. models/params.py
_load_st_modules attaches them; models/bert.py _apply_st_dense runs them
after pooling.
"""

import json

import numpy as np
import pytest

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import params as P


@pytest.fixture(scope="module")
def cfg(small_vocab):
    return BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128, max_position_embeddings=64)


def _write_st_dir(d, cfg, small_vocab, *, out_dim=32, act="Tanh",
                  with_normalize=False, rng=None):
    from safetensors.numpy import save_file
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        model_type="bert")))
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    save_file(P.to_hf_state_dict(P.init_params(cfg, rng=0)),
              str(d / "model.safetensors"))
    pool = d / "1_Pooling"
    pool.mkdir()
    (pool / "config.json").write_text(json.dumps(
        {"pooling_mode_mean_tokens": True}))
    modules = [
        {"idx": 0, "name": "0", "path": "",
         "type": "sentence_transformers.models.Transformer"},
        {"idx": 1, "name": "1", "path": "1_Pooling",
         "type": "sentence_transformers.models.Pooling"},
        {"idx": 2, "name": "2", "path": "2_Dense",
         "type": "sentence_transformers.models.Dense"},
    ]
    dd = d / "2_Dense"
    dd.mkdir()
    (dd / "config.json").write_text(json.dumps({
        "in_features": cfg.hidden_size, "out_features": out_dim,
        "bias": True,
        "activation_function":
            f"torch.nn.modules.activation.{act}" if act != "Identity"
            else "torch.nn.modules.linear.Identity"}))
    rng = rng or np.random.default_rng(0)
    w = (rng.standard_normal((out_dim, cfg.hidden_size)) * 0.1
         ).astype(np.float32)
    b = (rng.standard_normal(out_dim) * 0.05).astype(np.float32)
    save_file({"linear.weight": w, "linear.bias": b},
              str(dd / "model.safetensors"))
    if with_normalize:
        modules.append({"idx": 3, "name": "3", "path": "3_Normalize",
                        "type": "sentence_transformers.models.Normalize"})
    (d / "modules.json").write_text(json.dumps(modules))
    return d, w, b


def test_dense_module_loads_and_projects(tmp_path, cfg, small_vocab):
    """distiluse layout: Dense(tanh), NO Normalize -> un-normalized
    out_dim embeddings equal to tanh(pooled @ W.T + b)."""
    d, w, b = _write_st_dir(tmp_path / "st", cfg, small_vocab,
                            out_dim=32, act="Tanh")
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    assert eng.config.st_dense_acts == ("tanh",)
    assert eng.config.normalize_embeddings is False
    assert eng.n_embd == 32
    embs = eng.encode_batch(["hello world", "hello"])
    assert embs.shape == (2, 32)
    # un-normalized: norms must NOT all be 1
    assert not np.allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-3)

    # manual reference: pooled (pre-dense) @ W.T + b, tanh
    import dataclasses
    import jax
    from embeddings_tpu.models import bert
    base_params = {k: v for k, v in eng.params.items() if k != "st_dense"}
    base_cfg = dataclasses.replace(eng.config, st_dense_acts=())
    from embeddings_tpu.runtime.batching import pad_batch
    toks = [eng.tokenize(t) for t in ["hello world", "hello"]]
    L = max(len(t) for t in toks)
    ids, mask = pad_batch(toks, len(toks), L, eng.tokenizer.pad_id)
    pooled = np.asarray(jax.jit(
        lambda p, i, m: bert.encode_tokens(p, base_cfg, i, m,
                                           normalize=False))(
        base_params, ids, mask))
    ref = np.tanh(pooled @ w.T + b)
    np.testing.assert_allclose(embs, ref, atol=2e-3, rtol=1e-2)


def test_dense_with_normalize_module(tmp_path, cfg, small_vocab):
    """LaBSE-style: Dense + Normalize -> unit-norm projected outputs."""
    d, _, _ = _write_st_dir(tmp_path / "st2", cfg, small_vocab,
                            out_dim=48, act="Identity",
                            with_normalize=True)
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    assert eng.config.st_dense_acts == ("none",)
    assert eng.config.normalize_embeddings is True
    embs = eng.encode_batch(["hello world"])
    assert embs.shape == (1, 48)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0,
                               atol=1e-5)


def test_dense_packed_path_matches_bucketed(tmp_path, cfg, small_vocab):
    d, _, _ = _write_st_dir(tmp_path / "st3", cfg, small_vocab,
                            out_dim=32, act="Tanh")
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    texts = ["hello world", "hello", "world world hello"]
    a = eng.encode_batch(texts)
    b = eng.encode_batch_packed(texts)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)


def test_dense_npz_roundtrip(tmp_path, cfg, small_vocab):
    d, w, _ = _write_st_dir(tmp_path / "st4", cfg, small_vocab,
                            out_dim=32, act="Tanh")
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    ref = eng.encode_batch(["hello world"])
    out = tmp_path / "st4.npz"
    P.save_native(out, eng.params, eng.config)
    p2, c2 = P.load_native(out)
    assert tuple(c2.st_dense_acts) == ("tanh",)
    from embeddings_tpu.runtime.engine import Engine
    eng2 = Engine(p2, c2, eng.tokenizer)
    got = eng2.encode_batch(["hello world"])
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_dense_refuses_ggml_export(tmp_path, cfg, small_vocab):
    d, _, _ = _write_st_dir(tmp_path / "st5", cfg, small_vocab)
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    with pytest.raises(ValueError, match="Dense"):
        P.to_hf_state_dict(eng.params)


def test_unknown_module_type_fails_loudly(tmp_path, cfg, small_vocab):
    d, _, _ = _write_st_dir(tmp_path / "st6", cfg, small_vocab)
    mods = json.loads((d / "modules.json").read_text())
    mods.append({"idx": 9, "name": "9", "path": "9_Weird",
                 "type": "sentence_transformers.models.CNN"})
    (d / "modules.json").write_text(json.dumps(mods))
    from embeddings_tpu.runtime.engine import load_model
    with pytest.raises(ValueError, match="CNN"):
        load_model(d)


def test_dense_under_mesh(tmp_path, cfg, small_vocab):
    """st_dense replicates over the mesh; sharded encode matches
    single-device."""
    d, _, _ = _write_st_dir(tmp_path / "st7", cfg, small_vocab,
                            out_dim=32, act="Tanh")
    from embeddings_tpu.parallel import make_mesh
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(d)
    ref = eng.encode_batch(["hello world", "hello"])
    mesh = make_mesh(tp=1)  # dp = all (virtual) devices
    eng2 = load_model(d, mesh=mesh)
    got = eng2.encode_batch(["hello world", "hello"])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2)
