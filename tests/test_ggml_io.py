"""ggml .bin format compatibility: write -> read roundtrips and end-to-end
model loading with bit-exact quantization parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, ggml_io, params as P
from embeddings_tpu.ops import quant as Q


@pytest.fixture(scope="module")
def cfg(small_vocab):
    return BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128, max_position_embeddings=64)


@pytest.fixture(scope="module")
def params(cfg):
    return P.init_params(cfg, rng=0)


def test_q4_1_ggml_pack_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 6), dtype=np.float32)
    q_raw, d, m = Q.quantize_q4_1(w)
    buf = Q.pack_ggml_q4_1(q_raw, d, m)
    assert len(buf) == 6 * 2 * 24  # {f32 d, f32 m, 16 nibble bytes}
    q2, d2, m2 = Q.unpack_ggml_q4_1(buf, 64, 6)
    np.testing.assert_array_equal(q2, q_raw.astype(np.int8) - 8)
    np.testing.assert_allclose(d2, d, rtol=1e-7)
    np.testing.assert_allclose(m2, m + 8.0 * d, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dtype", ["f32", "f16", "q4_0", "q4_1"])
def test_write_read_state_dict_roundtrip(tmp_path, cfg, params, small_vocab,
                                         dtype):
    path = tmp_path / f"model-{dtype}.bin"
    ggml_io.write_ggml(path, params, cfg, small_vocab, dtype=dtype)
    sd, cfg2, vocab2 = ggml_io.read_ggml(path, dequant=True)
    assert vocab2 == list(small_vocab)
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_hidden_layers == cfg.num_hidden_layers
    ref_sd = P.to_hf_state_dict(params)
    assert set(sd) == set(ref_sd)
    w = sd["encoder.layer.0.attention.self.query.weight"]
    ref = ref_sd["encoder.layer.0.attention.self.query.weight"]
    assert w.shape == ref.shape
    if dtype == "f32":
        np.testing.assert_array_equal(w, ref)
    elif dtype == "f16":
        np.testing.assert_allclose(w, ref, atol=1e-3)
    else:
        step = np.abs(ref).max() / 4
        assert np.abs(w - ref).max() < step
    # 1-D tensors are always bit-exact f32
    np.testing.assert_array_equal(
        sd["embeddings.LayerNorm.bias"], ref_sd["embeddings.LayerNorm.bias"])


def test_quantization_bit_parity(tmp_path, cfg, params, small_vocab):
    """Quantizing in-memory == quantizing through the .bin file."""
    path = tmp_path / "model-q4_0.bin"
    ggml_io.write_ggml(path, params, cfg, small_vocab, dtype="q4_0")
    sd, _, _ = ggml_io.read_ggml(path, dequant=False)
    qt_file = sd["encoder.layer.0.intermediate.dense.weight"]
    w = np.asarray(params["layers"]["mlp"]["up"]["w"][0])  # [K, N]
    qt_mem = Q.quantize(w, "q4_0")
    np.testing.assert_array_equal(np.asarray(qt_file.codes),
                                  np.asarray(qt_mem.codes))
    np.testing.assert_array_equal(np.asarray(qt_file.scales),
                                  np.asarray(qt_mem.scales))


@pytest.mark.parametrize("dtype", ["f32", "q4_0", "q4_1"])
def test_load_ggml_model_end_to_end(tmp_path, cfg, params, small_vocab,
                                    dtype):
    path = tmp_path / f"model-{dtype}.bin"
    ggml_io.write_ggml(path, params, cfg, small_vocab, dtype=dtype)
    lp, lcfg, tok = ggml_io.load_ggml_model(path)
    assert tok.cls_id == small_vocab.index("[CLS]")

    rng = np.random.default_rng(5)
    ids = rng.integers(5, cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    ref = np.asarray(bert.encode_tokens(
        params if dtype == "f32" else P.quantize_params(params, dtype),
        cfg, jnp.asarray(ids), jnp.asarray(mask)))
    got = np.asarray(bert.encode_tokens(lp, lcfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    atol = 1e-5 if dtype == "f32" else 2e-2
    cos = (ref * got).sum(-1)
    # quantized file path also quantizes position/token-type tables (the
    # reference's 2-D-'.weight' rule) while quantize_params keeps them
    # dense, so allow the small extra divergence.
    assert cos.min() > (0.999999 if dtype == "f32" else 0.995), cos
    if dtype == "f32":
        np.testing.assert_allclose(got, ref, atol=atol)


def test_malformed_bin_fails_cleanly(tmp_path, cfg, params, small_vocab):
    """Corrupt/truncated .bin input raises a clear exception (never hangs
    or returns garbage) — mirrors the GGUF reader's robustness tests."""
    import struct
    good = tmp_path / "good.bin"
    ggml_io.write_ggml(good, params, cfg, small_vocab, dtype="q4_0")
    blob = good.read_bytes()

    def expect_failure(data, name):
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises((ValueError, EOFError, struct.error, KeyError,
                            MemoryError, OSError)):
            ggml_io.read_ggml(p)

    expect_failure(b"XXXX" + blob[4:], "magic.bin")
    for cut in (6, 20, 120, len(blob) // 2):
        expect_failure(blob[:cut], f"trunc{cut}.bin")
    # unsupported tensor ftype in the first tensor record: locate the
    # first record (after header + vocab) and patch its ftype field
    n_vocab = len(small_vocab)
    off = 8 + 24  # magic+n_vocab, 6 more hparams
    for tok in small_vocab:
        off += 4 + len(tok.encode())
    bad = bytearray(blob)
    # record layout: i32 n_dims, i32 name_len, i32 ftype
    bad[off + 8:off + 12] = struct.pack("<i", 99)
    expect_failure(bytes(bad), "ftype.bin")
