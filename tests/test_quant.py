"""Quantization numerics: ggml-semantics blocks, pack/unpack roundtrips,
dequant-matmul consistency (XLA fallback vs Pallas interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embeddings_tpu.ops import quant
from embeddings_tpu.ops.quant import (
    QK, QuantizedTensor, dequantize, gather_rows, nibble_histogram,
    pack_ggml_q4_0, pack_ggml_q8_0, quantize, quantize_q4_0,
    unpack_ggml_q4_0, unpack_ggml_q8_0)


@pytest.fixture(params=["q4_0", "q4_1", "q8_0", "nf4"])
def kind(request):
    return request.param


def test_q4_0_semantics():
    """d = signed-absmax / -8; codes in [-8, 7]; dequant error bounded."""
    w = np.random.default_rng(7).standard_normal((64, 8), dtype=np.float32)
    q, d = quantize_q4_0(w)
    assert q.min() >= -8 and q.max() <= 7
    blocks = w.reshape(2, QK, 8)
    idx = np.abs(blocks).argmax(axis=1)
    signed_max = np.take_along_axis(blocks, idx[:, None, :], axis=1)[:, 0, :]
    np.testing.assert_allclose(d, signed_max / -8.0, rtol=1e-6)
    # value at the signed absmax position must reconstruct exactly:
    # q = clamp(x/d + 8.5) with x = -8d -> q-8 = -8 -> deq = -8d = x.
    deq = q.reshape(2, QK, 8) * d[:, None, :]
    err = np.abs(deq - blocks)
    # full-step bound: the asymmetric [-8,7] grid clips the positive extreme
    assert err.max() <= np.abs(d).max() + 1e-6


def test_quant_roundtrip_error(kind, rng):
    w = rng.standard_normal((128, 16), dtype=np.float32) * 0.1
    qt = quantize(w, kind)
    deq = np.asarray(dequantize(qt))
    # error per element bounded by a quantization step: half a step for the
    # round-to-nearest formats; a full step for q4_0 whose asymmetric
    # [-8, 7] grid clips the positive extreme (inherent ggml q4_0 behavior).
    scale = np.abs(np.asarray(qt.scales)).max()
    tol = {"q4_0": scale, "q4_1": scale / 2, "q8_0": scale / 2,
           # nf4 level spacing is non-uniform: widest gap is ~0.28*absmax
           "nf4": scale * 0.14}[kind]
    assert np.abs(deq - w).max() <= tol + 1e-6
    # relative matmul error is small
    x = rng.standard_normal((4, 128), dtype=np.float32)
    ref = x @ w
    got = x @ deq
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < (0.15 if kind != "q8_0" else 0.01)


def test_zeros_block(kind):
    w = np.zeros((QK, 4), dtype=np.float32)
    qt = quantize(w, kind)
    np.testing.assert_array_equal(np.asarray(dequantize(qt)), w)


def test_block_axis_embedding(rng):
    w = rng.standard_normal((10, 64), dtype=np.float32)
    qt = quantize(w, "q4_0", block_axis=-1)
    assert qt.codes.shape == (10, 64)
    assert qt.scales.shape == (10, 64 // QK)
    deq = np.asarray(dequantize(qt))
    assert deq.shape == (10, 64)
    # matches the transposed-matmul-layout quantization
    qt2 = quantize(w.T, "q4_0", block_axis=-2)
    np.testing.assert_allclose(deq, np.asarray(dequantize(qt2)).T, rtol=1e-6)
    # gather_rows == dequantize-then-take
    ids = jnp.array([[1, 3], [7, 0]])
    got = np.asarray(gather_rows(qt, ids))
    np.testing.assert_allclose(got, deq[np.asarray(ids)], rtol=1e-6)


def test_ggml_q4_0_pack_roundtrip(rng):
    w = rng.standard_normal((64, 6), dtype=np.float32)
    q, d = quantize_q4_0(w)
    buf = pack_ggml_q4_0(q, d)
    # ggml block_q4_0 = 4 bytes scale + 16 bytes nibbles per 32 values
    assert len(buf) == 6 * 2 * (4 + 16)
    q2, d2 = unpack_ggml_q4_0(buf, 64, 6)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(d, d2)


def test_ggml_q8_0_pack_roundtrip(rng):
    w = rng.standard_normal((96, 4), dtype=np.float32)
    qt = quantize(w, "q8_0")
    q, d = np.asarray(qt.codes), np.asarray(qt.scales)
    buf = pack_ggml_q8_0(q, d)
    q2, d2 = unpack_ggml_q8_0(buf, 96, 4)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(d, d2)


def test_nibble_histogram(rng):
    w = rng.standard_normal((64, 4), dtype=np.float32)
    q, _ = quantize_q4_0(w)
    h = nibble_histogram(q)
    assert h.sum() == q.size
    assert len(h) == 16


def test_quantized_tensor_pytree(rng):
    w = rng.standard_normal((64, 8), dtype=np.float32)
    qt = quantize(w, "q4_1")
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.kind == "q4_1" and qt2.block_axis == -2
    np.testing.assert_array_equal(np.asarray(qt2.codes), np.asarray(qt.codes))


def test_stacked_quantize_matches_per_layer(rng):
    """Quantizing stacked [NL, K, N] == stacking per-layer quantizations."""
    w = rng.standard_normal((3, 64, 8), dtype=np.float32)
    qt = quantize(w, "q4_0")
    per = [quantize(w[i], "q4_0") for i in range(3)]
    np.testing.assert_array_equal(
        np.asarray(qt.codes), np.stack([np.asarray(p.codes) for p in per]))
    np.testing.assert_allclose(
        np.asarray(qt.scales), np.stack([np.asarray(p.scales) for p in per]))


def test_pack_g64_roundtrip(rng):
    from embeddings_tpu.ops.quant import (codes_int8, pack_codes_g64,
                                          pack_q4, quantize,
                                          unpack_codes_g64)
    codes = rng.integers(-8, 8, (4, 128, 96)).astype(np.int8)
    packed = pack_codes_g64(codes)
    assert packed.shape == (4, 64, 96) and packed.dtype == np.uint8
    np.testing.assert_array_equal(unpack_codes_g64(packed), codes)

    w = rng.standard_normal((128, 64)).astype(np.float32)
    qt = quantize(w, "q4_0")
    qp = pack_q4(qt)
    assert qp.packed and qp.shape == qt.shape
    np.testing.assert_array_equal(codes_int8(qp), np.asarray(qt.codes))


def test_packed_dequantize_matches(rng):
    from embeddings_tpu.ops.quant import dequantize, pack_q4, quantize
    for kind in ("q4_0", "q4_1"):
        w = rng.standard_normal((192, 64)).astype(np.float32)
        qt = quantize(w, kind)
        qp = pack_q4(qt)
        np.testing.assert_allclose(np.asarray(dequantize(qp)),
                                   np.asarray(dequantize(qt)), atol=0)


def test_pack_q4_skips_unsupported(rng):
    from embeddings_tpu.ops.quant import pack_q4, quantize
    # q8_0 stays unpacked; q4 embedding tables pack along E
    assert not pack_q4(quantize(rng.standard_normal((64, 32)).astype(
        np.float32), "q8_0")).packed
    emb = pack_q4(quantize(rng.standard_normal((32, 64)).astype(
        np.float32), "q4_0", block_axis=-1))
    assert emb.packed and emb.codes.shape == (32, 32)
    assert emb.shape == (32, 64)
    # block axis not a multiple of 64: stays unpacked
    assert not pack_q4(quantize(rng.standard_normal((96, 32)).astype(
        np.float32), "q4_0")).packed


def test_packed_gather_rows_matches(rng):
    import jax.numpy as jnp
    from embeddings_tpu.ops.quant import gather_rows, pack_q4, quantize
    table = rng.standard_normal((50, 128)).astype(np.float32)
    qt = quantize(table, "q4_0", block_axis=-1)
    qp = pack_q4(qt)
    assert qp.packed
    ids = jnp.asarray(rng.integers(0, 50, (4, 7)), jnp.int32)
    np.testing.assert_allclose(np.asarray(gather_rows(qp, ids)),
                               np.asarray(gather_rows(qt, ids)), atol=0)


def test_packed_checkpoint_roundtrip(rng, tmp_path):
    """Packed q4 save -> load roundtrip preserves codes and the packed
    flag (and the file is ~half the int8-coded size)."""
    import os
    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import params as P
    from embeddings_tpu.ops.quant import QuantizedTensor, codes_int8
    cfg = BertConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=32)
    qp = P.quantize_params(P.init_params(cfg, rng=0), "q4_0", pack4=True)
    up = qp["layers"]["mlp"]["up"]["w"]
    assert up.packed
    P.save_native(str(tmp_path / "packed.npz"), qp, cfg)
    P.save_native(str(tmp_path / "int8.npz"),
                  P.unpack_q4_params(qp), cfg)
    assert (os.path.getsize(tmp_path / "packed.npz")
            < 0.75 * os.path.getsize(tmp_path / "int8.npz"))
    loaded, _ = P.load_native(str(tmp_path / "packed.npz"))
    lw = loaded["layers"]["mlp"]["up"]["w"]
    assert isinstance(lw, QuantizedTensor) and lw.packed
    np.testing.assert_array_equal(codes_int8(lw), codes_int8(up))


def test_nf4_beats_q4_0_on_gaussian_and_heavy_tails(rng):
    """NF4's normal-quantile levels must reconstruct Gaussian AND
    heavy-tailed (trained-like) weights strictly better than q4_0's
    uniform grid at the identical storage cost — the reason the kind
    exists."""
    for data in (rng.standard_normal((256, 64)).astype(np.float32),
                 rng.standard_t(5, (256, 64)).astype(np.float32)):
        d0 = np.asarray(dequantize(quantize(data, "q4_0")))
        dn = np.asarray(dequantize(quantize(data, "nf4")))
        e0 = float(((d0 - data) ** 2).mean())
        en = float(((dn - data) ** 2).mean())
        assert en < e0, (en, e0)


def test_nf4_table_properties():
    from embeddings_tpu.ops.quant import NF4_TABLE
    assert NF4_TABLE.shape == (16,)
    assert NF4_TABLE[0] == -1.0 and NF4_TABLE[-1] == 1.0
    assert NF4_TABLE[7] == 0.0             # exact zero level
    assert (np.diff(NF4_TABLE) > 0).all()  # strictly increasing


def test_nf4_packed_roundtrip(rng):
    from embeddings_tpu.ops.quant import pack_q4
    w = rng.standard_normal((128, 16)).astype(np.float32)
    qt = quantize(w, "nf4")
    pq = pack_q4(qt)
    assert pq.packed
    np.testing.assert_allclose(np.asarray(dequantize(pq)),
                               np.asarray(dequantize(qt)))


def test_nf4_engine_end_to_end(rng, tmp_path):
    """nf4 through load_model -> packed weights -> encode, and its
    embeddings sit at least as close to f32 as q4_0's on the same
    checkpoint."""
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import load_model
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "fox", "the", "quick"]
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=128,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=256, max_position_embeddings=64)
    d = tmp_path / "m"
    d.mkdir()
    (d / "vocab.txt").write_text("\n".join(vocab))
    P.save_native(str(d / "ck.npz"), P.init_params(cfg, rng=0), cfg)
    texts = ["hello world", "the quick fox", "hello fox fox"]
    ref = load_model(d / "ck.npz").encode_batch(texts)
    e_nf4 = load_model(d / "ck.npz", dtype="nf4")
    e_q40 = load_model(d / "ck.npz", dtype="q4_0")
    assert e_nf4.params["layers"]["mlp"]["up"]["w"].packed
    cos_nf4 = (e_nf4.encode_batch(texts) * ref).sum(-1)
    cos_q40 = (e_q40.encode_batch(texts) * ref).sum(-1)
    assert cos_nf4.min() > 0.97
    assert cos_nf4.mean() >= cos_q40.mean() - 0.005, (cos_nf4, cos_q40)
