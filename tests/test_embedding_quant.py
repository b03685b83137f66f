"""Output-embedding quantization (utils/embedding_quant): numerics,
similarity preservation, and the HTTP precision option."""

import numpy as np
import pytest

from embeddings_tpu.utils.embedding_quant import (calibration_ranges,
                                                  hamming_distance,
                                                  quantize_embeddings)


@pytest.fixture()
def embs(rng):
    e = rng.standard_normal((64, 128)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_int8_roundtrip_preserves_similarity(embs):
    q = quantize_embeddings(embs, "int8")
    assert q.dtype == np.int8 and q.shape == embs.shape
    lo, hi = calibration_ranges(embs)
    deq = (q.astype(np.float32) + 128) / 255.0 * (hi - lo) + lo
    cos = (deq * embs).sum(-1) / (np.linalg.norm(deq, axis=-1)
                                  * np.linalg.norm(embs, axis=-1))
    assert cos.min() > 0.995
    # similarity ordering survives: top-1 neighbor agreement
    sims_f = embs @ embs.T
    sims_q = deq @ deq.T
    np.fill_diagonal(sims_f, -1)
    np.fill_diagonal(sims_q, -1)
    agree = (sims_f.argmax(-1) == sims_q.argmax(-1)).mean()
    assert agree > 0.9


def test_uint8_matches_int8_plus_offset(embs):
    qi = quantize_embeddings(embs, "int8")
    qu = quantize_embeddings(embs, "uint8")
    np.testing.assert_array_equal(qi.astype(np.int16) + 128,
                                  qu.astype(np.int16))


def test_explicit_ranges_are_stable(embs):
    ranges = calibration_ranges(embs[:32])
    a = quantize_embeddings(embs[32:], "int8", ranges=ranges)
    b = quantize_embeddings(embs[32:48], "int8", ranges=ranges)
    np.testing.assert_array_equal(a[:16], b)  # batch-independent


def test_binary_packbits_and_hamming(embs):
    ub = quantize_embeddings(embs, "ubinary")
    sb = quantize_embeddings(embs, "binary")
    assert ub.dtype == np.uint8 and ub.shape == (64, 16)  # 128/8
    assert sb.dtype == np.int8
    # binary == ubinary shifted by -128 (SentenceTransformers layout)
    np.testing.assert_array_equal(
        (sb.astype(np.int16) + 128).astype(np.uint8), ub)
    # Hamming distance identical through either representation, and
    # zero on the diagonal
    d1 = hamming_distance(ub, ub)
    d2 = hamming_distance(sb, sb)
    np.testing.assert_array_equal(d1, d2)
    assert (np.diag(d1) == 0).all()
    # near-duplicates must be Hamming-nearest: pair each vector with a
    # lightly-noised copy (random gaussians have no cluster structure,
    # so plain cosine-vs-hamming top-1 is too noisy to assert on)
    rng2 = np.random.default_rng(1)
    noisy = embs + 0.1 * rng2.standard_normal(embs.shape).astype(
        np.float32)
    d = hamming_distance(quantize_embeddings(embs, "ubinary"),
                         quantize_embeddings(noisy, "ubinary"))
    assert (d.argmin(-1) == np.arange(len(embs))).mean() > 0.9


def test_bad_precision_raises(embs):
    with pytest.raises(ValueError, match="precision"):
        quantize_embeddings(embs, "int4")


def test_http_precision_option(small_vocab):
    """POST /embed {"precision": "int8"/"ubinary"} returns quantized
    vectors with the precision echoed."""
    pytest.importorskip("aiohttp")
    import asyncio
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.runtime.server import serve_http
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    eng = Engine(P.init_params(cfg, rng=0), cfg, tok,
                 EngineConfig(seq_buckets=(16,), max_seq_len=16,
                              batch_size=4, batch_buckets=(1, 2, 4)))

    async def go():
        runner, svc = await serve_http(eng, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            import json as j
            import urllib.request, urllib.error
            def post(data):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/embed", data=data,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=10) as resp:
                        return resp.status, j.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, None
            results["int8"] = post(j.dumps(
                {"texts": ["hello world", "hello"],
                 "precision": "int8"}).encode())
            results["ubinary"] = post(j.dumps(
                {"texts": ["hello world"],
                 "precision": "ubinary"}).encode())
            results["bad"] = post(j.dumps(
                {"texts": ["x"], "precision": "int4"}).encode())

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = asyncio.run(go())
    status, body = r["int8"]
    assert status == 200 and body["precision"] == "int8"
    vals = np.asarray(body["embeddings"])
    assert vals.dtype.kind == "i" and vals.min() >= -128 \
        and vals.max() <= 127
    status, body = r["ubinary"]
    assert status == 200
    assert len(body["embeddings"][0]) == eng.n_embd // 8
    assert r["bad"][0] == 400
