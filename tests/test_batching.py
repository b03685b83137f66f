"""Batch planning + Engine encode/encode_batch semantics."""

import numpy as np
import pytest

from embeddings_tpu.runtime.batching import (BatchPlan, pad_batch,
                                             pick_bucket, plan_batches)


def test_pick_bucket():
    assert pick_bucket(1, (16, 32, 64)) == 16
    assert pick_bucket(16, (16, 32, 64)) == 16
    assert pick_bucket(17, (16, 32, 64)) == 32
    with pytest.raises(ValueError):
        pick_bucket(65, (16, 32, 64))


def test_plan_batches_sorted_ascending():
    lengths = [30, 5, 12, 7, 20, 3]
    plans = plan_batches(lengths, batch_size=2, seq_buckets=(8, 16, 32))
    # covers all indices exactly once
    seen = sorted(i for p in plans for i in p.indices)
    assert seen == list(range(6))
    # ascending length order across chunks (reference sorts ascending,
    # bert.cpp:1424-1425)
    chunk_maxes = [max(lengths[i] for i in p.indices) for p in plans]
    assert chunk_maxes == sorted(chunk_maxes)
    # shapes snapped to buckets
    assert all(p.seq in (8, 16, 32) for p in plans)


def test_plan_batches_batch_buckets():
    plans = plan_batches([4] * 5, batch_size=4, seq_buckets=(8,),
                         batch_buckets=(1, 2, 4))
    assert [p.batch for p in plans] == [4, 1]


def test_pad_batch():
    ids, mask = pad_batch([[2, 5, 3], [2, 3]], batch=4, seq=8, pad_id=0)
    assert ids.shape == (4, 8) and mask.shape == (4, 8)
    assert ids[0, :3].tolist() == [2, 5, 3] and mask[0].sum() == 3
    assert mask[2].sum() == 0  # padded row


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self, small_vocab, tiny_config):
        import dataclasses
        from embeddings_tpu.config import EngineConfig
        from embeddings_tpu.models import params as P
        from embeddings_tpu.runtime.engine import Engine
        from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
        tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
        cfg = dataclasses.replace(tiny_config, vocab_size=len(small_vocab),
                                  max_position_embeddings=64)
        params = P.init_params(cfg, rng=0)
        ec = EngineConfig(seq_buckets=(8, 16, 32), max_seq_len=32,
                          batch_size=4, batch_buckets=(1, 2, 4))
        return Engine(params, cfg, tok, ec)

    def test_encode_single(self, engine):
        v = engine.encode("hello world")
        assert v.shape == (engine.n_embd,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)

    def test_encode_batch_matches_single(self, engine):
        texts = ["hello world", "the quick brown fox jumps over the lazy dog",
                 "a", "this is a test sentence", "walk talk run",
                 "an old big small new"]
        batch = engine.encode_batch(texts, batch_size=2)
        for i, t in enumerate(texts):
            single = engine.encode(t)
            np.testing.assert_allclose(batch[i], single, atol=1e-4), t

    def test_encode_batch_order_restored(self, engine):
        """Length sorting must not permute outputs (the reference scatters
        through output pointers, bert.cpp:1430-1442)."""
        texts = ["hello world test sentence", "a"]
        b = engine.encode_batch(texts, batch_size=1)
        s0, s1 = engine.encode(texts[0]), engine.encode(texts[1])
        np.testing.assert_allclose(b[0], s0, atol=1e-4)
        np.testing.assert_allclose(b[1], s1, atol=1e-4)

    def test_truncation_at_max_seq(self, engine):
        long = "hello " * 100
        v = engine.encode(long)
        assert v.shape == (engine.n_embd,)
        assert len(engine.tokenize(long)) <= engine.max_seq_len

    def test_empty_batch(self, engine):
        out = engine.encode_batch([])
        assert out.shape == (0, engine.n_embd)

    def test_warmup(self, engine):
        n = engine.warmup(batch_sizes=(1, 2), seq_lens=(8, 16))
        assert n == 4

    def test_warmup_packed(self, engine):
        """Packed-path warmup precompiles the serving program family and
        goes through the real packed encode (so a cold server never
        compiles mid-request — the load-test p99 outlier)."""
        n = engine.warmup_packed(row_len=16, batch_rows=4,
                                 segs_per_row=(2, 4))
        assert n >= 2

    def test_encode_batch_backpressure_window(self, engine):
        """In-flight device batches are bounded by inflight_batches: the
        dispatch/drain interleaving never holds more than window+1 results
        (so retrieval-scale encodes run in O(window) device memory)."""
        events = []
        real_forward = engine._forward

        class _Lazy:
            def __init__(self, arr, i):
                self.arr, self.i = arr, i

            def __array__(self, dtype=None, copy=None):
                events.append(("drain", self.i))
                return np.asarray(self.arr)

        def spy(params, ids, mask):
            i = sum(1 for e in events if e[0] == "dispatch")
            events.append(("dispatch", i))
            return _Lazy(real_forward(params, ids, mask), i)

        engine._forward = spy
        try:
            engine.engine_config.inflight_batches = 2
            texts = [f"hello world {'a ' * (i % 5)}" for i in range(24)]
            out = engine.encode_batch(texts, batch_size=2)
        finally:
            engine._forward = real_forward
            engine.engine_config.inflight_batches = 4
        assert out.shape == (24, engine.n_embd)
        live = peak = 0
        for kind, _ in events:
            live += 1 if kind == "dispatch" else -1
            peak = max(peak, live)
        n_dispatch = sum(1 for e in events if e[0] == "dispatch")
        assert n_dispatch >= 6, events       # enough batches to exercise it
        assert peak <= 3, (peak, events)     # window + the one just issued
        # results still land in input order
        ref = engine.encode_batch(texts, batch_size=2)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_extend_buckets():
    from embeddings_tpu.runtime.batching import extend_buckets
    assert extend_buckets((1, 2, 4, 8, 16, 32), 40)[-1] == 40
    assert extend_buckets((1, 2), 2) == (1, 2)
    assert extend_buckets((), 5)[-1] == 5
    bb = extend_buckets((1, 2, 4, 8, 16, 32), 100)
    assert bb == (1, 2, 4, 8, 16, 32, 64, 100)
