"""Token-level packing: planner invariants and packed-vs-unpacked
numerical parity (packing must be a pure layout change)."""

import numpy as np
import pytest

import jax.numpy as jnp

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.runtime.packing import materialize, plan_packing


def test_planner_covers_every_sentence_once():
    rng = np.random.default_rng(0)
    lengths = rng.integers(3, 40, size=57).tolist()
    batches = plan_packing(lengths, row_len=64, batch_rows=4)
    seen = []
    for b in batches:
        assert b.batch <= 4
        for row in b.rows:
            total = 0
            for sg in row:
                seen.append(sg.sentence)
                total += sg.length
                assert sg.start + sg.length <= b.seq
            assert total <= b.seq
            # segments are laid out contiguously without overlap
            starts = sorted((sg.start, sg.length) for sg in row)
            pos = 0
            for st, ln in starts:
                assert st == pos
                pos += ln
        assert b.n_seg >= max(len(r) for r in b.rows)
    assert sorted(seen) == list(range(57))


def test_planner_truncates_overlong():
    batches = plan_packing([100], row_len=32, batch_rows=2)
    assert batches[0].rows[0][0].length == 32


def test_materialize_arrays():
    toks = [[2, 5, 6, 3], [2, 7, 3], [2, 8, 9, 10, 3]]
    batches = plan_packing([len(t) for t in toks], row_len=8, batch_rows=2)
    b = batches[0]
    ids, seg, pos, pool, mapping = materialize(b, toks, pad_id=0)
    assert ids.shape == seg.shape == pos.shape
    assert pool.shape[0] == ids.shape[0] and pool.shape[2] == ids.shape[1]
    # every sentence appears in the mapping exactly once
    assert sorted(m[2] for m in mapping) == [0, 1, 2]
    for r, s, i in mapping:
        row_mask = seg[r] == s
        assert row_mask.sum() == min(len(toks[i]), b.seq)
        np.testing.assert_array_equal(ids[r][row_mask],
                                      toks[i][: row_mask.sum()])
        # positions restart at 0 per segment
        np.testing.assert_array_equal(pos[r][row_mask],
                                      np.arange(row_mask.sum()))
        # mean pooling weights sum to 1 over the segment
        assert pool[r, s].sum() == pytest.approx(1.0)


@pytest.mark.parametrize("pooling", ["mean", "cls"])
def test_packed_matches_unpacked(rng, tiny_config, pooling):
    import dataclasses
    cfg = dataclasses.replace(tiny_config, pooling=pooling)
    params = P.init_params(cfg, rng=0)
    toks = [list(rng.integers(5, cfg.vocab_size, size=int(n)))
            for n in rng.integers(3, 14, size=9)]

    # reference: encode each sentence in its own padded row
    L = 16
    ids = np.zeros((len(toks), L), np.int32)
    mask = np.zeros((len(toks), L), np.int32)
    for i, t in enumerate(toks):
        ids[i, : len(t)] = t
        mask[i, : len(t)] = 1
    ref = np.asarray(bert.encode_tokens(params, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))

    # packed: several sentences per row
    batches = plan_packing([len(t) for t in toks], row_len=32, batch_rows=4)
    got = np.empty_like(ref)
    for b in batches:
        pids, seg, pos, pool, mapping = materialize(b, toks, pad_id=0,
                                                    pooling=pooling)
        out = np.asarray(bert.encode_packed(
            params, cfg, jnp.asarray(pids), jnp.asarray(seg),
            jnp.asarray(pos), jnp.asarray(pool)))
        for r, s, i in mapping:
            got[i] = out[r, s]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_block_ranges():
    from embeddings_tpu.ops.attention import BQ, block_ranges
    L = 2 * BQ
    seg = np.full((3, L), -1, np.int32)
    # row 0: seg 0 spans [0, 100), seg 1 [100, 150), seg 2 [150, 260)
    seg[0, :100] = 0
    seg[0, 100:150] = 1
    seg[0, 150:256] = 2
    # row 1: one segment entirely inside the first block
    seg[1, :40] = 0
    # row 2: all pad
    kbs, kbe = block_ranges(jnp.asarray(seg), L)
    kbs, kbe = np.asarray(kbs), np.asarray(kbe)
    # row 0 qblock 0 holds segs 0-2 spanning tokens [0, 256) -> blocks 0-1
    assert (kbs[0, 0], kbe[0, 0]) == (0, 1)
    # row 0 qblock 1 holds segs 1-2 spanning [100, 256) -> blocks 0-1
    assert (kbs[0, 1], kbe[0, 1]) == (0, 1)
    # row 1 qblock 0: seg 0 spans [0, 40) -> block 0 only (skip saves 50%)
    assert (kbs[1, 0], kbe[1, 0]) == (0, 0)
    # empty query blocks run a zero-trip loop
    assert kbe[1, 1] < kbs[1, 1]
    assert (kbe[2] < kbs[2]).all()


def test_blockskip_kernel_matches_full_segmented(rng):
    """fused_attention_segmented_blockskip == fused_attention_segmented on
    packed rows of 256 tokens (interpret mode)."""
    from embeddings_tpu.ops.attention import (
        fused_attention_segmented, fused_attention_segmented_blockskip)
    B, L, H, D = 3, 256, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)), jnp.float32)
    seg = np.full((B, L), -1, np.int32)
    cuts = [(0, [0, 90, 130, 200, 256]),      # segments straddle blocks
            (1, [0, 256]),                    # one full-row segment
            (2, [0, 60])]                     # short row, mostly pad
    for b, edges in cuts:
        for s, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
            seg[b, lo:hi] = s
    segj = jnp.asarray(seg)
    ref = np.asarray(fused_attention_segmented(
        qkv, segj, B=B, L=L, H=H, D=D, interpret=True), np.float32)
    from embeddings_tpu.runtime.packing import max_block_span
    for window in (max_block_span(seg), 0):  # exact window and full width
        got = np.asarray(fused_attention_segmented_blockskip(
            qkv, segj, B=B, L=L, H=H, D=D, window=window,
            interpret=True), np.float32)
        valid = (seg >= 0).reshape(B * L)
        np.testing.assert_allclose(got[valid], ref[valid],
                                   atol=2e-3, rtol=1e-2)
        assert np.isfinite(got).all()


def test_packed_long_rows_blockskip_end_to_end(rng, tiny_config):
    """encode_packed at row_len=640 routes through the blockskip kernel
    (window <= nK-2: segments span at most 3 of the 5 key blocks) and
    matches the einsum path. Rows this long are the long-context
    extension territory where the windowed kernel pays off; at L <= 512
    the monolithic segmented kernel is dispatched instead."""
    import dataclasses
    import functools
    import importlib
    from embeddings_tpu.models import params as P2
    import embeddings_tpu.ops.attention as attn_ops
    linmod = importlib.import_module("embeddings_tpu.ops.linear")

    cfg = dataclasses.replace(tiny_config, num_attention_heads=2,
                              hidden_size=128,
                              max_position_embeddings=640)
    params = P2.fuse_qkv(P2.init_params(cfg, rng=0))
    # segments shorter than one block span at most 3 key blocks (start
    # in the previous block, end in the next), so window <= 3 <= nK-2 = 3
    toks = [list(rng.integers(5, cfg.vocab_size, size=int(n)))
            for n in rng.integers(20, 120, size=16)]
    batches = plan_packing([len(t) for t in toks], row_len=640,
                           batch_rows=4)
    b = batches[0]
    pids, seg, pos, pool, mapping = materialize(b, toks, pad_id=0)
    from embeddings_tpu.runtime.packing import max_block_span
    window = max_block_span(seg)
    assert 1 <= window <= 3, window
    args = (params, cfg, jnp.asarray(pids), jnp.asarray(seg),
            jnp.asarray(pos), jnp.asarray(pool))
    ref = np.asarray(bert.encode_packed(*args))  # einsum path (CPU)

    calls = []
    orig = attn_ops.fused_attention_segmented_blockskip

    def spy(*a, **kw):
        calls.append(kw.get("window"))
        return orig(*a, interpret=True, **kw)

    attn_ops.fused_attention_segmented_blockskip = spy
    try:
        with linmod.pallas_mode("always"):
            got = np.asarray(bert.encode_packed(*args,
                                                attn_window=window))
    finally:
        attn_ops.fused_attention_segmented_blockskip = orig
    assert calls and calls[0] == window, \
        "blockskip kernel was not dispatched at row_len=256"
    for r, s, i in mapping:
        cos = float((got[r, s] * ref[r, s]).sum())
        assert cos > 0.999, (r, s, cos)
    assert np.isfinite(got).all()


def test_segmented_fused_kernel_matches_einsum(rng, tiny_config):
    """Pallas segmented attention (interpret mode) == packed einsum path."""
    import dataclasses
    import functools
    import importlib
    from embeddings_tpu.models import params as P2
    import embeddings_tpu.ops.attention as attn_ops
    linmod = importlib.import_module("embeddings_tpu.ops.linear")

    cfg = dataclasses.replace(tiny_config, num_attention_heads=2,
                              hidden_size=64)
    params = P2.fuse_qkv(P2.init_params(cfg, rng=0))
    toks = [list(rng.integers(5, cfg.vocab_size, size=int(n)))
            for n in rng.integers(3, 10, size=6)]
    batches = plan_packing([len(t) for t in toks], row_len=16, batch_rows=4)
    b = batches[0]
    pids, seg, pos, pool, mapping = materialize(b, toks, pad_id=0)
    args = (params, cfg, jnp.asarray(pids), jnp.asarray(seg),
            jnp.asarray(pos), jnp.asarray(pool))
    ref = np.asarray(bert.encode_packed(*args))  # einsum path (CPU)

    orig = attn_ops.fused_attention_segmented
    attn_ops.fused_attention_segmented = functools.partial(
        orig, interpret=True)
    try:
        with linmod.pallas_mode("always"):
            got = np.asarray(bert.encode_packed(*args))
    finally:
        attn_ops.fused_attention_segmented = orig
    # compare only real segments (empty slots are zeros either way)
    for r, s, i in mapping:
        cos = float((got[r, s] * ref[r, s]).sum())
        assert cos > 0.999, (r, s, cos)
    assert np.isfinite(got).all()


def test_engine_packed_encode_matches_unpacked(small_vocab):
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    eng = Engine(P.init_params(cfg, rng=0), cfg, tok,
                 EngineConfig(seq_buckets=(16, 32), max_seq_len=32,
                              batch_size=4, batch_buckets=(1, 2, 4)))
    texts = ["hello world", "the quick brown fox jumps over the lazy dog",
             "a test sentence", "model", "apple banana water fire earth",
             "hello", "good new old big small"] * 2
    ref = eng.encode_batch(texts)
    got = eng.encode_batch_packed(texts)
    assert got.shape == ref.shape
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.9999, cos.min()


def test_planner_many_tiny_segments():
    """A row packing >128 segments used to crash pick_bucket; and the
    best-fit planner must stay fast on large inputs."""
    import time
    batches = plan_packing([300] + [2] * 400, row_len=512, batch_rows=64)
    seen = sorted(sg.sentence for b in batches for row in b.rows
                  for sg in row)
    assert seen == list(range(401))
    # CPU time, not wall clock: the bound must hold under full-suite
    # machine load too (the first-fit scan this guards against took
    # minutes, so the margin stays meaningful)
    t0 = time.process_time()
    plan_packing([5] * 200_000, row_len=128, batch_rows=256)
    assert time.process_time() - t0 < 10.0  # O(n log n)


def test_engine_packed_hybrid_long_sentences(small_vocab):
    """Sentences longer than row_len must take the bucketed path (not be
    truncated) while short ones pack — same results as plain encode."""
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    eng = Engine(P.init_params(cfg, rng=0), cfg, tok,
                 EngineConfig(seq_buckets=(8, 16, 32), max_seq_len=32,
                              batch_size=4, batch_buckets=(1, 2, 4)))
    texts = ["hello world", "a " * 20 + "test", "model",  # 2nd exceeds 16
             "the quick brown fox", "b " * 25]
    ref = eng.encode_batch(texts)
    got = eng.encode_batch_packed(texts, row_len=16)
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.9999, cos


def test_bucket_window_quantizes_static_jit_arg():
    """The packed attention window is a STATIC jit arg: distinct raw spans
    must collapse to a handful of compile keys, never shrink below the
    true span (correctness), and spans past the block-skip threshold must
    share one monolithic-kernel sentinel."""
    from embeddings_tpu.runtime.engine import _bucket_window
    assert _bucket_window(0, 1024) == 0
    # all spans <= a bucket value round UP to it (never down)
    for w in (1, 2, 3):
        assert _bucket_window(w, 1024) == 3
    assert _bucket_window(5, 1024) == 6
    # nk=8 for L=1024: threshold nk-2=6; spans past it share one sentinel
    assert _bucket_window(7, 1024) == 8 == _bucket_window(8, 1024)
    # bucketed value never below the input span
    for L in (256, 512, 1024, 2048):
        for w in range(0, L // 128 + 1):
            b = _bucket_window(w, L)
            assert b >= w, (w, L, b)
    # distinct compile keys stay small for a whole corpus of spans
    keys = {_bucket_window(w, 2048) for w in range(17)}
    assert len(keys) <= 8, keys


def test_engine_long_context_1024_packed(small_vocab):
    """>512-token engine path (the reference hard-caps at 512): an
    L=1024 model packs short texts into 1024-token rows (windowed
    attention on TPU; XLA fallback here) and matches the bucketed
    encode. Validates engine bucketing/window plumbing past the
    reference's cap on any backend."""
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=1024)
    params = P.init_params(cfg, rng=0)
    ec = EngineConfig(max_seq_len=1024, batch_size=4,
                      seq_buckets=(32, 1024), batch_buckets=(1, 2, 4))
    eng = Engine(params, cfg, tok, ec)
    texts = ["hello world", "the quick brown fox", "fox fox",
             "hello hello hello world"] * 6
    packed = eng.encode_batch_packed(texts, row_len=1024, batch_rows=2)
    bucketed = eng.encode_batch(texts)
    np.testing.assert_allclose(packed, bucketed, atol=2e-4)
