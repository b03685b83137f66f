"""Sharding: DP/TP over a virtual 8-device CPU mesh must compile, run, and
match the single-device forward bit-for-bit (modulo reduction order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                     param_pspecs, shard_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cfg():
    return BertConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=8, intermediate_size=128,
                      max_position_embeddings=32)


@pytest.fixture(scope="module")
def dense_params(cfg):
    return P.init_params(cfg, rng=0)


def _batch(cfg, rng, B=8, L=16):
    ids = rng.integers(5, cfg.vocab_size, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[0, 10:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes(dp, tp):
    mesh = make_mesh(dp=dp, tp=tp)
    assert mesh.shape == {"data": dp, "model": tp}


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single(cfg, dense_params, rng, dp, tp):
    ref = bert.encode_tokens(dense_params, cfg, *_batch(cfg, np.random.default_rng(1)))
    mesh = make_mesh(dp=dp, tp=tp)
    sp = shard_params(dense_params, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    ids, mask = _batch(cfg, np.random.default_rng(1))
    got = fwd(sp, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sharded_quantized_forward(cfg, dense_params, rng):
    qp = P.quantize_params(dense_params, "q4_0")
    ref = bert.encode_tokens(qp, cfg, *_batch(cfg, np.random.default_rng(2)))
    # tp=2: attn.o has K=64 -> 2 scale blocks, the largest TP degree the
    # per-32-block layout supports at this tiny hidden size
    mesh = make_mesh(dp=4, tp=2)
    sp = shard_params(qp, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    ids, mask = _batch(cfg, np.random.default_rng(2))
    got = fwd(sp, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sharded_quantized_tp_too_large_fails_loudly(cfg, dense_params):
    """tp=4 cannot shard attn.o's 2 scale blocks: shard_map must refuse
    (a silent replication fallback would make the psum over-count)."""
    qp = P.quantize_params(dense_params, "q4_0")
    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(qp, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    ids, mask = _batch(cfg, np.random.default_rng(2))
    with pytest.raises(ValueError, match="cannot shard"):
        fwd(sp, ids, mask)
    # the GSPMD cross-check path still handles it (XLA tolerates the
    # replicated-leaf layout)
    fwd2 = make_sharded_forward(cfg, mesh, spmd="gspmd")
    ref = bert.encode_tokens(qp, cfg, *_batch(cfg, np.random.default_rng(2)))
    got = fwd2(sp, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_param_pspecs_congruent(cfg, dense_params):
    specs = param_pspecs(dense_params, make_mesh(dp=2, tp=4))
    # every leaf in params has a matching spec leaf
    pl = jax.tree_util.tree_structure(dense_params)
    sl = jax.tree_util.tree_structure(specs)
    assert pl == sl


def test_weights_actually_sharded(cfg, dense_params):
    mesh = make_mesh(dp=1, tp=8)
    sp = shard_params(dense_params, cfg, mesh)
    w = sp["layers"]["mlp"]["up"]["w"]
    # column-parallel: each device holds 1/8 of the output features
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    NL, E, F = w.shape
    assert shard_shapes == {(NL, E, F // 8)}


def test_engine_with_mesh(cfg, dense_params, small_vocab):
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    params = P.init_params(cfg2, rng=0)
    mesh = make_mesh(dp=4, tp=2)
    eng = Engine(params, cfg2, tok,
                 EngineConfig(seq_buckets=(16,), max_seq_len=16,
                              batch_size=8, batch_buckets=(8,)), mesh=mesh)
    out = eng.encode_batch(["hello world"] * 5 + ["the quick brown fox"] * 3)
    assert out.shape == (8, cfg2.hidden_size)
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)


def test_mesh_engine_does_not_mutate_shared_config(cfg, dense_params,
                                                   small_vocab):
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    params = P.init_params(cfg2, rng=0)
    ec = EngineConfig(seq_buckets=(16,), max_seq_len=16, batch_size=6,
                      batch_buckets=(1, 2, 4))
    before = (ec.batch_size, ec.batch_buckets)
    Engine(params, cfg2, tok, ec, mesh=make_mesh(dp=4, tp=2))
    assert (ec.batch_size, ec.batch_buckets) == before


def test_mesh_use_pallas_never_reaches_trace(cfg, dense_params):
    """use_pallas='never' must govern the shard_map path too: force
    'always' through a mesh forward and check it actually dispatches
    pallas (interpret mode works on CPU), proving the knob is live."""
    import dataclasses
    import embeddings_tpu.ops.attention as attn_ops
    import embeddings_tpu.ops.qmatmul as qmm
    # fused attention needs lane-aligned dims (per-shard H*D % 128 == 0,
    # ops/attention.supported); use a config that satisfies it under tp=2
    cfg = BertConfig(vocab_size=256, hidden_size=256, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=512,
                     max_position_embeddings=32)
    qp = P.quantize_params(P.init_params(cfg, rng=0), "q4_0")
    mesh = make_mesh(dp=4, tp=2)
    sp = shard_params(qp, cfg, mesh)
    calls = []
    orig_attn = attn_ops.fused_attention
    orig_qmm = qmm.qmatmul

    def spy_attn(*a, **kw):
        calls.append("attn")
        return orig_attn(*a, interpret=True, **kw)

    def spy_qmm(*a, **kw):
        calls.append("qmm")
        kw["interpret"] = True
        return orig_qmm(*a, **kw)

    attn_ops.fused_attention = spy_attn
    qmm.qmatmul = spy_qmm
    try:
        fwd = make_sharded_forward(cfg, mesh, pallas="always")
        ids, mask = _batch(cfg, np.random.default_rng(3))
        got = fwd(sp, ids, mask)
        ref = bert.encode_tokens(qp, cfg, ids, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=1e-2)
    finally:
        attn_ops.fused_attention = orig_attn
        qmm.qmatmul = orig_qmm
    assert "attn" in calls and "qmm" in calls, calls


def test_mesh_load_model_keeps_packed_q4_selectively(cfg, dense_params,
                                                     small_vocab, tmp_path):
    """A packed q4 checkpoint loaded into a mesh engine keeps the true
    4-bit layout wherever the TP shards stay group-aligned, unpacking ONLY
    the row-parallel weights whose K-shards would split group-64 packs.
    Here (hidden=64, intermediate=128, tp=2): attn.o (K=64 -> 16 packed
    rows/shard) must unpack; mlp.down (K=128 -> 32/shard) and all
    column-parallel weights stay packed. Embeddings still match the
    single-device packed engine."""
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.ops.quant import QuantizedTensor
    from embeddings_tpu.runtime.engine import load_model
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    qp = P.pack_q4_params(P.quantize_params(
        P.init_params(cfg2, rng=0), "q4_0"))
    P.save_native(str(tmp_path / "m.npz"), qp, cfg2)
    (tmp_path / "vocab.txt").write_text("\n".join(small_vocab))
    ec = EngineConfig(seq_buckets=(16,), max_seq_len=16,
                      batch_size=8, batch_buckets=(8,))
    eng = load_model(tmp_path / "m.npz", dtype="q4_0",
                     engine_config=ec, mesh=make_mesh(dp=4, tp=2))
    layers = eng.params["layers"]
    o_w = layers["attn"]["o"]["w"]
    assert isinstance(o_w, QuantizedTensor) and not o_w.packed
    for grp, name in (("attn", "q"), ("attn", "k"), ("attn", "v"),
                      ("mlp", "up"), ("mlp", "down")):
        w = layers[grp][name]["w"]
        assert isinstance(w, QuantizedTensor) and w.packed, (grp, name)
    out = eng.encode_batch(["hello world"] * 8)
    assert np.isfinite(out).all() and out.shape == (8, cfg2.hidden_size)
    single = load_model(tmp_path / "m.npz", dtype="q4_0",
                        engine_config=dataclasses.replace(ec))
    ref = single.encode_batch(["hello world"] * 8)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_mesh_fully_packed_q4_parity(small_vocab, tmp_path):
    """Production-shaped dims (K % 64*tp == 0 everywhere): ALL matmul
    weights stay packed under tp=2 and the mesh engine matches the
    single-device packed engine."""
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.ops.quant import QuantizedTensor
    from embeddings_tpu.runtime.engine import load_model
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=256,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=512, max_position_embeddings=32)
    qp = P.pack_q4_params(P.quantize_params(P.init_params(cfg, rng=1),
                                            "q4_0"))
    P.save_native(str(tmp_path / "m.npz"), qp, cfg)
    (tmp_path / "vocab.txt").write_text("\n".join(small_vocab))
    ec = EngineConfig(seq_buckets=(16,), max_seq_len=16,
                      batch_size=8, batch_buckets=(8,))
    eng = load_model(tmp_path / "m.npz", dtype="q4_0",
                     engine_config=ec, mesh=make_mesh(dp=4, tp=2))
    for grp, name in (("attn", "q"), ("attn", "k"), ("attn", "v"),
                      ("attn", "o"), ("mlp", "up"), ("mlp", "down")):
        w = eng.params["layers"][grp][name]["w"]
        assert isinstance(w, QuantizedTensor) and w.packed, (grp, name)
    texts = ["hello world", "the quick brown fox"] * 4
    out = eng.encode_batch(texts)
    single = load_model(tmp_path / "m.npz", dtype="q4_0",
                        engine_config=dataclasses.replace(ec))
    np.testing.assert_allclose(out, single.encode_batch(texts),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_mesh_packed_encode_matches_single_device(cfg, small_vocab, dp, tp):
    """Token packing routes through the mesh (rows over 'data', TP within
    shards) and matches both the single-device packed path and the
    bucketed mesh path — the 1.5x packing win survives scale-out."""
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    params = P.init_params(cfg2, rng=0)
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=8,
                      batch_buckets=(8,))
    texts = (["hello world"] * 3 + ["the quick brown fox"] * 4
             + ["hello", "fox fox fox"] * 3)
    mesh_eng = Engine(params, cfg2, tok, ec, mesh=make_mesh(dp=dp, tp=tp))
    single = Engine(params, cfg2, tok, ec)
    a = mesh_eng.encode_batch_packed(texts, row_len=16)
    b = single.encode_batch_packed(texts, row_len=16)
    c = mesh_eng.encode_batch(texts)
    assert a.shape == (len(texts), cfg2.hidden_size)
    np.testing.assert_allclose(a, b, atol=2e-5)
    np.testing.assert_allclose(a, c, atol=2e-4)


def test_mesh_packed_quantized(cfg, small_vocab):
    """Packed + packed-4-bit weights + TP all compose on the mesh."""
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.parallel.sharding import adapt_packed_params
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    base = P.init_params(cfg2, rng=0)
    qp = P.quantize_params(base, "q4_0")
    qp = P.pack_q4_params(qp)
    mesh = make_mesh(dp=4, tp=2)
    qp = adapt_packed_params(qp, mesh)
    ec = EngineConfig(seq_buckets=(16,), max_seq_len=16, batch_size=8,
                      batch_buckets=(8,))
    texts = ["hello world", "fox", "the quick brown fox", "hello"] * 3
    meng = Engine(qp, cfg2, tok, ec, mesh=mesh)
    seng = Engine(qp, cfg2, tok, ec)
    a = meng.encode_batch_packed(texts, row_len=16)
    b = seng.encode_batch_packed(texts, row_len=16)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mesh_packed_fails_loudly_when_tp_cannot_shard(small_vocab):
    """The packed mesh path enforces the same fail-loud contract as the
    bucketed path: a model whose quantized weights cannot shard at the
    requested tp must raise the clear ValueError, not die deep in
    tracing or silently psum-over-count."""
    import dataclasses
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    # hidden=32: q4_0 scales [NL, 1, 32] cannot split 1 block over tp=2
    tiny = BertConfig(vocab_size=len(small_vocab), hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64, max_position_embeddings=32)
    qp = P.quantize_params(P.init_params(tiny, rng=0), "q4_0")
    ec = EngineConfig(seq_buckets=(16,), max_seq_len=16, batch_size=4,
                      batch_buckets=(4,))
    eng = Engine(qp, tiny, tok, ec, mesh=make_mesh(dp=4, tp=2))
    with pytest.raises(ValueError, match="cannot shard"):
        eng.encode_batch_packed(["hello world", "fox"] * 4, row_len=16)


def test_sharded_rotary_gated_forward_matches_single():
    """nomic-style rotary + gated MLP under dp x tp shard_map: the gate
    weight is column-parallel and the per-head rotation composes with
    head sharding."""
    cfg2 = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=8, intermediate_size=128,
                      max_position_embeddings=32,
                      position_embedding_type="rotary", rotary_base=1000.0,
                      gated_mlp=True, hidden_act="silu")
    p = P.init_params(cfg2, rng=0)
    rng_l = np.random.default_rng(7)
    ids = jnp.asarray(rng_l.integers(5, 128, (8, 16)), jnp.int32)
    mask = np.ones((8, 16), np.int32)
    mask[0, 10:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(bert.encode_tokens(p, cfg2, ids, mask))
    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(p, cfg2, mesh)
    assert "position" not in sp["embeddings"]
    fwd = make_sharded_forward(cfg2, mesh)
    got = np.asarray(fwd(sp, ids, mask))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
