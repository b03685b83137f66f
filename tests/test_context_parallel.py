"""Sequence/context parallelism: CP forward == single-device numerics on
the virtual 8-device mesh (parallel/context.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.parallel.context import make_cp_forward, make_mesh_cp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cfg():
    return BertConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64)


@pytest.fixture(scope="module")
def params(cfg):
    return P.init_params(cfg, rng=0)


def _batch(cfg, rng, B=8, L=32):
    ids = rng.integers(5, cfg.vocab_size, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[0, 20:] = 0    # pads ending inside the last seq shard
    mask[1, 7:] = 0     # pads starting inside the first shard
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("dp,sp", [(4, 2), (2, 4), (1, 8)])
@pytest.mark.parametrize("pooling", ["mean", "cls", "max"])
def test_cp_matches_single_device(cfg, params, dp, sp, pooling):
    cfg2 = dataclasses.replace(cfg, pooling=pooling)
    ids, mask = _batch(cfg2, np.random.default_rng(0))
    ref = np.asarray(bert.encode_tokens(params, cfg2, ids, mask))
    mesh = make_mesh_cp(dp=dp, sp=sp)
    fwd = make_cp_forward(cfg2, mesh)
    got = np.asarray(fwd(params, ids, mask))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_cp_with_fused_qkv_params(cfg, params):
    """CP also accepts fuse_qkv'd params (the single-device layout)."""
    fused = P.fuse_qkv(params)
    ids, mask = _batch(cfg, np.random.default_rng(1))
    ref = np.asarray(bert.encode_tokens(fused, cfg, ids, mask))
    fwd = make_cp_forward(cfg, make_mesh_cp(dp=2, sp=4))
    got = np.asarray(fwd(fused, ids, mask))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_cp_quantized_weights(cfg, params):
    """Quantized (q4_0) weights run under CP via the XLA dequant path."""
    qp = P.quantize_params(params, "q4_0")
    ids, mask = _batch(cfg, np.random.default_rng(2))
    ref = np.asarray(bert.encode_tokens(qp, cfg, ids, mask))
    fwd = make_cp_forward(cfg, make_mesh_cp(dp=2, sp=4))
    got = np.asarray(fwd(qp, ids, mask))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_cp_global_positions(cfg, params):
    """Each shard must embed GLOBAL positions: a CP forward on [B, L]
    differs from L/sp independent position-0 chunks (guard that
    axis_index offsetting is live)."""
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), jnp.int32)
    fwd = make_cp_forward(cfg, make_mesh_cp(dp=1, sp=8))
    got = np.asarray(fwd(params, ids, mask))
    # zero out position table -> different embeddings, proving positions
    # (incl. the offset ones on later shards) contribute
    import jax.tree_util as jtu
    p2 = jtu.tree_map(lambda x: x, params)
    p2 = dict(p2)
    p2["embeddings"] = dict(p2["embeddings"])
    p2["embeddings"]["position"] = jnp.zeros_like(
        params["embeddings"]["position"])
    got2 = np.asarray(fwd(p2, ids, mask))
    assert not np.allclose(got, got2)


def test_engine_with_cp_mesh(cfg, params, small_vocab):
    """Engine accepts a (data, seq) mesh: encode_batch matches the
    single-device engine (context parallelism end-to-end through the
    batching/bucketing machinery)."""
    import dataclasses
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg2 = dataclasses.replace(cfg, vocab_size=len(small_vocab))
    p = P.init_params(cfg2, rng=0)
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=8,
                      batch_buckets=(2, 4, 8))
    eng = Engine(p, cfg2, tok, dataclasses.replace(ec),
                 mesh=make_mesh_cp(dp=2, sp=4))
    texts = ["hello world", "the quick brown fox jumps over the lazy dog",
             "a", "this is a test sentence"] * 2
    out = eng.encode_batch(texts)
    single = Engine(p, cfg2, tok, dataclasses.replace(ec))
    np.testing.assert_allclose(out, single.encode_batch(texts),
                               atol=2e-5, rtol=1e-5)


def test_cp_rotary_gated_matches_single_device():
    """Rotary (half-split) + gated-MLP model under CP: rotation applied
    to local q/k chunks before the K/V gather must equal the
    single-device rotary forward."""
    cfg2 = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=128,
                      max_position_embeddings=64,
                      position_embedding_type="rotary", rotary_base=1000.0,
                      gated_mlp=True, hidden_act="silu")
    p = P.init_params(cfg2, rng=0)
    assert "position" not in p["embeddings"]
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(5, 128, (4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[0, 20:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(bert.encode_tokens(p, cfg2, ids, mask))
    fwd = make_cp_forward(cfg2, make_mesh_cp(dp=2, sp=4))
    got = np.asarray(fwd(p, ids, mask))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_cp_shared_layers_runs_full_depth():
    """ALBERT-style shared layers under CP must apply the stored layer
    num_hidden_layers times (regression: the old scan ran it once)."""
    cfg2 = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=3,
                      num_attention_heads=2, intermediate_size=128,
                      max_position_embeddings=64, shared_layers=True,
                      embedding_size=32)
    p = P.init_params(cfg2, rng=0)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(5, 128, (2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), jnp.int32)
    ref = np.asarray(bert.encode_tokens(p, cfg2, ids, mask))
    fwd = make_cp_forward(cfg2, make_mesh_cp(dp=2, sp=4))
    got = np.asarray(fwd(p, ids, mask))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_cp_refuses_relative_attention_bias(cfg):
    cfg2 = dataclasses.replace(cfg, relative_attention_num_buckets=16)
    with pytest.raises(ValueError, match="relative bias"):
        make_cp_forward(cfg2, make_mesh_cp(dp=2, sp=4))
