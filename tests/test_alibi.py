"""ALiBi family (jina-bert-v2): numerical parity + end-to-end loading.

jina-embeddings-v2-* = BERT's post-LN block with a symmetric per-head
ALiBi penalty (-slope_h * |i-j|) on the attention logits instead of a
learned position table, and a GeGLU MLP (gated_layers [2I, E] split
gate|up, wo down-projection, layernorm). Beyond the reference's model
zoo (BERT-family only, /root/reference/bert.cpp:575-647); llama.cpp
models the same family as arch JINA_BERT_V2.

transformers does not ship jina-bert (it is trust_remote_code), so the
oracle here is a hand-built torch functional forward replicating the
published block ordering — the same offline method test_rotary.py uses
for nomic-bert.
"""

import json
import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.ops.alibi import alibi_slopes

VOCAB = 96
HIDDEN = 64
HEADS = 4
INTER = 128
NL = 3


def paper_slopes(n):
    """Verbatim get_slopes from the ALiBi paper (Press et al. 2022),
    the function jina's modeling code copies."""
    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        ratio = start
        return [start * ratio ** i for i in range(n)]
    if math.log2(n).is_integer():
        return pow2(n)
    closest = 2 ** math.floor(math.log2(n))
    return pow2(closest) + paper_slopes(2 * closest)[0::2][:n - closest]


@pytest.mark.parametrize("n", [1, 2, 4, 8, 12, 14, 16, 32])
def test_slopes_match_paper(n):
    np.testing.assert_allclose(alibi_slopes(n), paper_slopes(n), rtol=1e-12)


def jina_config_dict(**over):
    d = dict(model_type="bert", vocab_size=VOCAB, hidden_size=HIDDEN,
             num_hidden_layers=NL, num_attention_heads=HEADS,
             intermediate_size=INTER, max_position_embeddings=128,
             type_vocab_size=2, layer_norm_eps=1e-12,
             position_embedding_type="alibi", feed_forward_type="geglu",
             hidden_act="gelu", pad_token_id=0)
    d.update(over)
    return d


def test_config_mapping():
    cfg = BertConfig.from_hf_dict(jina_config_dict())
    assert cfg.position_embedding_type == "alibi"
    assert cfg.gated_mlp and cfg.hidden_act == "gelu"
    cfg = BertConfig.from_hf_dict(jina_config_dict(feed_forward_type="reglu"))
    assert cfg.gated_mlp and cfg.hidden_act == "relu"
    cfg = BertConfig.from_hf_dict(
        jina_config_dict(feed_forward_type="original"))
    assert not cfg.gated_mlp
    with pytest.raises(ValueError, match="feed_forward_type"):
        BertConfig.from_hf_dict(jina_config_dict(feed_forward_type="glu?"))


def make_jina_state_dict(seed=0, feed_forward_type="geglu"):
    """Random jina-bert-v2-named state dict (HF [out, in] weights)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {
        "embeddings.word_embeddings.weight": w(VOCAB, HIDDEN),
        "embeddings.token_type_embeddings.weight": w(2, HIDDEN),
        "embeddings.LayerNorm.weight": 1.0 + 0.1 * w(HIDDEN),
        "embeddings.LayerNorm.bias": 0.1 * w(HIDDEN),
    }
    for i in range(NL):
        p = f"encoder.layer.{i}."
        for name in ("query", "key", "value"):
            sd[p + f"attention.self.{name}.weight"] = w(HIDDEN, HIDDEN)
            sd[p + f"attention.self.{name}.bias"] = 0.1 * w(HIDDEN)
        sd[p + "attention.output.dense.weight"] = w(HIDDEN, HIDDEN)
        sd[p + "attention.output.dense.bias"] = 0.1 * w(HIDDEN)
        sd[p + "attention.output.LayerNorm.weight"] = 1.0 + 0.1 * w(HIDDEN)
        sd[p + "attention.output.LayerNorm.bias"] = 0.1 * w(HIDDEN)
        if feed_forward_type == "geglu":
            sd[p + "mlp.gated_layers.weight"] = w(2 * INTER, HIDDEN)
        else:
            sd[p + "mlp.up_layer.weight"] = w(INTER, HIDDEN)
            sd[p + "mlp.up_layer.bias"] = 0.1 * w(INTER)
        sd[p + "mlp.wo.weight"] = w(HIDDEN, INTER)
        sd[p + "mlp.wo.bias"] = 0.1 * w(HIDDEN)
        sd[p + "mlp.layernorm.weight"] = 1.0 + 0.1 * w(HIDDEN)
        sd[p + "mlp.layernorm.bias"] = 0.1 * w(HIDDEN)
    return sd


def torch_oracle(sd, ids, mask, *, gated=True):
    """Functional torch forward replicating jina-bert-v2's block order:
    emb-sum + LN; per layer {MHA with -slope|i-j| logit bias + key pad
    mask, o-proj, residual, LN, GeGLU MLP (gelu(gate)*up -> wo),
    residual, LN}. Returns last_hidden_state [B, L, E] numpy."""
    t = {k: torch.tensor(v) for k, v in sd.items()}
    ids_t = torch.tensor(np.asarray(ids, np.int64))
    m = torch.tensor(np.asarray(mask, np.float32))
    B, L = ids_t.shape
    H, D = HEADS, HIDDEN // HEADS

    def ln(x, p):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), t[p + ".weight"], t[p + ".bias"], 1e-12)

    x = (t["embeddings.word_embeddings.weight"][ids_t]
         + t["embeddings.token_type_embeddings.weight"][0])
    x = ln(x, "embeddings.LayerNorm")

    slopes = torch.tensor(paper_slopes(H))
    pos = torch.arange(L)
    bias = -slopes[:, None, None] * (pos[None, :] - pos[:, None]).abs()
    key_bias = (1.0 - m)[:, None, None, :] * -1e9

    def lin(x, p):
        return x @ t[p + ".weight"].T + t[p + ".bias"]

    for i in range(NL):
        p = f"encoder.layer.{i}."
        q = lin(x, p + "attention.self.query").view(B, L, H, D)
        k = lin(x, p + "attention.self.key").view(B, L, H, D)
        v = lin(x, p + "attention.self.value").view(B, L, H, D)
        s = torch.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(D)
        s = s + bias[None] + key_bias
        ctx = torch.einsum("bhlm,bmhd->blhd", torch.softmax(s, -1), v)
        ctx = ctx.reshape(B, L, HIDDEN)
        x = ln(x + lin(ctx, p + "attention.output.dense"),
               p + "attention.output.LayerNorm")
        if gated:
            h = x @ t[p + "mlp.gated_layers.weight"].T
            h = (torch.nn.functional.gelu(h[..., :INTER])
                 * h[..., INTER:])
        else:
            h = torch.nn.functional.gelu(lin(x, p + "mlp.up_layer"))
        x = ln(x + lin(h, p + "mlp.wo"), p + "mlp.layernorm")
    return x.numpy()


@pytest.fixture(scope="module")
def jina_params():
    sd = make_jina_state_dict()
    cfg = BertConfig.from_hf_dict(jina_config_dict())
    return P.from_hf_state_dict(sd, cfg), cfg, sd


def _rand_batch(B=3, L=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, VOCAB, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_params_shape(jina_params):
    our, cfg, _ = jina_params
    assert "position" not in our["embeddings"]
    np.testing.assert_allclose(np.asarray(our["alibi_slopes"]),
                               paper_slopes(HEADS), rtol=1e-6)
    assert our["layers"]["mlp"]["gate"]["w"].shape == (NL, HIDDEN, INTER)
    assert our["layers"]["mlp"]["up"]["w"].shape == (NL, HIDDEN, INTER)
    # gated_layers halves: rows 0..I of the HF [2I, E] weight are the
    # gate (llama.cpp's gated_layers_w), rows I.. the up projection
    _, _, sd = jina_params
    w0 = sd["encoder.layer.0.mlp.gated_layers.weight"]
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["gate"]["w"][0]), w0[:INTER].T)
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["up"]["w"][0]), w0[INTER:].T)


def test_presplit_names_equivalent(jina_params):
    """gated_layers_w / gated_layers_v (later jina revisions) load to
    the same params as the combined gated_layers matrix."""
    our, cfg, sd = jina_params
    sd2 = dict(sd)
    for i in range(NL):
        w = sd2.pop(f"encoder.layer.{i}.mlp.gated_layers.weight")
        sd2[f"encoder.layer.{i}.mlp.gated_layers_w.weight"] = w[:INTER]
        sd2[f"encoder.layer.{i}.mlp.gated_layers_v.weight"] = w[INTER:]
    our2 = P.from_hf_state_dict(sd2, cfg)
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["gate"]["w"]),
        np.asarray(our2["layers"]["mlp"]["gate"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(our["layers"]["mlp"]["up"]["w"]),
        np.asarray(our2["layers"]["mlp"]["up"]["w"]))


def test_hidden_states_match_oracle(jina_params):
    our, cfg, sd = jina_params
    ids, mask = _rand_batch()
    ref = torch_oracle(sd, ids, mask)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=1e-3)


def test_ffn_original_matches_oracle():
    sd = make_jina_state_dict(seed=5, feed_forward_type="original")
    cfg = BertConfig.from_hf_dict(
        jina_config_dict(feed_forward_type="original"))
    our = P.from_hf_state_dict(sd, cfg)
    ids, mask = _rand_batch(seed=5)
    ref = torch_oracle(sd, ids, mask, gated=False)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        return_hidden=True))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=1e-3)


def test_alibi_bias_builder(jina_params):
    our, _, _ = jina_params
    pos = jnp.asarray(np.array([[0, 1, 2, 5]], np.int32))
    b = np.asarray(bert.alibi_attention_bias(our["alibi_slopes"], pos))
    assert b.shape == (1, HEADS, 4, 4)
    s = paper_slopes(HEADS)
    np.testing.assert_allclose(b[0, 1, 0], [0, -s[1], -2 * s[1], -5 * s[1]],
                               rtol=1e-6)
    np.testing.assert_allclose(b[0, 2], b[0, 2].T, rtol=1e-6)  # symmetric


def test_packed_matches_single(jina_params):
    """Packed rows: per-segment position restart reproduces each
    sentence's |i-j| distances; cross-segment entries are masked."""
    our, cfg, _ = jina_params
    s1 = np.array([1, 5, 6, 7, 2], np.int32)
    s2 = np.array([1, 9, 8, 2], np.int32)
    L = 16
    ids = np.zeros((1, L), np.int32)
    ids[0, :5] = s1
    ids[0, 5:9] = s2
    seg = np.full((1, L), -1, np.int32)
    seg[0, :5] = 0
    seg[0, 5:9] = 1
    pos = np.zeros((1, L), np.int32)
    pos[0, :5] = np.arange(5)
    pos[0, 5:9] = np.arange(4)
    pool = np.zeros((1, 2, L), np.float32)
    pool[0, 0, :5] = 1.0 / 5
    pool[0, 1, 5:9] = 1.0 / 4
    packed = np.asarray(bert.encode_packed(
        our, cfg, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(pool)))[0]
    for row, toks in ((0, s1), (1, s2)):
        one = np.asarray(bert.encode_tokens(
            our, cfg, jnp.asarray(toks[None]),
            jnp.ones((1, len(toks)), np.int32), pooling="mean"))[0]
        assert float((packed[row] * one).sum()) > 0.9999


def test_fused_bias_kernel_matches_einsum():
    """The ALiBi bias rides the same fused-VMEM bias kernel as MPNet's
    relative bias (interpret mode off-TPU). Kernel-supported shape:
    H*D must be a whole number of 128-lane tiles."""
    from embeddings_tpu.ops import attention as attn_ops
    B, L, H, D = 2, 16, 8, 16
    E = H * D
    assert attn_ops.bias_supported(L, H, D)
    rng = np.random.default_rng(3)
    qkv = (rng.standard_normal((B * L, 3 * E)) * 0.3).astype(np.float32)
    lengths = np.array([16, 11], np.int32)
    slopes = jnp.asarray(alibi_slopes(H), jnp.float32)
    bias = bert.alibi_attention_bias(slopes, jnp.arange(L)[None])
    b4 = attn_ops.prepare_attention_bias(bias, L)
    got = np.asarray(attn_ops.fused_attention_bias(
        jnp.asarray(qkv), jnp.asarray(lengths), b4, B=B, L=L, H=H, D=D,
        interpret=True))
    # einsum reference
    q, k, v = [qkv[:, i * E:(i + 1) * E].reshape(B, L, H, D)
               for i in range(3)]
    s = np.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(D)
    s = s + np.asarray(bias)
    key_ok = np.arange(L)[None, :] < lengths[:, None]
    s = np.where(key_ok[:, None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bmhd->blhd", p, v).reshape(B * L, E)
    real = key_ok.reshape(-1)  # compare real query rows only
    np.testing.assert_allclose(got[real], ref[real], atol=2e-5, rtol=1e-4)


def _write_jina_dir(tmp_path, sd):
    d = tmp_path / "jina"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(jina_config_dict()))
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               d / "pytorch_model.bin")
    tokens = ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyz")
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += ["hello", "world", "##ing"]
    assert len(tokens) <= VOCAB
    (d / "vocab.txt").write_text("\n".join(tokens) + "\n")
    return d


def test_engine_end_to_end(jina_params, tmp_path):
    from embeddings_tpu.runtime.engine import load_model
    _, cfg, sd = jina_params
    d = _write_jina_dir(tmp_path, sd)
    eng = load_model(d)
    assert eng.config.position_embedding_type == "alibi"
    assert eng.config.gated_mlp
    texts = ["hello world", "walking", "hello world"]
    emb = eng.encode_batch(texts)
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999

    # engine path == oracle forward on the same token ids
    toks = eng.tokenize("hello world")
    ids = np.asarray([toks], np.int32)
    ref_h = torch_oracle(sd, ids, np.ones_like(ids))
    ref = ref_h.mean(1)[0]
    ref = ref / np.linalg.norm(ref)
    assert float((emb[0] * ref).sum()) > 0.9999

    emb_q = load_model(d, dtype="q4_0").encode_batch(texts)
    assert float((emb_q * emb).sum(-1).min()) > 0.98


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_forward_matches_single(jina_params, dp, tp):
    """TP head split: each shard biases its local heads from its [H/tp]
    slopes shard."""
    from embeddings_tpu.parallel import (make_mesh, make_sharded_forward,
                                         shard_params)
    our, cfg, _ = jina_params
    ids, mask = _rand_batch(B=8, seed=7)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    mesh = make_mesh(dp=dp, tp=tp)
    sp = shard_params(our, cfg, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    got = np.asarray(fwd(sp, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_cp_refused(jina_params):
    from embeddings_tpu.parallel.context import make_cp_forward
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from embeddings_tpu.parallel.context import make_mesh_cp
    _, cfg, _ = jina_params
    mesh = make_mesh_cp(dp=1, sp=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="ALiBi"):
        make_cp_forward(cfg, mesh)


def test_export_refused(jina_params):
    our, _, _ = jina_params
    with pytest.raises(ValueError, match="ALiBi"):
        P.to_hf_state_dict(our)


def test_long_rows_dispatch_stream_kernel():
    """Past the bias kernel's VMEM cap the forward must select the
    streaming kernel with STATIC slopes — no O(L^2) bias array."""
    from unittest import mock
    import importlib
    import embeddings_tpu.ops.attention as attn_ops
    linear_mod = importlib.import_module("embeddings_tpu.ops.linear")
    H, D = 8, 16
    cfg = BertConfig(vocab_size=VOCAB, hidden_size=H * D,
                     num_hidden_layers=1, num_attention_heads=H,
                     intermediate_size=64, max_position_embeddings=4096,
                     position_embedding_type="alibi", gated_mlp=True)
    params = P.init_params(cfg, rng=0)
    L = 4096
    assert not attn_ops.bias_supported(L, H, D)
    assert attn_ops.stream_supported(L, H, D, attn_ops.pick_bk(L))
    ids = jnp.zeros((1, L), jnp.int32)
    mask = jnp.ones((1, L), jnp.int32)
    calls = []

    def spy(qkv, lengths, **kw):
        calls.append(kw)
        return jnp.zeros((qkv.shape[0], qkv.shape[1] // 3), qkv.dtype)

    with mock.patch.object(linear_mod, "_use_pallas", lambda: True), \
         mock.patch.object(attn_ops, "fused_attention_stream", spy):
        bert.encode_tokens(params, cfg, ids, mask)
    assert calls, "streaming kernel was not dispatched"
    np.testing.assert_allclose(calls[0]["alibi_slopes"],
                               paper_slopes(H), rtol=1e-6)
