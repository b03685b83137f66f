"""Forward-pass numerical parity vs HuggingFace torch BertModel.

The reference verified its forward ad hoc with debug printfs
(bert.cpp:926-955, 1104-1126); we assert per-layer and end-to-end activation
parity against torch on randomly initialized models (no network needed).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import bert, params as P


@pytest.fixture(scope="module")
def hf_model_and_params():
    from transformers import BertConfig as HFConfig, BertModel
    hf_cfg = HFConfig(vocab_size=256, hidden_size=64, num_hidden_layers=3,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, type_vocab_size=2,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = BertConfig.from_hf_dict(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    our = P.from_hf_state_dict(sd, cfg)
    return model, our, cfg


def _torch_hidden(model, ids, mask):
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    return out.last_hidden_state.numpy()


def _rand_batch(rng, cfg, B=3, L=12):
    ids = rng.integers(5, cfg.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    if B > 1:
        mask[1, 8:] = 0   # padded row
    if B > 2:
        mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_hidden_states_match_torch(hf_model_and_params, rng):
    model, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg)
    ref = _torch_hidden(model, ids, mask)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask), return_hidden=True))
    # only compare non-pad positions (HF computes garbage on pads too, but
    # identical masking means they should match everywhere mask=1)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=1e-3)


def test_mean_pooled_matches_torch(hf_model_and_params, rng):
    model, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg)
    ref_h = _torch_hidden(model, ids, mask)
    m = mask[..., None].astype(np.float32)
    ref = (ref_h * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask), pooling="mean",
                                        normalize=True))
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.99999, cos
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_cls_pooling(hf_model_and_params, rng):
    model, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg)
    ref_h = _torch_hidden(model, ids, mask)
    ref = ref_h[:, 0]
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask), pooling="cls"))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_padding_invariance(hf_model_and_params, rng):
    """Embedding of a sentence must not change when batch-padded further —
    the property the reference's pad-mask machinery exists for."""
    _, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg, B=1, L=10)
    e1 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids),
                                       jnp.asarray(mask)))
    pad_ids = np.concatenate([ids, np.zeros((1, 6), np.int32)], 1)
    pad_mask = np.concatenate([mask, np.zeros((1, 6), np.int32)], 1)
    e2 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(pad_ids),
                                       jnp.asarray(pad_mask)))
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_pad_token_id_inert(hf_model_and_params, rng):
    """Pad positions' ids are irrelevant (ref pads with id 101, bert.cpp:916)."""
    _, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg)
    e1 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    ids2 = ids.copy()
    ids2[mask == 0] = 101 % cfg.vocab_size
    e2 = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids2), jnp.asarray(mask)))
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_quantized_forward_close(hf_model_and_params, rng):
    """q8_0/q4_0 embeddings stay cosine-close to f32 (the Δ-vs-f16 story)."""
    _, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg, B=4, L=16)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    for kind, min_cos in [("q8_0", 0.9995), ("q4_1", 0.98), ("q4_0", 0.97)]:
        qp = P.quantize_params(our, kind)
        got = np.asarray(bert.encode_tokens(qp, cfg, jnp.asarray(ids),
                                            jnp.asarray(mask)))
        cos = (got * ref).sum(-1)
        assert cos.min() > min_cos, (kind, cos)


def test_bf16_forward_close(hf_model_and_params, rng):
    _, our, cfg = hf_model_and_params
    ids, mask = _rand_batch(rng, cfg)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    bp = P.cast_params(our, "bf16")
    got = np.asarray(bert.encode_tokens(bp, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999


def test_save_load_native_roundtrip(hf_model_and_params, rng, tmp_path):
    _, our, cfg = hf_model_and_params
    qp = P.quantize_params(our, "q4_0")
    path = tmp_path / "model.npz"
    P.save_native(path, qp, cfg)
    loaded, cfg2 = P.load_native(path)
    assert cfg2 == cfg
    ids, mask = _rand_batch(rng, cfg)
    a = np.asarray(bert.encode_tokens(qp, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(bert.encode_tokens(loaded, cfg2, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_gelu_variants(hf_model_and_params, rng):
    """erf vs tanh GELU differ slightly (ggml uses tanh; HF uses erf)."""
    _, our, cfg = hf_model_and_params
    import dataclasses
    cfg_tanh = dataclasses.replace(cfg, hidden_act="gelu_tanh")
    ids, mask = _rand_batch(rng, cfg)
    a = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(bert.encode_tokens(our, cfg_tanh, jnp.asarray(ids), jnp.asarray(mask)))
    cos = (a * b).sum(-1)
    assert cos.min() > 0.999
    # (with tiny random-init activations the two GELUs agree to ~1e-8;
    # check the op level difference directly at moderate magnitudes)
    x = jnp.linspace(-3, 3, 64).reshape(8, 8)
    a_op = np.asarray(bert.gelu(x, approximate=False))
    b_op = np.asarray(bert.gelu(x, approximate=True))
    assert np.abs(a_op - b_op).max() > 1e-4


def test_fuse_qkv_matches(hf_model_and_params, rng):
    """Merged q/k/v projection must be numerically identical."""
    _, our, cfg = hf_model_and_params
    from embeddings_tpu.models.params import fuse_qkv
    ids, mask = _rand_batch(rng, cfg)
    ref = np.asarray(bert.encode_tokens(our, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    fused = fuse_qkv(our)
    assert "qkv" in fused["layers"]["attn"]
    got = np.asarray(bert.encode_tokens(fused, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # quantized variant too
    qp = __import__("embeddings_tpu.models.params", fromlist=["x"]).quantize_params(our, "q4_0")
    a = np.asarray(bert.encode_tokens(qp, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(bert.encode_tokens(fuse_qkv(qp), cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_seq_bucket_covers_max_seq_len(small_vocab):
    """max_seq_len between buckets must still be plannable (a 300-token
    input with buckets ending at 256 used to crash at plan time)."""
    from embeddings_tpu.config import BertConfig, EngineConfig
    from embeddings_tpu.models import params as P
    from embeddings_tpu.runtime.engine import Engine
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    eng = Engine(P.init_params(cfg, rng=0), cfg, tok,
                 EngineConfig(seq_buckets=(16, 32), max_seq_len=48,
                              batch_size=4))
    assert eng._seq_buckets()[-1] == 48
    out = eng.encode_batch(["hello " * 60])  # truncates to 48 tokens
    assert out.shape == (1, 64)


def test_prefix_mask_false_routes_einsum(rng, tiny_config):
    """A non-prefix (interior-hole) mask must be routed away from the
    fused kernel: with prefix_mask=False the pallas-forced forward matches
    the exact additive-mask einsum path; the fused kernel (which reduces
    the mask to a prefix length) would disagree."""
    import dataclasses
    import functools
    import importlib
    import jax.numpy as jnp
    from embeddings_tpu.models import bert, params as P
    import embeddings_tpu.ops.attention as attn_ops
    linmod = importlib.import_module("embeddings_tpu.ops.linear")

    # fused attention requires H*D % 128 == 0 (ops/attention.supported)
    cfg = dataclasses.replace(tiny_config, num_attention_heads=2,
                              hidden_size=128)
    params = P.fuse_qkv(P.init_params(cfg, rng=0))
    ids = rng.integers(5, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[0, 3:7] = 0   # interior hole: not a prefix mask
    mask[1, 9:] = 0    # plain suffix padding
    ref = np.asarray(bert.encode_tokens(  # einsum path (CPU default)
        params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    orig = attn_ops.fused_attention
    attn_ops.fused_attention = functools.partial(orig, interpret=True)
    try:
        with linmod.pallas_mode("always"):
            wrong = np.asarray(bert.encode_tokens(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                prefix_mask=True))   # kernel sees a bogus prefix length
            safe = np.asarray(bert.encode_tokens(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                prefix_mask=False))  # routed to the einsum path
    finally:
        attn_ops.fused_attention = orig
    # prefix_mask=False must agree with the exact path even under pallas
    np.testing.assert_allclose(safe, ref, atol=2e-3)
    # and the hole row really is mishandled by the prefix-length kernel
    assert not np.allclose(wrong[0], ref[0], atol=1e-3)
