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
