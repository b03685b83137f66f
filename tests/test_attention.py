"""Fused attention kernel: interpret-mode parity vs the einsum path."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddings_tpu.ops.attention import fused_attention, supported


def einsum_ref(qkv, lengths, B, L, H, D, mask_value=-1e9):
    E = H * D
    q = qkv[:, :E].reshape(B, L, H, D)
    k = qkv[:, E:2 * E].reshape(B, L, H, D)
    v = qkv[:, 2 * E:].reshape(B, L, H, D)
    mask = (np.arange(L)[None, :] < np.asarray(lengths)[:, None])
    bias = np.where(mask, 0.0, mask_value)[:, None, None, :]
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32)
    s = s / math.sqrt(D) + bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhlm,bmhd->blhd", p, v,
                     preferred_element_type=jnp.float32)
    return np.asarray(ctx.reshape(B * L, E), np.float32)


@pytest.mark.parametrize("B,L,H,D", [(2, 16, 4, 32), (1, 32, 2, 64),
                                     (3, 8, 1, 128)])
def test_fused_attention_matches_einsum(B, L, H, D, rng):
    assert supported(L, H, D)
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)), jnp.float32)
    lengths = jnp.asarray([max(1, L - 3 * i) for i in range(B)], jnp.int32)
    got = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                     interpret=True), np.float32)
    ref = einsum_ref(np.asarray(qkv), lengths, B, L, H, D)
    # compare only valid query rows (both compute garbage on pad queries,
    # but different garbage is fine — pooling drops those rows)
    for b in range(B):
        n = int(lengths[b])
        g = got[b * L: b * L + n]
        r = ref[b * L: b * L + n]
        np.testing.assert_allclose(g, r, atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("B,L,H,D", [(2, 16, 4, 32), (1, 32, 2, 64)])
def test_fused_attention_int8_scores_matches_einsum(B, L, H, D, rng):
    """int8 QK^T/PV mode: q/k per-row, v per-column symmetric int8 with
    p emitted int8 in [0, 127] — coarser than bf16 (int8 resolution on
    p), so tolerances are wider; the math (2^m and 127 factors cancel
    in the normalization) is exercised exactly."""
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)), jnp.float32)
    lengths = jnp.asarray([max(1, L - 3 * i) for i in range(B)],
                          jnp.int32)
    got = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                     int8_scores=True, interpret=True),
                     np.float32)
    ref = einsum_ref(np.asarray(qkv), lengths, B, L, H, D)
    assert np.isfinite(got).all()
    for b in range(B):
        n = int(lengths[b])
        g = got[b * L: b * L + n]
        r = ref[b * L: b * L + n]
        gn = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True),
                            1e-9)
        rn = r / np.maximum(np.linalg.norm(r, axis=-1, keepdims=True),
                            1e-9)
        assert (gn * rn).sum(-1).min() > 0.999
        np.testing.assert_allclose(g, r, atol=0.05, rtol=0.05)


def test_fused_attention_int8_scores_all_pad_row_finite(rng):
    """n == 0 filler rows degenerate to uniform p8 = 127 over every
    key — the output is garbage-but-finite (pooling drops it)."""
    B, L, H, D = 2, 16, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)), jnp.float32)
    lengths = jnp.asarray([L, 0], jnp.int32)
    got = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                     int8_scores=True, interpret=True),
                     np.float32)
    assert np.isfinite(got).all()


def test_supported_predicate():
    assert supported(256, 12, 64)   # bge-base
    assert supported(512, 16, 64)   # bge-large
    assert supported(128, 12, 32)   # MiniLM
    assert supported(256, 12, 96)   # D <= 128 with E % 128 == 0
    # E = H*D must be a whole number of 128-lane tiles: the q/k/v
    # BlockSpecs slice E-wide lanes out of [M, 3E] (Mosaic rejects E=320
    # on real TPU hardware; tiny test models fall back to XLA attention)
    assert not supported(256, 5, 64)
    assert not supported(250, 12, 64)   # L % 8
    assert not supported(256, 12, 160)  # ones column must fit 2D <= 256...
    # (D > LANE exceeds the v-tile augmentation layout)


def test_full_forward_uses_fused_attention(rng, tiny_config):
    """encode_tokens with fused qkv + pallas forced matches einsum path."""
    import dataclasses
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.ops import linear as linmod_names  # noqa: F401
    import importlib
    linmod = importlib.import_module("embeddings_tpu.ops.linear")

    cfg = dataclasses.replace(tiny_config, num_attention_heads=2,
                              hidden_size=64)  # D = 32 -> supported
    params = P.fuse_qkv(P.init_params(cfg, rng=0))
    ids = rng.integers(5, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 9:] = 0
    ref = np.asarray(bert.encode_tokens(params, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask)))
    # force the pallas path (interpret mode runs it on CPU)
    linmod.set_pallas_mode("always")
    try:
        import embeddings_tpu.ops.attention as attn_ops
        import functools
        orig = attn_ops.fused_attention
        attn_ops.fused_attention = functools.partial(orig, interpret=True)
        try:
            got = np.asarray(bert.encode_tokens(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
        finally:
            attn_ops.fused_attention = orig
    finally:
        linmod.set_pallas_mode("auto")
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999, cos


@pytest.mark.parametrize("B,Lc,L,H,D", [
    (2, 16, 64, 2, 64),     # sp=4-style chunking
    (1, 64, 64, 2, 64),     # sp=1: rectangular == square
    (3, 8, 32, 4, 32),      # H*D=128 minimum lane tile
])
def test_fused_attention_cp_matches_einsum(B, Lc, L, H, D, rng):
    """CP kernel (local queries, gathered K/V, prefix lengths) vs the
    rectangular einsum reference."""
    from embeddings_tpu.ops.attention import fused_attention_cp
    E = H * D
    q = jnp.asarray(rng.standard_normal((B * Lc, E)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B * L, 2 * E)), jnp.float32)
    lengths = jnp.asarray([max(1, L - 5 * b) for b in range(B)], jnp.int32)
    got = np.asarray(fused_attention_cp(q, kv, lengths, B=B, Lc=Lc, L=L,
                                        H=H, D=D, interpret=True))
    # einsum reference
    qh = np.asarray(q).reshape(B, Lc, H, D)
    k = np.asarray(kv).reshape(B, L, 2 * E)[..., :E].reshape(B, L, H, D)
    v = np.asarray(kv).reshape(B, L, 2 * E)[..., E:].reshape(B, L, H, D)
    s = np.einsum("blhd,bmhd->bhlm", qh, k) / np.sqrt(D)
    for b in range(B):
        s[b, :, :, int(lengths[b]):] = -1e9
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bmhd->blhd", p, v).reshape(B * Lc, E)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2)


def test_fused_attention_blocked_grid_long_rows(rng):
    """L > 512 runs the blocked-query grid (Lq=128, nQ>1): same numerics
    as the whole-row tile path, validated against the einsum reference."""
    B, L, H, D = 2, 1024, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    lengths = jnp.asarray([L, L - 200], jnp.int32)
    got = np.asarray(fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                     interpret=True))
    ref = einsum_ref(np.asarray(qkv), lengths, B, L, H, D)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(got[b * L: b * L + n],
                                   ref[b * L: b * L + n],
                                   atol=2e-3, rtol=1e-2)


def test_fused_segmented_blocked_grid_long_rows(rng):
    """Segmented kernel at L=1024 (blocked grid) vs the einsum reference
    with a segment mask."""
    from embeddings_tpu.ops.attention import fused_attention_segmented
    B, L, H, D = 2, 1024, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    seg = np.full((B, L), -1, np.int32)
    for b in range(B):
        off, si = 0, 0
        while off < L - 10:
            n = min(int(rng.integers(40, 300)), L - off)
            seg[b, off:off + n] = si
            off += n
            si += 1
    got = np.asarray(fused_attention_segmented(
        qkv, jnp.asarray(seg), B=B, L=L, H=H, D=D, interpret=True))
    q = np.asarray(qkv[:, :E], np.float32).reshape(B, L, H, D)
    k = np.asarray(qkv[:, E:2 * E], np.float32).reshape(B, L, H, D)
    v = np.asarray(qkv[:, 2 * E:], np.float32).reshape(B, L, H, D)
    s = np.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(D)
    same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] >= 0)
    s = np.where(same[:, None], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bmhd->blhd", p, v).reshape(B * L, E)
    valid = (seg >= 0).reshape(B * L)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-3,
                               rtol=1e-2)


def biased_einsum_ref(qkv, lengths, bias_hll, B, L, H, D,
                      mask_value=-1e9):
    """einsum path with an additive [H, L, L] logit bias (MPNet)."""
    E = H * D
    q = qkv[:, :E].reshape(B, L, H, D)
    k = qkv[:, E:2 * E].reshape(B, L, H, D)
    v = qkv[:, 2 * E:].reshape(B, L, H, D)
    mask = (np.arange(L)[None, :] < np.asarray(lengths)[:, None])
    mb = np.where(mask, 0.0, mask_value)[:, None, None, :]
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32)
    s = s / math.sqrt(D) + mb + bias_hll[None]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhlm,bmhd->blhd", p, v,
                     preferred_element_type=jnp.float32)
    return np.asarray(ctx.reshape(B * L, E), np.float32)


@pytest.mark.parametrize("B,L,H,D", [(2, 16, 4, 32), (1, 32, 2, 64),
                                     (2, 384, 2, 64)])
def test_fused_attention_bias_matches_einsum(B, L, H, D, rng):
    """Bias variant (MPNet relative position bias): incl. one L>256 case
    exercising the blocked-query bias grid (Lq=128)."""
    from embeddings_tpu.ops.attention import (bias_supported,
                                              fused_attention_bias,
                                              prepare_attention_bias)
    assert bias_supported(L, H, D)
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)), jnp.float32)
    lengths = jnp.asarray([max(1, L - 5 * i) for i in range(B)], jnp.int32)
    bias_hll = rng.standard_normal((H, L, L)).astype(np.float32) * 2.0
    bias4 = prepare_attention_bias(jnp.asarray(bias_hll)[None], L)
    got = np.asarray(fused_attention_bias(qkv, lengths, bias4,
                                          B=B, L=L, H=H, D=D,
                                          interpret=True), np.float32)
    ref = biased_einsum_ref(np.asarray(qkv), lengths, bias_hll, B, L, H, D)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(got[b * L: b * L + n],
                                   ref[b * L: b * L + n],
                                   atol=2e-3, rtol=1e-2)


def test_mpnet_forward_uses_fused_bias_kernel(rng):
    """encode_tokens routes MPNet attention through the bias kernel when
    pallas is forced on, matching the einsum path bit-closely."""
    import functools
    import importlib
    from unittest import mock

    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.ops import attention as attn_ops
    linear_mod = importlib.import_module("embeddings_tpu.ops.linear")

    cfg = BertConfig(vocab_size=128, hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=256,
                     max_position_embeddings=64, type_vocab_size=1,
                     relative_attention_num_buckets=16)
    params = P.init_params(cfg, rng=0)
    assert "rel_bias" in params
    ids = jnp.asarray(rng.integers(5, 128, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = np.asarray(bert.encode_tokens(params, cfg, ids, mask))

    calls = []
    orig = attn_ops.fused_attention_bias

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw, interpret=True)

    with mock.patch.object(linear_mod, "_use_pallas", lambda: True), \
         mock.patch.object(attn_ops, "fused_attention_bias",
                           functools.partial(spy)):
        got = np.asarray(bert.encode_tokens(params, cfg, ids, mask))
    assert calls, "bias kernel was not dispatched"
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# streaming / banded kernels (long-context path)
# ---------------------------------------------------------------------------

def _stream_ref(qkv, lengths, B, L, H, D, *, window=0, slopes=None,
                causal=False):
    """numpy reference for the streaming kernel's mask/bias modes."""
    E = H * D
    q = np.asarray(qkv[:, :E], np.float32).reshape(B, L, H, D)
    k = np.asarray(qkv[:, E:2 * E], np.float32).reshape(B, L, H, D)
    v = np.asarray(qkv[:, 2 * E:], np.float32).reshape(B, L, H, D)
    pos = np.arange(L)
    ok = (pos[None, None, :] < np.asarray(lengths)[:, None, None]
          ) & np.ones((1, L, 1), bool)                      # [B, Lq, Lk]
    if window:
        ok = ok & (np.abs(pos[:, None] - pos[None, :]) <= window // 2)
    if causal:
        ok = ok & (pos[None, :] <= pos[:, None])
    s = np.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(D)
    if slopes is not None:
        s = s - (np.asarray(slopes)[None, :, None, None]
                 * np.abs(pos[:, None] - pos[None, :])[None, None])
    s = np.where(ok[:, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / np.maximum(p.sum(-1, keepdims=True), 1e-30)
    return np.einsum("bhlm,bmhd->blhd", p, v).reshape(B * L, E)


def _check_valid_rows(got, ref, lengths, L, atol=2e-3):
    for b, n in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(got[b * L: b * L + int(n)],
                                   ref[b * L: b * L + int(n)],
                                   atol=atol, rtol=1e-2)


@pytest.mark.parametrize("BK", [128, 256])
def test_fused_attention_stream_matches_ref(BK, rng):
    from embeddings_tpu.ops.attention import (fused_attention_stream,
                                              stream_supported)
    B, L, H, D = 2, 256, 2, 64
    assert stream_supported(L, H, D, BK)
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    lengths = jnp.asarray([256, 139], jnp.int32)
    got = np.asarray(fused_attention_stream(
        qkv, lengths, B=B, L=L, H=H, D=D, BK=BK, interpret=True),
        np.float32)
    ref = _stream_ref(qkv, lengths, B, L, H, D)
    _check_valid_rows(got, ref, lengths, L)


def test_fused_attention_stream_alibi(rng):
    from embeddings_tpu.ops.alibi import alibi_slopes
    from embeddings_tpu.ops.attention import fused_attention_stream
    B, L, H, D = 2, 256, 4, 32
    E = H * D
    slopes = tuple(alibi_slopes(H))
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    lengths = jnp.asarray([256, 100], jnp.int32)
    got = np.asarray(fused_attention_stream(
        qkv, lengths, B=B, L=L, H=H, D=D, BK=128,
        alibi_slopes=slopes, interpret=True), np.float32)
    ref = _stream_ref(qkv, lengths, B, L, H, D, slopes=slopes)
    _check_valid_rows(got, ref, lengths, L)


def test_fused_attention_stream_causal(rng):
    from embeddings_tpu.ops.attention import fused_attention_stream
    B, L, H, D = 1, 256, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    lengths = jnp.asarray([201], jnp.int32)
    got = np.asarray(fused_attention_stream(
        qkv, lengths, B=B, L=L, H=H, D=D, BK=128, causal=True,
        interpret=True), np.float32)
    ref = _stream_ref(qkv, lengths, B, L, H, D, causal=True)
    _check_valid_rows(got, ref, lengths, L)


@pytest.mark.parametrize("L,window", [(256, 8), (512, 128), (512, 300),
                                      (384, 1000)])
def test_fused_attention_window_matches_ref(L, window, rng):
    from embeddings_tpu.ops.attention import fused_attention_window
    B, H, D = 2, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.5,
                      jnp.float32)
    lengths = jnp.asarray([L, L - 57], jnp.int32)
    got = np.asarray(fused_attention_window(
        qkv, lengths, B=B, L=L, H=H, D=D, window=window, interpret=True),
        np.float32)
    ref = _stream_ref(qkv, lengths, B, L, H, D, window=window)
    _check_valid_rows(got, ref, lengths, L)


@pytest.mark.parametrize("Lc,L,BK", [(128, 256, 128), (128, 512, 256),
                                     (256, 256, 128)])
def test_fused_attention_cp_stream_matches_cp(Lc, L, BK, rng):
    """Streaming CP kernel == whole-row CP kernel (interpret mode)."""
    from embeddings_tpu.ops.attention import (fused_attention_cp,
                                              fused_attention_cp_stream)
    B, H, D = 2, 2, 64
    E = H * D
    q = jnp.asarray(rng.standard_normal((B * Lc, E)) * 0.5, jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B * L, 2 * E)) * 0.5,
                     jnp.float32)
    lengths = jnp.asarray([L, L - 77], jnp.int32)
    ref = np.asarray(fused_attention_cp(q, kv, lengths, B=B, Lc=Lc, L=L,
                                        H=H, D=D, interpret=True),
                     np.float32)
    got = np.asarray(fused_attention_cp_stream(
        q, kv, lengths, B=B, Lc=Lc, L=L, H=H, D=D, BK=BK,
        interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2)


def test_cp_forward_streams_past_whole_row(rng, tiny_config):
    """make_cp_forward must route to the streaming CP kernel when
    whole-row K/V would overflow VMEM (patched threshold; the math must
    stay identical)."""
    import dataclasses
    from unittest import mock
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import importlib
    import embeddings_tpu.ops.attention as attn_ops
    from embeddings_tpu.models import params as P2
    from embeddings_tpu.parallel.context import (make_cp_forward,
                                                 make_mesh_cp)
    linear_mod = importlib.import_module("embeddings_tpu.ops.linear")
    cfg = dataclasses.replace(tiny_config, num_attention_heads=2,
                              hidden_size=128,
                              max_position_embeddings=512)
    params = P2.init_params(cfg, rng=0)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (2, 256)), jnp.int32)
    mask = np.ones((2, 256), np.int32)
    mask[1, 130:] = 0
    mask = jnp.asarray(mask)
    from embeddings_tpu.models import bert as B2
    ref = np.asarray(B2.encode_tokens(params, cfg, ids, mask))
    mesh = make_mesh_cp(dp=1, sp=2, devices=jax.devices()[:2])
    calls = []
    orig = attn_ops.fused_attention_cp_stream

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw, interpret=True)

    with mock.patch.object(linear_mod, "_use_pallas", lambda: True), \
         mock.patch.object(attn_ops, "whole_row_fits",
                           lambda L, E, itemsize=2: False), \
         mock.patch.object(attn_ops, "fused_attention_cp_stream", spy):
        fwd = make_cp_forward(cfg, mesh)
        got = np.asarray(fwd(params, ids, mask))
    assert calls, "CP streaming kernel was not dispatched"
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.999, cos


def test_fused_attention_emit_quantized(rng):
    """The whole-row and segmented kernels can emit the context per-row
    int8-quantized (+f32 row scales) for the chained int8 o-projection;
    'only' skips the bf16 output entirely (staged in an f32 scratch) and
    must reconstruct it within one emitted-int8 step."""
    from embeddings_tpu.ops import attention as A
    B, L, H, D = 4, 64, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.3,
                      jnp.bfloat16)
    lengths = jnp.asarray([64, 33, 8, 64], jnp.int32)
    o = np.asarray(A.fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                     interpret=True), np.float32)
    o8, osc = A.fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                emit_quantized="only", interpret=True)
    o8, osc = np.asarray(o8), np.asarray(osc)
    rec = o8.astype(np.float32) * osc
    assert np.abs(rec - o).max() < 1.1 * osc.max() + 0.01
    # scales are row absmax / 127 of the staged f32 rows — close to the
    # bf16 output's row absmax
    np.testing.assert_allclose(osc[:, 0], np.abs(o).max(-1) / 127.0,
                               atol=2e-4, rtol=0.05)
    ob, o8b, oscb = A.fused_attention(qkv, lengths, B=B, L=L, H=H, D=D,
                                      emit_quantized="both",
                                      interpret=True)
    assert np.array_equal(np.asarray(ob, np.float32), o)
    # "both" quantizes from the bf16-rounded output tile, "only" from
    # the f32 staging scratch — codes may differ by one step
    assert np.abs(np.asarray(o8b).astype(np.int32)
                  - o8.astype(np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(oscb), osc, rtol=0.02,
                               atol=1e-6)


def test_fused_segmented_emit_quantized(rng):
    from embeddings_tpu.ops import attention as A
    B, L, H, D = 4, 64, 2, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.3,
                      jnp.bfloat16)
    seg = np.full((B, L), -1, np.int32)
    for bi in range(B):
        off = 0
        si = 0
        while off < L - 4:
            n = min(int(rng.integers(4, 20)), L - off)
            seg[bi, off:off + n] = si
            off += n
            si += 1
    segj = jnp.asarray(seg)
    o = np.asarray(A.fused_attention_segmented(
        qkv, segj, B=B, L=L, H=H, D=D, interpret=True), np.float32)
    s8, ss = A.fused_attention_segmented(
        qkv, segj, B=B, L=L, H=H, D=D, emit_quantized="only",
        interpret=True)
    rec = np.asarray(s8, np.float32) * np.asarray(ss)
    assert np.abs(rec - o).max() < 1.1 * float(np.asarray(ss).max()) + 0.01
