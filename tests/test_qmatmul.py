"""Pallas fused dequant-matmul kernel correctness (interpret mode on CPU;
the same kernel runs compiled on TPU — exercised by bench.py and TPU CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from embeddings_tpu.ops.qmatmul import qmatmul
from embeddings_tpu.ops.quant import dequantize, quantize


@pytest.mark.parametrize("kind", ["q4_0", "q4_1", "q8_0", "nf4"])
@pytest.mark.parametrize("shape", [(8, 128, 128), (16, 256, 384)])
def test_qmatmul_matches_dequant(kind, shape, rng):
    M, K, N = shape
    x = rng.standard_normal((M, K), dtype=np.float32)
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.05
    qt = quantize(w, kind)
    ref = np.asarray(jnp.dot(jnp.asarray(x).astype(jnp.bfloat16),
                             dequantize(qt).astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32))
    got = np.asarray(qmatmul(jnp.asarray(x), qt.codes, qt.scales, qt.mins,
                             kind=kind, bm=8, bn=128, interpret=True))
    assert got.shape == (M, N)
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_qmatmul_multi_ktile(rng):
    """K spans multiple grid steps -> accumulator logic exercised."""
    M, K, N = 8, 512, 128
    x = rng.standard_normal((M, K), dtype=np.float32)
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.05
    qt = quantize(w, "q4_0")
    ref = np.asarray(jnp.dot(jnp.asarray(x), dequantize(qt),
                             preferred_element_type=jnp.float32))
    got = np.asarray(qmatmul(jnp.asarray(x), qt.codes, qt.scales, qt.mins,
                             kind="q4_0", bm=8, bn=128,
                             compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_linear_quantized_pallas_path(rng, monkeypatch):
    """ops.linear uses the Pallas path when forced, including M padding."""
    import importlib
    linmod = importlib.import_module("embeddings_tpu.ops.linear")
    x = jnp.asarray(rng.standard_normal((3, 5, 64), dtype=np.float32))
    w = rng.standard_normal((64, 128), dtype=np.float32) * 0.1
    qt = quantize(w, "q4_0")
    ref = np.asarray(linmod.linear(x, qt))  # XLA fallback on CPU
    got = np.asarray(linmod.quantized_matmul(
        x.reshape(-1, 64), qt, interpret=True)).reshape(3, 5, 128)
    np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.05)


def test_qmatmul_fused_bias_gelu(rng):
    """Fused bias+GELU epilogue (incl. the in-kernel erf approximation)
    matches the unfused reference within approximation error."""
    import jax
    M, K, N = 8, 128, 128
    x = rng.standard_normal((M, K), dtype=np.float32)
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.05
    b = rng.standard_normal(N, dtype=np.float32) * 0.1
    qt = quantize(w, "q4_0")
    base = jnp.dot(jnp.asarray(x), dequantize(qt),
                   preferred_element_type=jnp.float32) + b
    for epi, ref in [("bias", base),
                     ("bias_gelu", jax.nn.gelu(base, approximate=False)),
                     ("bias_gelu_tanh", jax.nn.gelu(base, approximate=True))]:
        got = qmatmul(jnp.asarray(x), qt.codes, qt.scales, None,
                      jnp.asarray(b), kind="q4_0", epilogue=epi,
                      bm=8, bn=128, compute_dtype=jnp.float32,
                      out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3), epi


def test_residual_ln_epilogue_matches_composed(rng):
    """bias_residual_ln kernel == linear + residual + LayerNorm."""
    import jax.numpy as jnp
    from embeddings_tpu.models.bert import layer_norm
    from embeddings_tpu.ops.linear import linear, linear_residual_ln
    from embeddings_tpu.ops.quant import quantize

    M, K, N = 48, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
    w = quantize(jnp.asarray(rng.standard_normal((K, N)) * 0.05,
                             jnp.float32), "q4_0")
    b = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal((N,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal((N,)), jnp.float32)

    ref = layer_norm(res + linear(x, w, b), lns, lnb, 1e-12)
    got = linear_residual_ln(x, w, b, res, lns, lnb, 1e-12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=1e-2)


def test_ragged_n_whole_tile(rng):
    """TP-shard shapes where N has no 128-multiple divisor (e.g. 2304/4 =
    576) use a whole-N tile with 2-D per-block dequant."""
    import jax.numpy as jnp
    from embeddings_tpu.ops import qmatmul as Q
    from embeddings_tpu.ops.quant import dequantize, quantize
    M, K, N = 64, 128, 72
    assert Q.pallas_fits(K, N, 64)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
    qt = quantize(jnp.asarray(rng.standard_normal((K, N)) * 0.05,
                              jnp.float32), "q4_0")
    out = Q.qmatmul(x, qt.codes, qt.scales, qt.mins, None, kind="q4_0",
                    bm=64, compute_dtype=jnp.float32, interpret=True)
    ref = jnp.dot(x, dequantize(qt), preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("kind", ["q4_0", "q4_1", "nf4"])
def test_packed_kernel_matches_unpacked(rng, kind):
    import jax.numpy as jnp
    from embeddings_tpu.ops import qmatmul as Q
    from embeddings_tpu.ops.quant import pack_q4, quantize
    M, K, N = 32, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
    qt = quantize(jnp.asarray(rng.standard_normal((K, N)) * 0.05,
                              jnp.float32), kind)
    qp = pack_q4(qt)
    b = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)
    ref = Q.qmatmul(x, qt.codes, qt.scales, qt.mins, b, kind=kind,
                    bm=32, compute_dtype=jnp.float32, interpret=True)
    got = Q.qmatmul(x, qp.codes, qp.scales, qp.mins, b, kind=kind,
                    bm=32, compute_dtype=jnp.float32, packed=True,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_residual_ln_epilogue(rng):
    import jax.numpy as jnp
    from embeddings_tpu.models.bert import layer_norm
    from embeddings_tpu.ops.linear import linear, linear_residual_ln
    from embeddings_tpu.ops.quant import pack_q4, quantize
    M, K, N = 48, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
    qt = pack_q4(quantize(jnp.asarray(
        rng.standard_normal((K, N)) * 0.05, jnp.float32), "q4_0"))
    assert qt.packed
    b = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal((N,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal((N,)), jnp.float32)
    ref = layer_norm(res + linear(x, qt, b), lns, lnb, 1e-12)
    got = linear_residual_ln(x, qt, b, res, lns, lnb, 1e-12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=1e-2)
