"""Pallas TPU fused dequant + matmul kernel for blockwise-quantized weights.

This is the TPU-native replacement for ggml's quantized ``ggml_mul_mat``
SIMD kernels (``ggml_vec_dot_q4_0`` etc. — /root/reference pins ggml as a
submodule; the dispatch sites are bert.cpp:994-1069). Design:

- weights stay quantized in HBM (int4/int8 codes + f32 per-block scales);
  dequantization happens in VMEM, fused into the matmul — the f32 weight
  matrix never exists in HBM, so weight traffic is 4-8x smaller than f32.
- grid (M/bm, N/bn, K/bk) with K innermost; Mosaic double-buffers the HBM->
  VMEM streams across grid steps automatically. An f32 VMEM scratch
  accumulates partial products; the MXU runs bf16 x bf16 -> f32.
- per-32 block scales are applied to the *x tile* contraction blocks? No —
  scales vary per (k-block, n), so they're applied to the dequantized weight
  tile: codes [bk, bn] -> reshape [bk/32, 32, bn] * scales [bk/32, 1, bn].

Shapes must be multiples of the tile sizes; the caller (ops/linear.py) pads
M (tokens) and asserts K, N alignment (model dims are all multiples of 128;
the reference similarly requires ne[0] % 64 == 0, bert.cpp:730).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QK

# Default tile sizes. bk must be a multiple of QK(=32) and of the bf16 tile
# (16,128) sublane requirement; 128 divides every BERT-family dim we serve.
BM, BN, BK = 256, 256, 512


def _fit(size: int, pref: int, step: int) -> int:
    """Largest multiple of `step` that is <= pref and divides `size`."""
    b = min(pref, size)
    b -= b % step
    while b > step and size % b != 0:
        b -= step
    return max(b, step)


def _qmm_kernel(x_ref, c_ref, s_ref, m_ref, o_ref, acc_ref, *,
                kind: str, n_k: int, compute_dtype):
    """One (i, j, k) grid step: acc += x[bm,bk] @ deq(c[bk,bn])."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, bn = c_ref.shape
    codes = c_ref[:].astype(compute_dtype).reshape(bk // QK, QK, bn)
    scales = s_ref[:].astype(compute_dtype)[:, None, :]
    w = codes * scales
    if kind == "q4_1":
        w = w + m_ref[:].astype(compute_dtype)[:, None, :]
    w = w.reshape(bk, bn)
    acc_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), w,
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kind", "bm", "bn", "bk",
                                             "compute_dtype", "out_dtype",
                                             "interpret"))
def qmatmul(x: jax.Array, codes: jax.Array, scales: jax.Array,
            mins: jax.Array | None = None, *, kind: str = "q4_0",
            bm: int = BM, bn: int = BN, bk: int = BK,
            compute_dtype=jnp.bfloat16, out_dtype=jnp.float32,
            interpret: bool = False) -> jax.Array:
    """x [M, K] @ dequant(codes [K, N], scales [K//32, N]) -> [M, N].

    M, K, N must be multiples of (bm, bk, bn); use ops.linear for the
    padded/general entry point.
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)
    bm, bn = _fit(M, bm, 8), _fit(N, bn, 128)
    # The scales operand has bk//32 sublanes; Mosaic requires sublane counts
    # divisible by 8 (i.e. bk % 256 == 0) unless the block spans the full
    # array (bk == K). BERT-family K's are small enough that full-K stripes
    # fit VMEM comfortably, so that's the default.
    if K <= 4096 or bk >= K:
        bk = K
    else:
        bk = _fit(K, max(bk, 256), 256)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0 and bk % QK == 0, (
        (M, N, K), (bm, bn, bk))
    n_k = K // bk

    if mins is None:
        mins = jnp.zeros((K // QK, N), scales.dtype)  # unused for q4_0/q8_0

    kernel = functools.partial(_qmm_kernel, kind=kind, n_k=n_k,
                               compute_dtype=compute_dtype)
    flops = 2 * M * N * K
    bytes_accessed = (M * K * x.dtype.itemsize + K * N * codes.dtype.itemsize
                      + (K // QK) * N * 4 + M * N * 4)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QK, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, codes, scales, mins)
