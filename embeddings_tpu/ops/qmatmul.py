"""Pallas TPU fused dequant + matmul kernel for blockwise-quantized weights.

This is the TPU-native replacement for ggml's quantized ``ggml_mul_mat``
SIMD kernels (``ggml_vec_dot_q4_0`` etc. — /root/reference pins ggml as a
submodule; the dispatch sites are bert.cpp:994-1069). Design:

- weights stay quantized in HBM (int8-coded int4 values + f32 per-block
  scales); the f32/bf16 weight matrix never exists in HBM, so weight
  traffic is 4-8x smaller than dense.
- grid (N/bn, M/bm) with M innermost. Each weight tile [K, bn] is
  dequantized into a VMEM scratch ONCE (at i==0) and reused for every M
  tile — dequantization cost is amortized M/bm times, so large-batch
  throughput approaches the dense-matmul roofline while small-batch stays
  HBM-bound at the 4-bit footprint.
- full-K stripes (K fits VMEM for every BERT-family dim up to 4096), so
  there is no K-accumulator: one MXU dot per grid step.
- per-32 block scales broadcast over the codes tile:
  codes [K, bn] -> [K/32, 32, bn] * scales [K/32, 1, bn].

Shapes must be multiples of the tile sizes; the caller (ops/linear.py)
pads M (tokens) and asserts K, N alignment (model dims are all multiples
of 128; the reference similarly requires ne[0] % 64 == 0, bert.cpp:730).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QK

# Total VMEM budget (per-core VMEM is 16 MB; leave headroom for Mosaic).
_VMEM_BUDGET = 13 * 1024 * 1024
# K-rows dequantized per chunk inside the kernel (bounds the stack temp).
_DEQ_CHUNK = 512
# nf4's 16-way select chain keeps ~2 live f32 [chunk, bn] vectors on the
# Mosaic stack while decoding; at bn=3072 a 512-row chunk is ~6.3 MB per
# temp and blows the 16 MB scoped-VMEM limit (observed on-chip at
# K=768/N=3072 res_ln: 18.67M/16M). 64 rows caps the temps at ~1.6 MB
# inside _pick_bn's 3 MB headroom; the decode runs once per N-tile, so
# the extra loop trips amortize over M/bm grid steps.
_DEQ_CHUNK_NF4 = 64


def _deq_chunk(K: int, kind: str) -> int:
    step = min(K, _DEQ_CHUNK_NF4 if kind == "nf4" else _DEQ_CHUNK)
    while K % step:  # largest QK-multiple divisor
        step -= QK
    return step


def _pick_bn(K: int, N: int, bm: int, requested: int | None,
             with_residual: bool = False, packed: bool = False,
             int8: bool = False, x_bytes: int = 2) -> int:
    """Largest bn (multiple of 128, divisor of N) fitting the VMEM budget.

    Accounts for: x tile (bm*K, double-buffered; x_bytes=2 for bf16,
    1 for pre-quantized int8 rows), codes tile (K*bn int8,
    double-buffered), dequant scratch (K*bn bf16), scales+mins
    tiles (2 * K/32 * bn f32, double-buffered), out tile (bm*bn f32,
    double-buffered), the residual tile when the LN epilogue is on, and
    the int8-mode extras (requantized weight tile K*bn int8 + per-column
    scale row).

    When N has no 128-multiple divisor (tensor-parallel shards like
    N=2304/4=576, or tiny test models), falls back to bn == N — Mosaic
    allows a block equal to the full array dimension. Returns 0 if even
    that does not fit VMEM (caller must use the XLA fallback)."""
    fixed = bm * K * x_bytes * 2
    codes_bytes = (K // 2) if packed else K
    per_bn = codes_bytes * 2 + 2 * (K // QK) * 4 * 2 + bm * 4 * 2
    # int8 mode has no bf16 staging scratch (dequant goes straight to the
    # int8 tile in two passes) — that freed K*2*bn is what lets the
    # FFN-down residual-LN case run at bm=256 instead of 128
    per_bn += (K + 8) if int8 else K * 2
    if with_residual:
        per_bn += bm * 2 * 2
    cap = max((_VMEM_BUDGET - fixed) // per_bn, 0)
    bn = min(N, requested or cap, cap)
    bn -= bn % 128
    while bn > 128 and N % bn != 0:
        bn -= 128
    if bn >= 128 and N % bn == 0:
        return bn
    return N if N <= cap else 0


def pallas_fits(K: int, N: int, bm: int = 256, packed: bool = False,
                int8: bool = False, x_bytes: int = 2) -> bool:
    """Can the Pallas kernel tile this weight shape at all?"""
    if packed and K % 64 != 0:
        return False
    return K % QK == 0 and _pick_bn(K, N, bm, None, packed=packed,
                                    int8=int8, x_bytes=x_bytes) > 0


def int8_engages(K: int, N: int, bm: int = 256, packed: bool = False,
                 with_residual: bool = False, x_bytes: int = 2) -> bool:
    """Will int8_compute actually run (vs the ragged-lane bf16
    fallback)? Callers chaining pre-quantized activations MUST gate on
    this — the kernel asserts rather than silently dequantizing int8 x."""
    if (packed and K % 64 != 0) or K % QK != 0 or K % 32 != 0:
        return False
    bn = _pick_bn(K, N, bm, None, with_residual, packed, int8=True,
                  x_bytes=x_bytes)
    if with_residual:
        if bn < N:
            return False
        bn = N
    return bn > 0 and bn % 128 == 0


def emit_fits(K: int, N: int, bm: int = 256, packed: bool = False,
              int8: bool = True, x_bytes: int = 2) -> bool:
    """Can the kernel emit per-row-quantized output (needs bn == N)?"""
    return N % 128 == 0 and _pick_bn(K, N, bm, None, False, packed,
                                     int8=int8, x_bytes=x_bytes) >= N


def _fit(size: int, pref: int, step: int) -> int:
    b = min(pref, size)
    b -= b % step
    while b > step and size % b != 0:
        b -= step
    return max(b, step)


def _nf4_decode(u, compute_dtype):
    """int codes in [0, 15] -> NF4 level values. A 16-way select chain
    on the VPU — runs only in the dequant (once per N-tile, amortized
    over M/bm grid steps), so the non-uniform codebook costs ~nothing
    at matmul time. (Mosaic has no VMEM gather for a 16-entry LUT.)

    Everything stays f32 until one final cast: an int32 compare feeding
    a bf16 select makes Mosaic relayout the i1 mask between (8,128) and
    (16,128) tilings ("Invalid relayout ... replicated in destination
    but not in source"), and bf16 compares themselves are unsupported on
    v5e ("Target does not support this comparison") — both real-TPU-only
    failures that interpret mode cannot catch. f32 compare + f32 select
    keeps every vector at 32-bit tiling."""
    from .quant import NF4_TABLE
    uf = u.astype(jnp.float32)
    v = jnp.full(u.shape, jnp.float32(NF4_TABLE[0]), jnp.float32)
    for k in range(1, 16):
        v = jnp.where(uf == jnp.float32(k), jnp.float32(NF4_TABLE[k]), v)
    return v.astype(compute_dtype)


def _qmm_kernel(x_ref, c_ref, s_ref, m_ref, b_ref, o_ref, w_ref, *,
                kind: str, compute_dtype, epilogue: str, packed: bool,
                res_ref=None, lns_ref=None, lnb_ref=None, ln_eps=0.0,
                w8_ref=None, cs_ref=None, sx_ref=None,
                o8_ref=None, os_ref=None):
    """Grid (N/bn, M/bm), M innermost. w_ref: [K, bn] dequant scratch.
    packed: c_ref is uint8 [K/2, bn] in the group-64 nibble layout.

    int8 MXU mode (w8_ref/cs_ref set): the dequantized weight tile is
    requantized ONCE per N-tile to per-column-symmetric int8 (scale =
    colmax/127, stored in cs_ref), and each x tile is quantized to
    per-ROW int8 on the fly (the full K row is in VMEM, so the row
    absmax is local) — the MXU then runs s8xs8->s32 at 2x the bf16
    rate (v5e: 394 vs 197 TOPS), with the two scale vectors applied to
    the f32 accumulator as a rank-1 outer product. Weight HBM traffic
    stays at the 4-bit footprint; quantization work amortizes exactly
    like the dequant (weights once per N-tile, x rows once per M-tile).

    q4_1 mins are added into the dequant scratch (one VPU add per
    N-tile, amortized over M/bm grid steps — measured FREE at
    compute-bound M: 264 vs 280 us for q4_0 at M=32K, K=N=768).
    A rank-reduced alternative (min term as x_blocksums [bm, K/32] @
    mins [K/32, bn]) was tried and is 1.5x SLOWER: the 24-deep
    unaligned MXU dot pads to full systolic depth and runs every
    M-step — don't redo it."""
    i = pl.program_id(1)

    if w8_ref is not None:
        _qmm_int8(x_ref, c_ref, s_ref, m_ref, b_ref, o_ref, w8_ref,
                  cs_ref, i, kind=kind, epilogue=epilogue, packed=packed,
                  res_ref=res_ref, lns_ref=lns_ref, lnb_ref=lnb_ref,
                  ln_eps=ln_eps, sx_ref=sx_ref, o8_ref=o8_ref,
                  os_ref=os_ref)
        return

    @pl.when(i == 0)
    def _():
        if packed:
            Kh, bn = c_ref.shape
            K = Kh * 2
            # group g of 64 weight rows <- packed rows [32g, 32g+32):
            # low nibbles are rows [64g, 64g+32) (scale block 2g), high
            # nibbles rows [64g+32, 64g+64) (scale block 2g+1). int32
            # arithmetic: Mosaic does not legalize int8 sub/shift.
            for g in range(K // 64):
                p = c_ref[g * 32:(g + 1) * 32, :].astype(jnp.int32)
                if kind == "nf4":
                    lo = _nf4_decode(p & 15, compute_dtype)
                    hi = _nf4_decode(p >> 4, compute_dtype)
                else:
                    lo = ((p & 15) - 8).astype(compute_dtype)
                    hi = ((p >> 4) - 8).astype(compute_dtype)
                slo = s_ref[2 * g:2 * g + 1, :].astype(compute_dtype)
                shi = s_ref[2 * g + 1:2 * g + 2, :].astype(compute_dtype)
                wlo = lo * slo
                whi = hi * shi
                if kind == "q4_1":
                    wlo = wlo + m_ref[2 * g:2 * g + 1, :].astype(compute_dtype)
                    whi = whi + m_ref[2 * g + 1:2 * g + 2, :].astype(compute_dtype)
                w_ref[g * 64:g * 64 + 32, :] = wlo
                w_ref[g * 64 + 32:g * 64 + 64, :] = whi
            return
        K, bn = c_ref.shape
        if bn % 128 == 0:
            # dequantize in K-chunks: a single full-[K, bn] expression
            # would materialize a second weight-sized temp on the Mosaic
            # stack on top of the scratch (observed VMEM OOM at K=3072,
            # bn=768); chunking caps the temp at _DEQ_CHUNK*bn values
            # (nf4 chunks smaller still — see _DEQ_CHUNK_NF4)
            step = _deq_chunk(K, kind)
            for c in range(0, K, step):
                sl = slice(c, c + step)
                sb = slice(c // QK, (c + step) // QK)
                if kind == "nf4":
                    codes = _nf4_decode(
                        c_ref[sl, :].astype(jnp.int32) + 8,
                        compute_dtype).reshape(step // QK, QK, bn)
                else:
                    codes = c_ref[sl, :].astype(compute_dtype).reshape(
                        step // QK, QK, bn)
                scales = s_ref[sb, :].astype(compute_dtype)[:, None, :]
                w = codes * scales
                if kind == "q4_1":
                    w = w + m_ref[sb, :].astype(compute_dtype)[:, None, :]
                w_ref[sl, :] = w.reshape(step, bn)
        else:
            # ragged lane count (whole-N tile, e.g. TP shards like
            # N=576): Mosaic cannot relayout 3-D vectors with non-128
            # lanes, so dequantize block-by-block in 2-D — [QK, bn]
            # codes times a [1, bn] scale row broadcast
            for b in range(K // QK):
                sl = slice(b * QK, (b + 1) * QK)
                if kind == "nf4":
                    cv = _nf4_decode(c_ref[sl, :].astype(jnp.int32) + 8,
                                     compute_dtype)
                else:
                    cv = c_ref[sl, :].astype(compute_dtype)
                w = cv * s_ref[b:b + 1, :].astype(compute_dtype)
                if kind == "q4_1":
                    w = w + m_ref[b:b + 1, :].astype(compute_dtype)
                w_ref[sl, :] = w

    acc = jnp.dot(x_ref[:].astype(compute_dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    acc = _apply_epilogue(acc, b_ref, epilogue, res_ref, lns_ref,
                          lnb_ref, ln_eps)
    _emit(acc, o_ref, o8_ref, os_ref)


def _emit(acc, o_ref, o8_ref, os_ref):
    """Write the epilogue result; optionally also (or instead) its
    per-row-symmetric int8 quantization + scale — produced HERE, where
    the full f32 row sits in registers, so the NEXT quantized matmul
    reads pre-quantized activations and never re-derives row absmaxes
    inside its grid loop (the round-3 int8 mode recomputed them once
    per grid step; at K=3072 that made int8 SLOWER than bf16)."""
    if o8_ref is not None:
        rmax = jnp.max(jnp.abs(acc), axis=-1, keepdims=True)
        so = jnp.maximum(rmax, 1e-12) * (1.0 / 127.0)
        o8_ref[:] = jnp.round(acc * (1.0 / so)).astype(jnp.int8)
        os_ref[:] = so
    if o_ref is not None:
        o_ref[:] = acc.astype(o_ref.dtype)


def _apply_epilogue(acc, b_ref, epilogue, res_ref, lns_ref, lnb_ref,
                    ln_eps, add_bias=True):
    if epilogue != "none" and add_bias:
        acc = acc + b_ref[:].astype(jnp.float32)  # fused bias (f32 add)
    if epilogue in ("bias_gelu", "bias_gelu_tanh"):
        # Both erf-GELU and tanh-GELU lower to the tanh form in-kernel:
        # erf(x/√2) ≈ tanh(√(2/π)(x + 0.044715x³)) with max absolute
        # deviation ~1e-3 (at |x|≈2.3) — below the bf16 output resolution
        # this kernel feeds, and ~25% cheaper than a rational-erf epilogue
        # (the A-S 7.1.26 form needs a VPU divide + exp per element; tanh
        # is a single fast transcendental). The unfused XLA fallback
        # (ops/linear.py) keeps exact erf for f32 parity testing.
        acc = jax.nn.gelu(acc, approximate=True)
    elif epilogue == "bias_silu":
        # SiLU for gated MLPs (nomic-bert swiglu): x * sigmoid(x) — one
        # fast transcendental, same cost class as the tanh GELU above
        acc = acc * jax.nn.sigmoid(acc)
    elif epilogue == "bias_residual_ln":
        # y = LayerNorm(residual + acc): the post-attention / post-FFN
        # residual+LN (bert.cpp:1040-1082) runs inside the matmul kernel,
        # saving a full [M, N] HBM write + read round trip per layer pair.
        # Requires bn == N (LN normalizes over the whole hidden axis).
        y = acc + res_ref[:].astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        acc = ((y - mean) * jax.lax.rsqrt(var + ln_eps)
               * lns_ref[:].astype(jnp.float32)
               + lnb_ref[:].astype(jnp.float32))
    return acc


def _qmm_int8(x_ref, c_ref, s_ref, m_ref, b_ref, o_ref, w8_ref, cs_ref,
              i, *, kind: str, epilogue: str, packed: bool,
              res_ref=None, lns_ref=None, lnb_ref=None, ln_eps=0.0,
              sx_ref=None, o8_ref=None, os_ref=None):
    """int8-MXU variant: no bf16 staging scratch — at i == 0 the weight
    tile dequantizes in two passes (per-column absmax, then requantize)
    straight into the int8 scratch. The freed K*bn*2 bytes of VMEM buy
    larger bm tiles exactly where the res-LN epilogue was bound (FFN-down
    runs bm=256 instead of 128). Dequant arithmetic runs twice, but it
    amortizes once per N-tile over M/bm grid steps. Sub-blocks write
    their slice of w8_ref directly — NO jnp.concatenate of unpacked
    pieces (measured +170us on the qkv tile from the concat relayouts)."""
    K = w8_ref.shape[0]

    def packed_groups():
        """yield (row0, nrows=64, f32 dequant value) per nibble group."""
        for g in range(K // 64):
            p = c_ref[g * 32:(g + 1) * 32, :].astype(jnp.int32)
            if kind == "nf4":
                lo = _nf4_decode(p & 15, jnp.float32)
                hi = _nf4_decode(p >> 4, jnp.float32)
            else:
                lo = ((p & 15) - 8).astype(jnp.float32)
                hi = ((p >> 4) - 8).astype(jnp.float32)
            wlo = lo * s_ref[2 * g:2 * g + 1, :].astype(jnp.float32)
            whi = hi * s_ref[2 * g + 1:2 * g + 2, :].astype(jnp.float32)
            if kind == "q4_1":
                wlo = wlo + m_ref[2 * g:2 * g + 1, :].astype(jnp.float32)
                whi = whi + m_ref[2 * g + 1:2 * g + 2, :].astype(jnp.float32)
            yield g * 64, wlo, whi

    def unpacked_chunks():
        """yield (row0, f32 dequant value [step, bn]) per K-chunk."""
        bn = c_ref.shape[-1]
        step = _deq_chunk(K, kind)
        for c in range(0, K, step):
            sl = slice(c, c + step)
            sb = slice(c // QK, (c + step) // QK)
            if kind == "nf4":
                codes = _nf4_decode(c_ref[sl, :].astype(jnp.int32) + 8,
                                    jnp.float32).reshape(
                    step // QK, QK, bn)
            else:
                codes = c_ref[sl, :].astype(jnp.float32).reshape(
                    step // QK, QK, bn)
            w = codes * s_ref[sb, :].astype(jnp.float32)[:, None, :]
            if kind == "q4_1":
                w = w + m_ref[sb, :].astype(jnp.float32)[:, None, :]
            yield c, w.reshape(step, bn)

    @pl.when(i == 0)
    def _():
        first = True
        if packed:
            for _, wlo, whi in packed_groups():
                m = jnp.maximum(jnp.max(jnp.abs(wlo), 0, keepdims=True),
                                jnp.max(jnp.abs(whi), 0, keepdims=True))
                cs_ref[:] = m if first else jnp.maximum(cs_ref[:], m)
                first = False
        else:
            for _, v in unpacked_chunks():
                m = jnp.max(jnp.abs(v), axis=0, keepdims=True)
                cs_ref[:] = m if first else jnp.maximum(cs_ref[:], m)
                first = False
        cs_ref[:] = jnp.maximum(cs_ref[:], 1e-12) * (1.0 / 127.0)
        if packed:
            for r0, wlo, whi in packed_groups():
                inv = 1.0 / cs_ref[0:1, :]
                w8_ref[r0:r0 + 32, :] = jnp.round(
                    wlo * inv).astype(jnp.int8)
                w8_ref[r0 + 32:r0 + 64, :] = jnp.round(
                    whi * inv).astype(jnp.int8)
        else:
            for r0, v in unpacked_chunks():
                w8_ref[r0:r0 + v.shape[0], :] = jnp.round(
                    v * (1.0 / cs_ref[0:1, :])).astype(jnp.int8)

    if sx_ref is not None:
        # pre-quantized activations: x is already per-row int8 and
        # sx_ref holds the row scales — no per-grid-step VPU work, and
        # the x tile reads at HALF the bf16 HBM footprint
        q = x_ref[:]
        sx = sx_ref[:].astype(jnp.float32)
    else:
        # per-row dynamic activation quantization: |x| <= amax by
        # construction, so round() lands in [-127, 127] without a clip.
        # NOTE: recomputed at EVERY grid step — prefer the pre-quantized
        # path (ops/linear.py chains it) for anything throughput-bound.
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        q = jnp.round(xf * (1.0 / sx)).astype(jnp.int8)
    acc = jnp.dot(q, w8_ref[:], preferred_element_type=jnp.int32)
    # rescale + bias in TWO VPU passes over [bm, bn] instead of three:
    # (acc_f32 * cs) then one fused multiply-add (* sx + b). The rescale
    # is the int8 mode's per-step VPU tax on the full accumulator —
    # every pass saved here is ~bm*bn/VPU-rate off the step's critical
    # path (int8_compute.json: qkv ran at 160 of 394 TOPS before this)
    acc = acc.astype(jnp.float32) * cs_ref[0:1, :]
    if epilogue != "none":
        acc = acc * sx + b_ref[:].astype(jnp.float32)
    else:
        acc = acc * sx
    acc = _apply_epilogue(acc, b_ref, epilogue, res_ref, lns_ref,
                          lnb_ref, ln_eps, add_bias=False)
    _emit(acc, o_ref, o8_ref, os_ref)


def residual_ln_fits(K: int, N: int, bm: int = 256,
                     packed: bool = False, int8: bool = False,
                     x_bytes: int = 2) -> bool:
    """Can the bias_residual_ln epilogue run (bn == N must fit VMEM)?"""
    if packed and K % 64 != 0:
        return False
    return N % 128 == 0 and _pick_bn(K, N, bm, None, True, packed,
                                     int8=int8, x_bytes=x_bytes) >= N


def pick_bm_int8(K: int, N: int, packed: bool = False,
                 x_bytes: int = 2) -> int:
    """Preferred bm for the int8 MXU path: 512 when it does not cost
    any bn (never trade N-tiling for M-tiling — shrinking bn multiplies
    the per-N-tile weight requant, and the in-kernel x requant, by
    N/bn), else 256. Pre-quantized int8 x (x_bytes=1) halves the x
    tile's VMEM, which is what lets K=3072 shapes take bm=512."""
    bn256 = _pick_bn(K, N, 256, None, packed=packed, int8=True,
                     x_bytes=x_bytes)
    bn512 = _pick_bn(K, N, 512, None, packed=packed, int8=True,
                     x_bytes=x_bytes)
    return 512 if bn512 > 0 and bn512 >= bn256 else 256


@functools.partial(jax.jit, static_argnames=("kind", "bm", "bn", "epilogue",
                                             "compute_dtype", "out_dtype",
                                             "ln_eps", "packed", "interpret",
                                             "int8_compute",
                                             "emit_quantized"))
def qmatmul(x: jax.Array, codes: jax.Array, scales: jax.Array,
            mins: jax.Array | None = None, bias: jax.Array | None = None,
            *, kind: str = "q4_0", epilogue: str | None = None,
            residual: jax.Array | None = None,
            ln_scale: jax.Array | None = None,
            ln_bias: jax.Array | None = None, ln_eps: float = 1e-12,
            bm: int = 256, bn: int | None = None,
            compute_dtype=jnp.bfloat16, out_dtype=None,
            packed: bool = False, int8_compute: bool = False,
            x_scale: jax.Array | None = None,
            emit_quantized: str = "no",
            interpret: bool = False):
    """x [M, K] @ dequant(codes [K, N], scales [K//32, N]) -> [M, N].

    Optional fused epilogue (HBM-traffic saver): "bias" adds bias [N] at
    f32 accumulator precision; "bias_gelu"/"bias_gelu_tanh" additionally
    apply GELU — the FFN up-projection never materializes its f32
    pre-activation in HBM. "bias_residual_ln" computes
    LayerNorm(residual + x@w + bias) in-kernel (needs bn == N; check
    residual_ln_fits). out_dtype defaults to x.dtype.

    packed: codes is uint8 [K/2, N] in the group-64 nibble layout
    (quant.pack_codes_g64) — the true 4-bit HBM footprint; halves the
    weight-read bandwidth of the bandwidth-bound small-batch case.

    int8_compute: run the MXU dot in s8xs8->s32 (2x the bf16 rate on
    v5e) — weights requantize in VMEM to per-column int8 on top of
    their stored format; activations either arrive pre-quantized (x is
    int8 + x_scale [M] f32 row scales — the fast path the engine chains
    between layers) or quantize per-row on the fly inside the kernel
    (legacy; recomputed every grid step). An extra ~2^-7-relative
    quantization error on top of the weight format's own; storage and
    HBM traffic unchanged (halved for the x read when pre-quantized).
    Falls back to bf16 compute on ragged-lane tilings (with a warning).

    emit_quantized: "no" | "both" | "only" — additionally emit the
    epilogue output quantized per-row to int8 with its [M, 1] f32 row
    scales, computed in-register where the full output row lives (needs
    bn == N). "both" returns (out, out8, out_scale); "only" skips the
    dense output and returns (out8, out_scale) — the GELU->FFN-down
    link writes 1 byte/elem instead of 2.

    M must be a multiple of bm (the engine's bucketed batches are; use
    ops.linear for the padded/general entry point) and K % 32 == 0.
    """
    M, K = x.shape
    x_prequant = x.dtype == jnp.int8
    if x_prequant:
        assert x_scale is not None and int8_compute, \
            "int8 x requires x_scale row scales and int8_compute=True"
        x_scale = x_scale.reshape(M, 1).astype(jnp.float32)
    assert emit_quantized in ("no", "both", "only")
    K2, N = codes.shape
    if packed:
        K2 = K2 * 2
    assert K == K2, (x.shape, codes.shape, packed)
    assert K % QK == 0, K
    if epilogue is None:
        epilogue = "none" if bias is None else "bias"
    assert epilogue in ("none", "bias", "bias_gelu", "bias_gelu_tanh",
                        "bias_silu", "bias_residual_ln")
    with_res = epilogue == "bias_residual_ln"
    out_dtype = out_dtype or x.dtype
    bm = _fit(M, bm, 8)
    xb = 1 if x_prequant else 2
    if with_res:
        bn = N  # LayerNorm normalizes over the full hidden axis
        assert residual is not None and ln_scale is not None \
            and ln_bias is not None
        assert _pick_bn(K, N, bm, None, True, packed,
                        int8=int8_compute, x_bytes=xb) >= N, \
            (K, N, bm, "residual-LN tile does not fit VMEM")
    else:
        bn = _pick_bn(K, N, bm, bn, packed=packed, int8=int8_compute,
                      x_bytes=xb)
    assert bn > 0, ((M, N, K), bm, "no VMEM-feasible tiling; check "
                    "pallas_fits before calling")
    assert M % bm == 0 and N % bn == 0, ((M, N, K), (bm, bn))
    if int8_compute and (bn % 128 != 0 or K % 32 != 0):
        # ragged-lane tile (e.g. the N=576 qkv shard under tp=4): the
        # int8 scratch cannot legalize at a non-128-multiple lane count,
        # so this shape silently loses the 2x MXU rate. Trace-time (the
        # args are static), so the warning fires once per compiled shape.
        import logging
        logging.getLogger(__name__).warning(
            "int8_compute requested but tile (K=%d, N=%d, bn=%d) has a "
            "ragged lane count - falling back to bf16 MXU compute for "
            "this matmul (expect ~the bf16 rate, not 2x)", K, N, bn)
        int8_compute = False
    assert not (x_prequant and not int8_compute), \
        (K, N, bn, "pre-quantized int8 x cannot run the bf16 fallback; "
         "gate chaining on pallas_fits(..., int8=True) and lane alignment")
    if emit_quantized != "no":
        assert bn == N, (bn, N, "quantized emission needs full output "
                         "rows per tile (bn == N) for the row absmax")

    if mins is None:
        mins = jnp.zeros((K // QK, N), scales.dtype)  # unused for q4_0/q8_0
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias2d = bias.reshape(1, N).astype(jnp.float32)

    codes_rows = K // 2 if packed else K
    flops = 2 * M * N * K
    bytes_accessed = (M * K * x.dtype.itemsize + codes_rows * N
                      + (K // QK) * N * 4)
    if emit_quantized != "only":
        bytes_accessed += M * N * jnp.dtype(out_dtype).itemsize
    if emit_quantized != "no":
        bytes_accessed += M * N + M * 4
    in_specs = [
        pl.BlockSpec((bm, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((codes_rows, bn), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K // QK, bn), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K // QK, bn), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, codes, scales, mins, bias2d]
    if with_res:
        in_specs += [
            pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [residual.reshape(M, N), ln_scale.reshape(1, N),
                     ln_bias.reshape(1, N)]
    if x_prequant:
        in_specs.append(pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(x_scale)

    with_out = emit_quantized != "only"
    with_emit = emit_quantized != "no"
    out_shape, out_specs = [], []
    if with_out:
        out_shape.append(jax.ShapeDtypeStruct((M, N), out_dtype))
        out_specs.append(pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                                      memory_space=pltpu.VMEM))
    if with_emit:
        out_shape += [jax.ShapeDtypeStruct((M, N), jnp.int8),
                      jax.ShapeDtypeStruct((M, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                                   memory_space=pltpu.VMEM)]

    def kernel(*refs):
        # refs: x, c, s, m, b, [res, lns, lnb], [sx],
        #       [o], [o8, os], w | (w8, cs)
        x_r, c_r, s_r, m_r, b_r = refs[:5]
        rest = list(refs[5:])
        res_r = lns_r = lnb_r = sx_r = None
        if with_res:
            res_r, lns_r, lnb_r = rest[:3]
            rest = rest[3:]
        if x_prequant:
            sx_r = rest.pop(0)
        o_r = rest.pop(0) if with_out else None
        o8_r = os_r = None
        if with_emit:
            o8_r, os_r = rest[:2]
            rest = rest[2:]
        w_r = w8_r = cs_r = None
        if int8_compute:
            w8_r, cs_r = rest
        else:
            (w_r,) = rest
        _qmm_kernel(x_r, c_r, s_r, m_r, b_r, o_r, w_r, kind=kind,
                    compute_dtype=compute_dtype, epilogue=epilogue,
                    packed=packed,
                    res_ref=res_r, lns_ref=lns_r, lnb_ref=lnb_r,
                    ln_eps=ln_eps, w8_ref=w8_r, cs_ref=cs_r,
                    sx_ref=sx_r, o8_ref=o8_r, os_ref=os_r)
    if int8_compute:
        # no bf16 staging scratch in int8 mode (see _qmm_int8)
        scratch = [pltpu.VMEM((K, bn), jnp.int8),
                   pltpu.VMEM((1, bn), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((K, bn), compute_dtype)]
    out = pl.pallas_call(
        kernel,
        grid=(N // bn, M // bm),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out
