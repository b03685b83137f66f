"""Fused multi-head attention kernel (Pallas TPU).

The XLA einsum path materializes scores and probabilities
([B, H, L, L] f32 ≈ 400 MB at bench shapes) in HBM. This kernel computes
softmax(q kᵀ/√d + mask) v entirely in VMEM — the TPU-idiomatic analogue of
the reference materializing its [L, L, H·B] mask+scores in the ggml arena
(bert.cpp:957-1025). For encoder lengths (≤512) a full [L, L] score tile
fits VMEM, so no online-softmax streaming is needed.

Layout trick: the kernel reads the *fused qkv projection output* [M, 3E]
directly — three BlockSpecs with different column index maps slice q, k, v
per sequence with zero relayout (a [B,L,H,D] -> [B,H,L,D] transpose would
cost ~300 MB of HBM traffic per layer).

Softmax engineering (measured 1.6-1.9x vs the naive in-kernel softmax at
B=128 L=256 H=12 D=64 on TPU; bit-identical outputs at bf16 resolution):

- exp2 instead of exp, with log2(e) folded into the 1/√d score scale
  (the VPU's native exponential is base-2);
- no max-subtraction: scores are clamped to [-100, 127-ceil(log2 n_keys)]
  instead (118 at 512 keys) — neither exp2 nor the n_keys-term f32
  denominator sum can overflow at any row length, and the denominator
  cannot reach zero (CLS is always a valid key), saving a full [L, L]
  reduce+broadcast-subtract per head;
- the softmax DENOMINATOR comes out of the PV matmul: v is augmented with
  a ones column into the otherwise-wasted lanes of its [L, 128] tile
  ([v | 1 | 0…]), so row-sum(p) is one extra MXU column instead of a
  separate [L, L] f32 VPU reduction. One reciprocal-scaled multiply
  normalizes the context at width D.

Padding: per-sequence lengths arrive as a scalar-prefetch operand and the
key mask is built in-kernel from iota — pad keys get probability 0 exactly
(same numerics as the additive -1e9 einsum path for prefix masks, which is
the only mask shape the engine produces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
LOG2E = 1.4426950408889634
# clamp bounds for base-2 scores: exp2(-100) stays normal, and the upper
# bound is sized to the key count so the f32 denominator sum cannot
# overflow — n_keys * 2^hi <= 2^127 < f32 max for hi = 127 - ceil(log2
# n_keys). Overflow (inf/inf = NaN) is structurally impossible at ANY
# row length, not just the 512 cap.
_CLAMP_LO = -100.0


def _clamp_hi(n_keys: int) -> float:
    import math
    return float(127 - math.ceil(math.log2(max(n_keys, 2))))


def _emit_int8_rows(of32, o8_ref, os_ref):
    """Per-row symmetric int8 quantization of a full-row tile, written
    to the emission outputs — the attention analogue of the matmul
    kernels' emission epilogue (ops/qmatmul._emit): the context feeds
    ONLY the o-projection, so emitting it pre-quantized here removes the
    per-layer XLA quantize pass (an extra [M, E] HBM read) entirely."""
    rmax = jnp.max(jnp.abs(of32), axis=-1, keepdims=True)
    so = jnp.maximum(rmax, 1e-30) * (1.0 / 127.0)
    o8_ref[:] = jnp.round(of32 * (1.0 / so)).astype(jnp.int8)
    os_ref[:] = so


def _attn_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
                 Lq: int, L: int, D: int, H: int, scale: float,
                 o8_ref=None, os_ref=None, stage_ref=None,
                 int8_scores: bool = False):
    """Grid (B, L/Lq): queries in [Lq, E] blocks, keys/values the whole
    row. At L <= 512 the engine sets Lq = L (one query block — the
    measured-fast whole-row tile, nQ = 1); longer rows use Lq = 128 so
    scoped VMEM holds two full-row operands instead of four (the
    whole-row layout overflows 16 MB at L=1024, E=768).

    o8_ref/os_ref (emission): also write the context per-row-quantized
    to int8 + f32 row scales. stage_ref (int8-only emission, o_ref is
    None): an f32 VMEM scratch staging the per-head writes so the row
    absmax reads from VMEM, and the bf16 context never reaches HBM.

    int8_scores: both attention matmuls run s8xs8->s32 on the MXU at
    2x the bf16 rate (the attention analogue of ops/qmatmul's int8
    mode). q/k quantize per row (symmetric absmax), v per column, and
    the probabilities are EMITTED int8: p8 = round(exp2(s - m + log2
    127)) in [0, 127] — max-subtraction returns (it doubles as the
    quantization scale), the overflow clamp becomes unnecessary, and
    the per-row factor 2^m cancels exactly in the p.v / sum(p)
    normalization, as does the 127: out = acc[:, :D] * sv * 127 /
    acc_den with acc_den = sum(p8) * 127 off the quantized ones
    column."""
    b = pl.program_id(0)
    n = lengths_ref[b]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (Lq, L), 1) < n
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * D), 1)
    tgt = stage_ref if stage_ref is not None else o_ref
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        if int8_scores:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            vf = v_ref[:, sl].astype(jnp.float32)
            sq = jnp.maximum(jnp.max(jnp.abs(qf), -1, keepdims=True),
                             1e-30) * (1.0 / 127.0)
            sk = jnp.maximum(jnp.max(jnp.abs(kf), -1, keepdims=True),
                             1e-30) * (1.0 / 127.0)
            sv = jnp.maximum(jnp.max(jnp.abs(vf), 0, keepdims=True),
                             1e-30) * (1.0 / 127.0)
            q8 = jnp.round(qf * (1.0 / sq)).astype(jnp.int8)
            k8 = jnp.round(kf * (1.0 / sk)).astype(jnp.int8)
            v8 = jnp.round(vf * (1.0 / sv)).astype(jnp.int8)
            vaug = jnp.where(aug_col == D, jnp.int8(127),
                             jnp.pad(v8, ((0, 0), (0, D))))
            s32 = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = (s32.astype(jnp.float32) * (sq * s2)
                 * sk.reshape(1, L))
            s = jnp.where(key_ok, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            # p in [0, 127] exactly: the row max exponentiates to
            # log2(127); pad keys underflow exp2 to 0
            p8 = jnp.round(jnp.exp2(s - m + 6.9886846867721655)
                           ).astype(jnp.int8)
            acc = jax.lax.dot(p8, vaug,
                              preferred_element_type=jnp.int32)
            den = jnp.maximum(acc[:, D:D + 1].astype(jnp.float32), 1.0)
            tgt[:, sl] = (acc[:, :D].astype(jnp.float32) * sv
                          * (127.0 / den)).astype(tgt.dtype)
            continue
        # v augmented to [L, 2D]: [v | 1 | 0...] — the ones column turns
        # the PV matmul's spare lanes into the softmax row-sum
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        # s2 folds into q BEFORE the dot: one VPU pass over [Lq, D]
        # instead of [Lq, L] (4-16x fewer elements); the f32 multiply
        # keeps the constant exact, the per-element bf16 rounding is
        # the same one the scores already carry from bf16 q
        qs = (q.astype(jnp.float32) * s2).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(key_ok, jnp.exp2(s), 0.0).astype(q.dtype)
        of = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
        # all-pad filler rows (n==0) have denom 0; clamp so they stay
        # finite (their output is discarded by pooling/scatter anyway)
        denom = jnp.maximum(of[:, D:D + 1], 1e-30)
        tgt[:, sl] = (of[:, :D] * (1.0 / denom)).astype(tgt.dtype)
    if o8_ref is not None:
        _emit_int8_rows(tgt[:].astype(jnp.float32), o8_ref, os_ref)


def _query_block(L: int) -> int:
    """Query rows per grid step: the whole row up to 512 (one [L, L]
    score tile, measured fastest), BQ blocks beyond (VMEM)."""
    return L if L <= 512 else BQ


def supported(L: int, H: int, D: int) -> bool:
    # ones column must fit the [L, 2D] tile next to v; rows sublane-tiled;
    # the q/k/v BlockSpecs slice E-wide lanes out of the [M, 3E] array, so
    # Mosaic needs E to be a whole number of 128-lane tiles (all production
    # models: E in {384, 512, 768, 1024}; tiny test models fall back to
    # XLA). Rows past 512 run the blocked-query grid: L % 128 == 0.
    return (D <= LANE and L % 8 == 0 and (H * D) % LANE == 0
            and (L <= 512 or L % BQ == 0))


def _attn_kernel_bias(lengths_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                      Lq: int, L: int, D: int, H: int, scale: float):
    """_attn_kernel + an additive attention-logit bias (MPNet's relative
    position bias). bias_ref is this query block's [1, H, Lq, L] tile of
    the precomputed log2-scaled bias (models/bert.relative_attention_bias
    output via prepare_attention_bias) — batch-independent, shared across
    layers, so one [nQ, H, Lq, L] array serves the whole forward."""
    b = pl.program_id(0)
    n = lengths_ref[b]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (Lq, L), 1) < n
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * D), 1)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        s = s + bias_ref[0, h]
        # clamp AFTER the bias add: the no-overflow bound must hold for
        # the final exponent
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(key_ok, jnp.exp2(s), 0.0).astype(q.dtype)
        of = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
        denom = jnp.maximum(of[:, D:D + 1], 1e-30)
        o_ref[:, sl] = (of[:, :D] * (1.0 / denom)).astype(o_ref.dtype)


def _query_block_bias(L: int) -> int:
    """Query rows per grid step for the bias kernel: the bias tile is
    [H, Lq, L] f32 VMEM on top of _attn_kernel's operands, so drop to
    128-row query blocks earlier (L=512 whole-row would put a 12.6 MB
    bias tile next to ~3 MB of qkv/out)."""
    return L if L <= 256 else BQ


def bias_supported(L: int, H: int, D: int) -> bool:
    """supported() + the bias tile must leave VMEM room: [H, Lq, L] f32
    capped at 8 MB (half of scoped VMEM)."""
    return (supported(L, H, D)
            and H * _query_block_bias(L) * L * 4 <= 8 * 1024 * 1024)


def prepare_attention_bias(bias: jax.Array, L: int) -> jax.Array:
    """[1, H, L, L] additive logit bias -> the kernel's [nQ, H, Lq, L]
    block-major layout, pre-scaled by log2(e) (the kernel's exponent is
    base-2). Computed once per forward; shared by every layer."""
    H = bias.shape[1]
    Lq = _query_block_bias(L)
    nQ = L // Lq
    b = (bias[0] * LOG2E).astype(jnp.float32)       # [H, L, L]
    return jnp.transpose(b.reshape(H, nQ, Lq, L), (1, 0, 2, 3))


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D",
                                             "mask_value", "interpret"))
def fused_attention_bias(qkv: jax.Array, lengths: jax.Array,
                         bias: jax.Array, *, B: int, L: int, H: int,
                         D: int, mask_value: float = -1e9,
                         interpret: bool = False) -> jax.Array:
    """fused_attention + additive attention-logit bias (MPNet).

    qkv [B*L, 3*H*D] and lengths as in fused_attention; bias
    [nQ, H, Lq, L] f32 from prepare_attention_bias (batch-independent —
    the relative-position bias depends only on query/key positions).
    """
    E = H * D
    M = B * L
    Lq = _query_block_bias(L)
    nQ = L // Lq
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert bias.shape == (nQ, H, Lq, L), (bias.shape, (nQ, H, Lq, L))
    assert bias_supported(L, H, D), (L, H, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec((Lq, E), lambda b, qb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 2),
                         memory_space=pltpu.VMEM),
            # bias: depends on qb alone — refetched only per query block
            pl.BlockSpec((1, H, Lq, L), lambda b, qb, *_: (qb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lq, E), lambda b, qb, *_: (b * nQ + qb, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_attn_kernel_bias, Lq=Lq, L=L, D=D, H=H,
                               scale=1.0 / (D ** 0.5))
    flops = 2 * 2 * B * H * L * L * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, E), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(M * 4 * E * qkv.dtype.itemsize
                            + H * L * L * 4),
            transcendentals=B * H * L * L),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv, bias)


def _attn_kernel_segmented(q_ref, k_ref, v_ref, segq_ref, segk_ref, o_ref, *,
                           Lq: int, L: int, D: int, H: int, scale: float,
                           o8_ref=None, os_ref=None, stage_ref=None):
    """Same softmax/PV structure as _attn_kernel, but the key mask comes
    from segment equality instead of a prefix length — attention only
    within each packed segment (runtime/packing.py), pads (seg -1) get
    zero probability everywhere.

    Grid (B, L/Lq) like _attn_kernel (Lq = L up to 512, 128 beyond).
    segq_ref is this query block's [Lq, 1] view; segk_ref is the whole
    [B, L] table (Mosaic forbids a (1, L) block, so the key-side row is
    sliced dynamically in-kernel)."""
    b = pl.program_id(0)
    segq = segq_ref[:]                                     # [Lq, 1]
    segk = segk_ref[pl.dslice(b, 1), :]                    # [1, L]
    key_ok = (segq == segk) & (segk >= 0)                  # [Lq, L]
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    tgt = stage_ref if stage_ref is not None else o_ref
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * D), 1)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(key_ok, jnp.exp2(s), 0.0).astype(q.dtype)
        of = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
        # pad query rows have no valid keys -> denom==0; make it 1 so the
        # (discarded) rows stay finite instead of NaN
        denom = jnp.maximum(of[:, D:D + 1], 1e-30)
        tgt[:, sl] = (of[:, :D] * (1.0 / denom)).astype(tgt.dtype)
    if o8_ref is not None:
        _emit_int8_rows(tgt[:].astype(jnp.float32), o8_ref, os_ref)


BQ = 128  # query rows per block in the block-skipping segmented kernel


def _attn_kernel_seg_window(kbs_ref, kbe_ref, q_ref, k_ref, v_ref,
                            segq_ref, segk_ref, o_ref, *,
                            L: int, D: int, H: int, scale: float, W: int):
    """Windowed variant of _attn_kernel_segmented: packing keeps each row's
    segments contiguous and ascending, so every 128-row query block only
    attends inside a contiguous run of W key blocks starting at its
    precomputed first overlapping block (block_ranges). The kernel computes
    exactly those W blocks via dynamic slices — attention cost becomes
    O(L * W*BQ) instead of O(L^2), independent of row length.

    Grid (B, L/BQ): one query block per step — q/o/segq tiles are
    [BQ, ...] so VMEM holds two full-row operands (k/v), not four (the
    whole-row q/o layout overflowed scoped VMEM at L=1024, E=768). The
    k/v block indices depend only on b, so Mosaic fetches them once per
    row, not once per query block.

    Engineering notes (all measured on v5e at B*L=32K tokens, H=12 D=64):
    - dynamic fori_loop over the true range: 3.5x SLOWER than the full
      [L, L] tile (deserializes Mosaic's pipeline). Rejected.
    - static key-block loop with @pl.when per block + VMEM accumulator:
      also ~3x slower — the predicated regions flush the pipeline.
    - this version: NO predication, a fixed W-step unrolled loop at
      dynamic block offsets, register accumulation. Overshoot steps are
      clamped to the last block and masked out via the kbe bound, so
      revisits contribute exactly zero.

    kbs/kbe: [B, L/BQ] int32 scalar-prefetch — first/last (inclusive) key
    block per query block (kbe < kbs for all-pad query blocks: every
    window step masks to zero and the denominator clamp keeps pads
    finite). segq_ref: this query block's [BQ, 1] segment ids; segk_ref:
    [B*nK, BQ] the block-major segment table (seg.reshape)."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    nK = L // BQ
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(min(W * BQ, L))
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (BQ, 2 * D), 1)
    segq = segq_ref[:]                                    # [BQ, 1]
    lo = kbs_ref[b, qb]
    hi = kbe_ref[b, qb]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        acc = None
        for w in range(W):
            kb = jnp.minimum(lo + w, nK - 1)              # clamp overshoot
            ksl = pl.dslice(kb * BQ, BQ)
            k = k_ref[ksl, sl]                            # [BQ, D]
            segk = segk_ref[pl.dslice(b * nK + kb, 1), :]       # [1, BQ]
            # (lo + w) > hi masks clamped/overshoot steps entirely
            valid = (segq == segk) & (segk >= 0) & (lo + w <= hi)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            s = jnp.clip(s, _CLAMP_LO, clamp_hi)
            p = jnp.where(valid, jnp.exp2(s), 0.0).astype(q.dtype)
            vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                             jnp.pad(v_ref[ksl, sl], ((0, 0), (0, D))))
            d = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        denom = jnp.maximum(acc[:, D:D + 1], 1e-30)
        o_ref[:, sl] = (acc[:, :D] * (1.0 / denom)).astype(o_ref.dtype)


def block_ranges(seg_ids: jax.Array, L: int) -> tuple[jax.Array, jax.Array]:
    """[B, L] segment ids -> (kbs, kbe) [B, L/BQ] int32: the first/last
    key block overlapping each query block's segment span. Pure jnp (runs
    fused inside the jitted forward; values are runtime data, shapes are
    static). All-pad query blocks get (nK, -1) so the kernel loop is empty.
    """
    B = seg_ids.shape[0]
    nQ = L // BQ
    segb = seg_ids.reshape(B, nQ, BQ)
    valid = segb >= 0
    big = jnp.int32(1 << 30)
    smin = jnp.min(jnp.where(valid, segb, big), axis=-1)      # [B, nQ]
    smax = jnp.max(jnp.where(valid, segb, -1), axis=-1)
    s = seg_ids[:, None, :]                                   # [B, 1, L]
    in_span = ((s >= smin[..., None]) & (s <= smax[..., None]) & (s >= 0))
    pos = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    first = jnp.min(jnp.where(in_span, pos, L), axis=-1)      # [B, nQ]
    last = jnp.max(jnp.where(in_span, pos, -1), axis=-1)
    return (first // BQ).astype(jnp.int32), \
        jnp.where(last < 0, -1, last // BQ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D", "window",
                                             "mask_value", "interpret"))
def fused_attention_segmented_blockskip(
        qkv: jax.Array, seg_ids: jax.Array, *, B: int, L: int, H: int,
        D: int, window: int = 0, mask_value: float = -1e9,
        interpret: bool = False) -> jax.Array:
    """Block-skipping (windowed) fused_attention_segmented; requires
    L % 128 == 0.

    Same contract as fused_attention_segmented. window = max key blocks
    any query block overlaps (STATIC; runtime/packing.max_block_span
    computes it host-side, 0/unset means the safe full width L/128).
    Prefer this for packed rows longer than 128 tokens: attention cost is
    O(L * window*128) instead of O(L^2)."""
    E = H * D
    M = B * L
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert seg_ids.shape == (B, L), seg_ids.shape
    assert L % BQ == 0 and supported(L, H, D), (L, H, D)
    nK = L // BQ
    W = window if 0 < window <= nK else nK
    kbs, kbe = block_ranges(seg_ids, L)
    seg_col = seg_ids.reshape(M, 1)
    seg_blk = seg_ids.reshape(B * nK, BQ)

    kernel = functools.partial(_attn_kernel_seg_window, L=L, D=D, H=H,
                               scale=1.0 / (D ** 0.5), W=W)
    nQ = L // BQ
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nQ),
        in_specs=[
            # q: this query block only; k/v: the whole row (index depends
            # on b alone, fetched once per row)
            pl.BlockSpec((BQ, E), lambda b, qb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, 1), lambda b, qb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * nK, BQ), lambda b, qb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, E), lambda b, qb, *_: (b * nQ + qb, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * 2 * B * H * L * min(W * BQ, L) * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, E), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * 4 * E * qkv.dtype.itemsize,
            transcendentals=B * H * L * min(W * BQ, L)),
        interpret=interpret,
    )(kbs, kbe, qkv, qkv, qkv, seg_col, seg_blk)


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D",
                                             "mask_value", "interpret",
                                             "emit_quantized"))
def fused_attention_segmented(qkv: jax.Array, seg_ids: jax.Array, *, B: int,
                              L: int, H: int, D: int,
                              mask_value: float = -1e9,
                              emit_quantized: str = "no",
                              interpret: bool = False):
    """Segment-masked variant of fused_attention for token-packed rows.

    qkv [B*L, 3*H*D] as in fused_attention; seg_ids int32 [B, L] with -1
    on pad positions. mask_value accepted for API compatibility (pads and
    cross-segment pairs get exactly zero probability). emit_quantized:
    as in fused_attention — per-row int8 context emission for the
    chained int8 o-projection ("only" skips the bf16 write).
    """
    E = H * D
    M = B * L
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert seg_ids.shape == (B, L), seg_ids.shape
    assert supported(L, H, D), (L, H, D)
    assert emit_quantized in ("no", "both", "only")
    seg_col = seg_ids.reshape(M, 1)   # query-side view, tiled [Lq, 1]
    seg_row = seg_ids                  # key-side view, tiled [1, L]
    Lq = _query_block(L)
    nQ = L // Lq

    with_out = emit_quantized != "only"
    with_emit = emit_quantized != "no"
    out_shape, out_specs = [], []
    if with_out:
        out_shape.append(jax.ShapeDtypeStruct((M, E), qkv.dtype))
        out_specs.append(pl.BlockSpec(
            (Lq, E), lambda b, qb: (b * nQ + qb, 0),
            memory_space=pltpu.VMEM))
    if with_emit:
        out_shape += [jax.ShapeDtypeStruct((M, E), jnp.int8),
                      jax.ShapeDtypeStruct((M, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((Lq, E),
                                   lambda b, qb: (b * nQ + qb, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((Lq, 1),
                                   lambda b, qb: (b * nQ + qb, 0),
                                   memory_space=pltpu.VMEM)]
    scratch = ([pltpu.VMEM((Lq, E), jnp.float32)]
               if (with_emit and not with_out) else [])

    def kernel(q_ref, k_ref, v_ref, segq_ref, segk_ref, *rest):
        o_ref = o8_ref = os_ref = stage_ref = None
        rest = list(rest)
        if with_out:
            o_ref = rest.pop(0)
        if with_emit:
            o8_ref, os_ref = rest[:2]
            rest = rest[2:]
        if scratch:
            (stage_ref,) = rest
        _attn_kernel_segmented(q_ref, k_ref, v_ref, segq_ref, segk_ref,
                               o_ref, Lq=Lq, L=L, D=D, H=H,
                               scale=1.0 / (D ** 0.5), o8_ref=o8_ref,
                               os_ref=os_ref, stage_ref=stage_ref)

    flops = 2 * 2 * B * H * L * L * D
    out = pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec((Lq, E), lambda b, qb: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb: (b, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb: (b, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, 1), lambda b, qb: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda b, qb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * 4 * E * qkv.dtype.itemsize,
            transcendentals=B * H * L * L),
        interpret=interpret,
    )(qkv, qkv, qkv, seg_col, seg_row)
    return out


def _attn_kernel_cp(lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
                    Lc: int, L: int, D: int, H: int, scale: float):
    """Rectangular variant of _attn_kernel for context parallelism:
    queries are this chip's local [Lc, E] chunk, keys/values the
    all-gathered full sequence [L, E]. Same exp2/clamp/PV-denominator
    engineering; the [Lc, L] score tile lives only in VMEM."""
    b = pl.program_id(0)
    n = lengths_ref[b]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (Lc, L), 1) < n
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * D), 1)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]                                   # [Lc, D]
        k = k_ref[:, sl]                                   # [L, D]
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2       # [Lc, L]
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(key_ok, jnp.exp2(s), 0.0).astype(q.dtype)
        of = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
        denom = jnp.maximum(of[:, D:D + 1], 1e-30)
        o_ref[:, sl] = (of[:, :D] * (1.0 / denom)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("B", "Lc", "L", "H", "D",
                                             "mask_value", "interpret"))
def fused_attention_cp(q: jax.Array, kv: jax.Array, lengths: jax.Array, *,
                       B: int, Lc: int, L: int, H: int, D: int,
                       mask_value: float = -1e9,
                       interpret: bool = False) -> jax.Array:
    """Context-parallel fused attention: q [B*Lc, H*D] (the local query
    chunk), kv [B*L, 2*H*D] (all-gathered [k | v] columns), lengths [B]
    int32 prefix lengths -> context [B*Lc, H*D].

    Runs per-shard inside shard_map (parallel/context.py): the [Lc, L]
    score tile never touches HBM, replacing the einsum path that
    materialized [B, H, Lc, L] f32 exactly where CP matters (long L,
    small per-chip batch). mask_value accepted for API compatibility
    (pad keys get exactly zero probability)."""
    E = H * D
    assert q.shape == (B * Lc, E), (q.shape, (B * Lc, E))
    assert kv.shape == (B * L, 2 * E), (kv.shape, (B * L, 2 * E))
    assert supported(L, H, D) and Lc % 8 == 0, (Lc, L, H, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((Lc, E), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, *_: (b, 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lc, E), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_attn_kernel_cp, Lc=Lc, L=L, D=D, H=H,
                               scale=1.0 / (D ** 0.5))
    flops = 2 * 2 * B * H * Lc * L * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Lc, E), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(B * Lc * E + B * L * 2 * E + B * Lc * E)
            * q.dtype.itemsize,
            transcendentals=B * H * Lc * L),
        interpret=interpret,
    )(lengths, q, kv, kv)


def _attn_kernel_stream(lengths_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *,
                        Lq: int, BK: int, L: int, D: int, H: int,
                        scale: float, nKB: int, span: int | None,
                        window: int, causal: bool,
                        slopes: tuple[float, ...] | None):
    """Streaming (online-accumulation) variant of _attn_kernel: keys and
    values arrive in [BK, E] blocks over the innermost grid dimension, so
    VMEM never holds a whole row of K/V — this is what takes the engine
    past the ~2048-token whole-row VMEM ceiling to 8192+.

    NO running max is needed: the no-max-subtraction clamp bound
    (_clamp_hi, sized to the TOTAL key count L) makes every partial f32
    accumulation overflow-safe, so cross-block softmax is a plain sum of
    exp2 terms — the accumulator [Lq, H*2D] carries [ctx | denom] per
    head (same augmented-ones-column PV trick) and one reciprocal
    normalizes at the last block.

    Static mask modes (compiled per model family, no bias operand):
    - span: banded/sliding-window grids — the innermost dimension walks
      only the 2*span+1 key blocks around the query block (ModernBERT
      local layers); out-of-range steps clamp to a valid block and mask
      to zero.
    - window: |i-j| <= window//2 in-block mask (with span, exact
      ModernBERT local attention at O(L*window) cost).
    - slopes: per-head ALiBi -slope*|i-j| computed from iota in-kernel
      (jina-bert-v2 at long L, where a bias *operand* would be O(L^2)).
    - causal: j <= i (decoder-style last-token-pooled embedders).
    """
    b = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    W = pl.num_programs(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n = lengths_ref[b]
    if span is None:
        kb_real = kb
        in_range = None
    else:
        raw = qb - span + kb
        kb_real = jnp.clip(raw, 0, nKB - 1)
        in_range = (raw >= 0) & (raw <= nKB - 1)
    qpos = qb * Lq + jax.lax.broadcasted_iota(jnp.int32, (Lq, BK), 0)
    kpos = kb_real * BK + jax.lax.broadcasted_iota(jnp.int32, (Lq, BK), 1)
    ok = kpos < n
    if in_range is not None:
        ok &= in_range
    if window:
        ok &= jnp.abs(qpos - kpos) <= window // 2
    if causal:
        ok &= kpos <= qpos
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    dist = None
    if slopes is not None:
        dist = jnp.abs(qpos - kpos).astype(jnp.float32) * LOG2E
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (BK, 2 * D), 1)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        if slopes is not None:
            s = s - slopes[h] * dist
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(ok, jnp.exp2(s), 0.0).astype(q.dtype)
        d = jax.lax.dot(p, vaug, preferred_element_type=jnp.float32)
        asl = slice(2 * D * h, 2 * D * (h + 1))
        acc_ref[:, asl] += d

    @pl.when(kb == W - 1)
    def _finalize():
        for h in range(H):
            acc = acc_ref[:, 2 * D * h:2 * D * (h + 1)]
            denom = jnp.maximum(acc[:, D:D + 1], 1e-30)
            o_ref[:, h * D:(h + 1) * D] = (
                acc[:, :D] * (1.0 / denom)).astype(o_ref.dtype)


def stream_supported(L: int, H: int, D: int, BK: int = 512) -> bool:
    """Shapes the streaming kernel carries: 128-row query blocks, key
    blocks of BK, lane-tiled E."""
    return (D <= LANE and (H * D) % LANE == 0
            and L % BQ == 0 and L % BK == 0)


def pick_bk(L: int) -> int:
    """Largest key-block size dividing L (bigger blocks = fewer grid
    steps and better MXU utilization; 512 fits VMEM at every E)."""
    for bk in (512, 256, 128):
        if L % bk == 0:
            return bk
    return BQ


_FORCE_STREAM = False

# int8 attention scores ("auto" = follow ops.linear's int8 compute
# mode; "on"/"off" force it for A/B measurement). Trace-time, like the
# other mode switches in this file. DEFAULT OFF: measured on-chip at
# the headline shape (benchmarks/results/attention_cost.json), int8
# QK^T/PV is 2.07x SLOWER than the bf16 kernel (1,701 vs 820 us) —
# every f32->int8 cast of q/k/v and the emitted p8 is a Mosaic
# relayout ((8,128) f32 tiling -> (32,128) int8 tiling) plus per-head
# 64-lane absmax reductions, and that VPU tax exceeds the halved MXU
# time by far. Numerics are fine (min_cos 0.99996); speed is not.
_INT8_SCORES = "off"


def set_int8_scores_mode(mode: str) -> None:
    global _INT8_SCORES
    assert mode in ("auto", "on", "off"), mode
    _INT8_SCORES = mode


def int8_scores_mode(mode: str):
    """Scoped override of the int8-scores dispatch mode (trace-time)."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _INT8_SCORES
        prev = _INT8_SCORES
        _INT8_SCORES = mode
        try:
            yield
        finally:
            _INT8_SCORES = prev
    return _cm()


def use_int8_scores() -> bool:
    if _INT8_SCORES != "auto":
        return _INT8_SCORES == "on"
    from .linear import _use_int8
    return _use_int8()


def force_stream_mode(on: bool = True):
    """Scoped override: make dispatch treat whole-row K/V as not
    fitting, so the streaming kernel carries shapes it would normally
    skip. Used by the long-context quality gates to put trained-weights
    STS numbers on the STREAMING path at shapes (tiny E) where whole-row
    always fits, and available for VMEM-pressure triage in serving.

    Trace-time only: jitted functions bake the value they saw when they
    compiled, and jax's jit cache does NOT key on it. Enable it for the
    whole process (before the first forward) — flipping it between
    calls of the same shape silently reuses the old compilation."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _FORCE_STREAM
        prev = _FORCE_STREAM
        _FORCE_STREAM = on
        try:
            yield
        finally:
            _FORCE_STREAM = prev
    return _cm()


def whole_row_fits(L: int, E: int, itemsize: int = 2) -> bool:
    """Can the non-streaming kernels hold whole-row K/V? Mosaic DOUBLE-
    BUFFERS each operand, so the k+v budget is 4*L*E*itemsize; ~4 MB
    more goes to q/o/score tiles. Measured on v5e: L=2048 E=768 bf16
    (12.6 MB k/v) OOMs scoped VMEM at 17.48M/16M; L=1024 (6.3 MB) fits.
    Past this, dispatch streams key blocks (models/bert.py)."""
    if _FORCE_STREAM:
        return False
    return 4 * L * E * itemsize + 4 * 1024 * 1024 <= 15 * 1024 * 1024


def _stream_call(qkv, lengths, *, B, L, H, D, BK, span, window, causal,
                 slopes, interpret):
    E = H * D
    M = B * L
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert stream_supported(L, H, D, BK), (L, H, D, BK)
    nQ = L // BQ
    nKB = L // BK
    W = nKB if span is None else min(2 * span + 1, nKB)
    if span is not None and W == nKB:
        span = None  # band covers everything: plain streaming walk
        if window and window // 2 >= L - 1:
            window = 0

    def kmap(col):
        if span is None:
            return lambda b, qb, kb, *_: (b * nKB + kb, col)
        return lambda b, qb, kb, *_: (
            b * nKB + jnp.clip(qb - span + kb, 0, nKB - 1), col)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nQ, W),
        in_specs=[
            pl.BlockSpec((BQ, E), lambda b, qb, kb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, E), kmap(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, E), kmap(2), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, E),
                               lambda b, qb, kb, *_: (b * nQ + qb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BQ, 2 * E), jnp.float32)],
    )
    kernel = functools.partial(
        _attn_kernel_stream, Lq=BQ, BK=BK, L=L, D=D, H=H,
        scale=1.0 / (D ** 0.5), nKB=nKB, span=span, window=window,
        causal=causal, slopes=slopes)
    eff_keys = min(W * BK, L)
    flops = 2 * 2 * B * H * L * eff_keys * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, E), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * 4 * E * qkv.dtype.itemsize,
            transcendentals=B * H * L * eff_keys),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv)


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D", "BK",
                                             "alibi_slopes", "causal",
                                             "mask_value", "interpret"))
def fused_attention_stream(qkv: jax.Array, lengths: jax.Array, *, B: int,
                           L: int, H: int, D: int, BK: int = 512,
                           alibi_slopes: tuple[float, ...] | None = None,
                           causal: bool = False, mask_value: float = -1e9,
                           interpret: bool = False) -> jax.Array:
    """Streaming-KV fused attention: same contract as fused_attention but
    VMEM holds only [BK, E] key/value blocks at a time, so L is bounded
    by HBM, not VMEM (8192+). Optional in-kernel ALiBi (alibi_slopes: a
    STATIC tuple — jina-bert-v2 derives it from the head count, so no
    O(L^2) bias operand exists at any length) and causal masking
    (decoder-style embedders). mask_value accepted for API compat."""
    if alibi_slopes is not None:
        assert len(alibi_slopes) == H, (len(alibi_slopes), H)
    return _stream_call(qkv, lengths, B=B, L=L, H=H, D=D, BK=BK, span=None,
                        window=0, causal=causal, slopes=alibi_slopes,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D", "window",
                                             "mask_value", "interpret"))
def fused_attention_window(qkv: jax.Array, lengths: jax.Array, *, B: int,
                           L: int, H: int, D: int, window: int,
                           mask_value: float = -1e9,
                           interpret: bool = False) -> jax.Array:
    """Banded (sliding-window) fused attention: token i attends to
    |i-j| <= window//2 (ModernBERT local layers). The grid walks only
    the 2*span+1 key blocks around each 128-row query block, so cost is
    O(L * window), independent of row length — the dense analogue of the
    packed block-skip kernel (fused_attention_segmented_blockskip)."""
    assert window > 0
    span = -(-(window // 2) // BQ)  # key blocks reachable on each side
    return _stream_call(qkv, lengths, B=B, L=L, H=H, D=D, BK=BQ, span=span,
                        window=window, causal=False, slopes=None,
                        interpret=interpret)


def _attn_kernel_cp_stream(lengths_ref, q_ref, k_ref, v_ref, o_ref,
                           acc_ref, *, BK: int, L: int, D: int, H: int,
                           scale: float):
    """Streaming variant of _attn_kernel_cp: the gathered K/V arrive in
    [BK, E] blocks over the innermost grid dimension (context
    parallelism exists FOR long sequences, where whole-row K/V no
    longer fits VMEM). Same overflow-safe no-max accumulation as
    _attn_kernel_stream."""
    b = pl.program_id(0)
    kb = pl.program_id(2)
    W = pl.num_programs(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n = lengths_ref[b]
    Lq = acc_ref.shape[0]
    kpos = kb * BK + jax.lax.broadcasted_iota(jnp.int32, (Lq, BK), 1)
    ok = kpos < n
    s2 = scale * LOG2E
    clamp_hi = _clamp_hi(L)
    aug_col = jax.lax.broadcasted_iota(jnp.int32, (BK, 2 * D), 1)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        vaug = jnp.where(aug_col == D, jnp.ones((), v_ref.dtype),
                         jnp.pad(v_ref[:, sl], ((0, 0), (0, D))))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        s = jnp.clip(s, _CLAMP_LO, clamp_hi)
        p = jnp.where(ok, jnp.exp2(s), 0.0).astype(q.dtype)
        acc_ref[:, 2 * D * h:2 * D * (h + 1)] += jax.lax.dot(
            p, vaug, preferred_element_type=jnp.float32)

    @pl.when(kb == W - 1)
    def _finalize():
        for h in range(H):
            acc = acc_ref[:, 2 * D * h:2 * D * (h + 1)]
            denom = jnp.maximum(acc[:, D:D + 1], 1e-30)
            o_ref[:, h * D:(h + 1) * D] = (
                acc[:, :D] * (1.0 / denom)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("B", "Lc", "L", "H", "D",
                                             "BK", "mask_value",
                                             "interpret"))
def fused_attention_cp_stream(q: jax.Array, kv: jax.Array,
                              lengths: jax.Array, *, B: int, Lc: int,
                              L: int, H: int, D: int, BK: int = 512,
                              mask_value: float = -1e9,
                              interpret: bool = False) -> jax.Array:
    """fused_attention_cp past the whole-row VMEM ceiling: same contract
    (q [B*Lc, E] local chunk, kv [B*L, 2E] gathered [k | v], prefix
    lengths) but K/V stream through VMEM in [BK, E] blocks — context
    parallelism at L = 8192+ (exactly where CP matters)."""
    E = H * D
    assert q.shape == (B * Lc, E), (q.shape, (B * Lc, E))
    assert kv.shape == (B * L, 2 * E), (kv.shape, (B * L, 2 * E))
    assert stream_supported(L, H, D, BK) and Lc % BQ == 0, (Lc, L, H, D)
    nQ = Lc // BQ
    nKB = L // BK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nQ, nKB),
        in_specs=[
            pl.BlockSpec((BQ, E), lambda b, qb, kb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, E), lambda b, qb, kb, *_: (b * nKB + kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, E), lambda b, qb, kb, *_: (b * nKB + kb, 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, E),
                               lambda b, qb, kb, *_: (b * nQ + qb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BQ, 2 * E), jnp.float32)],
    )
    kernel = functools.partial(_attn_kernel_cp_stream, BK=BK, L=L, D=D,
                               H=H, scale=1.0 / (D ** 0.5))
    flops = 2 * 2 * B * H * Lc * L * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Lc, E), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(B * Lc * E * 2 + B * L * 2 * E)
            * q.dtype.itemsize,
            transcendentals=B * H * Lc * L),
        interpret=interpret,
    )(lengths, q, kv, kv)


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D",
                                             "mask_value", "interpret",
                                             "emit_quantized",
                                             "int8_scores"))
def fused_attention(qkv: jax.Array, lengths: jax.Array, *, B: int, L: int,
                    H: int, D: int, mask_value: float = -1e9,
                    emit_quantized: str = "no",
                    int8_scores: bool = False,
                    interpret: bool = False):
    """qkv [B*L, 3*H*D] (column layout [q | k | v], heads contiguous),
    lengths [B] int32 -> context [B*L, H*D] (pre-output-projection).

    mask_value is accepted for API compatibility; pad keys get exactly
    zero probability regardless of its value.

    emit_quantized: "no" | "both" | "only" — additionally (or instead)
    return the context per-row-quantized (int8 [B*L, E] + f32 [B*L, 1]
    row scales) for the chained int8 o-projection; "only" never writes
    the bf16 context to HBM at all.

    int8_scores: run QK^T and PV on the int8 MXU path (see
    _attn_kernel) — engaged by the engine when int8 compute is on.
    """
    E = H * D
    M = B * L
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert supported(L, H, D), (L, H, D)
    assert emit_quantized in ("no", "both", "only")
    Lq = _query_block(L)
    nQ = L // Lq

    with_out = emit_quantized != "only"
    with_emit = emit_quantized != "no"
    out_shape, out_specs = [], []
    if with_out:
        out_shape.append(jax.ShapeDtypeStruct((M, E), qkv.dtype))
        out_specs.append(pl.BlockSpec(
            (Lq, E), lambda b, qb, *_: (b * nQ + qb, 0),
            memory_space=pltpu.VMEM))
    if with_emit:
        out_shape += [jax.ShapeDtypeStruct((M, E), jnp.int8),
                      jax.ShapeDtypeStruct((M, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((Lq, E),
                                   lambda b, qb, *_: (b * nQ + qb, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((Lq, 1),
                                   lambda b, qb, *_: (b * nQ + qb, 0),
                                   memory_space=pltpu.VMEM)]
    scratch = ([pltpu.VMEM((Lq, E), jnp.float32)]
               if (with_emit and not with_out) else [])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec((Lq, E), lambda b, qb, *_: (b * nQ + qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E), lambda b, qb, *_: (b, 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        scratch_shapes=scratch,
    )

    def kernel(len_ref, q_ref, k_ref, v_ref, *rest):
        o_ref = o8_ref = os_ref = stage_ref = None
        rest = list(rest)
        if with_out:
            o_ref = rest.pop(0)
        if with_emit:
            o8_ref, os_ref = rest[:2]
            rest = rest[2:]
        if scratch:
            (stage_ref,) = rest
        _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, Lq=Lq, L=L,
                     D=D, H=H, scale=1.0 / (D ** 0.5), o8_ref=o8_ref,
                     os_ref=os_ref, stage_ref=stage_ref,
                     int8_scores=int8_scores)

    flops = 2 * 2 * B * H * L * L * D
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * 3 * E * qkv.dtype.itemsize
            + M * E * qkv.dtype.itemsize,
            transcendentals=B * H * L * L),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv)
    return out
