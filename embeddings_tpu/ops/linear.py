"""Linear op with quantization-aware dispatch.

The reference's ``ggml_mul_mat`` transparently consumes f32/f16/q4 weights
(dispatch on tensor type inside ggml). Here ``linear`` is the single entry
point the model code calls; it routes to:

- plain XLA matmul for dense (f32/bf16/f16) weights,
- the Pallas fused dequant-matmul (ops/qmatmul.py) for QuantizedTensor
  weights on TPU,
- an XLA dequantize-then-matmul fallback elsewhere (CPU tests, interpret
  mode) — same numerics, no fusion.
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor, dequantize
from . import qmatmul as _qmm


class ActQ(NamedTuple):
    """A per-row int8-quantized activation: q [..., K] int8 plus row
    scales s [..., 1] f32 (value = q * s). Produced once — by a matmul
    kernel's emission epilogue or quantize_act — and consumed by the
    next quantized matmul's int8 MXU dot, so row absmaxes are never
    recomputed inside a consumer's grid loop (the round-3 design did,
    once per grid step, which at K=3072 made int8 slower than bf16)."""
    q: jax.Array
    s: jax.Array

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # the logical (dequantized) dtype
        return jnp.bfloat16


def quantize_act(x: jax.Array) -> ActQ:
    """Rowwise symmetric int8 quantization of an activation (XLA; one
    bandwidth-bound pass). |x| <= row absmax by construction, so round()
    lands in [-127, 127] without a clip."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.round(xf * (1.0 / s)).astype(jnp.int8)
    return ActQ(q, s)

# Global switch: "auto" uses Pallas on TPU backends only; "never" forces the
# XLA fallback (useful for debugging); "always" forces Pallas (interpret mode
# on CPU).
_PALLAS_MODE = "auto"
# int8 MXU compute mode for quantized matmuls (s8xs8->s32 at 2x the bf16
# rate on v5e): off by default; scoped on via int8_mode(True) — the engine
# sets it from EngineConfig.int8_compute at trace time.
_INT8_MODE = False

# Which links of the chained-int8 activation path are enabled (trace
# time, like _INT8_MODE). Each link is independently measurable:
#   "attn": the fused attention kernels emit the context pre-quantized
#           (f32 VMEM staging when emit="only");
#   "ln":   the two residual-LN matmul kernels emit their LN output as
#           an ActQ next to the bf16 tensor (emit="both"), feeding the
#           next qkv/up matmul — and the layer scan carries (x, xq);
#   "ffn":  the FFN-up matmul emits its GELU output int8-ONLY
#           (emit="only") — this forces bn == N (= intermediate size,
#           3072 for bge-base), the widest tile in the model.
# Round-4 shipped all three unconditionally and regressed 4.1% end to
# end (VERDICT r4 weak #2); benchmarks/int8_chain_ablate.py measured
# each subset on chip (benchmarks/results/int8_chain_ablate.json):
# EVERY link loses — [] 25,268us / attn 25,744 / ffn 25,453 / ln 25,991
# / all-three 26,382. The emission epilogues' staging costs (f32 VMEM
# scratch for "only", the bn==N tile constraint for "ffn") exceed the
# HBM quantize-pass they save at these shapes. Default records the
# measured winner: no chaining — consumers quantize in-kernel (r3 mode).
_CHAIN_LINKS = frozenset()


def set_chain_links(links) -> None:
    global _CHAIN_LINKS
    links = frozenset(links)
    assert links <= {"attn", "ln", "ffn"}, links
    _CHAIN_LINKS = links


@contextlib.contextmanager
def chain_links(links):
    """Scoped override of the chained-int8 link set (trace-time)."""
    global _CHAIN_LINKS
    prev = _CHAIN_LINKS
    set_chain_links(links)
    try:
        yield
    finally:
        _CHAIN_LINKS = prev


def chain_link_on(name: str) -> bool:
    return name in _CHAIN_LINKS


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "always", "never")
    _PALLAS_MODE = mode


def set_int8_mode(on: bool) -> None:
    global _INT8_MODE
    _INT8_MODE = bool(on)


@contextlib.contextmanager
def int8_mode(on: bool):
    """Scoped int8-MXU-compute override (trace-time, like pallas_mode)."""
    global _INT8_MODE
    prev = _INT8_MODE
    _INT8_MODE = bool(on)
    try:
        yield
    finally:
        _INT8_MODE = prev


def _use_int8() -> bool:
    return _INT8_MODE


@contextlib.contextmanager
def pallas_mode(mode: str):
    """Scoped kernel-path override. Dispatch decisions happen at jit TRACE
    time, so wrapping the traced function body in this context pins the
    path for that program without leaking a process-global change (an
    Engine configured with use_pallas="never" must not downgrade every
    other Engine in the process)."""
    global _PALLAS_MODE
    prev = _PALLAS_MODE
    set_pallas_mode(mode)
    try:
        yield
    finally:
        _PALLAS_MODE = prev


_INTERPRET = False


@contextlib.contextmanager
def interpret_mode(on: bool = True):
    """Scoped: route every quantized linear through the Pallas kernels
    in INTERPRET mode (runs on CPU) — lets tests exercise the exact
    kernel code paths (chained int8, emission epilogues) end-to-end
    through the model without TPU hardware. Trace-time, like
    pallas_mode."""
    global _INTERPRET
    prev = _INTERPRET
    _INTERPRET = bool(on)
    try:
        yield
    finally:
        _INTERPRET = prev


def _use_interpret() -> bool:
    return _INTERPRET


def _use_pallas() -> bool:
    # NOTE: deliberately ignores _INTERPRET — the attention kernels key
    # off this too and have no interpret plumbing; interpret_mode only
    # reroutes the quantized linears (which take interpret or _INTERPRET)
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE == "always":
        return True
    return jax.default_backend() not in ("cpu",)


def _int8_emulated_dot(x2d: jax.Array | ActQ, wd: jax.Array) -> jax.Array:
    """XLA emulation of the kernel's int8 MXU mode (same numerics, no
    fusion): per-column-symmetric int8 weights on top of the dequantized
    f32 values, per-row dynamic int8 activations (or pre-quantized ones
    when x2d is an ActQ), s8xs8->s32 dot, rank-1 rescale. Keeps CPU
    tests and the quality evaluators on the int8 arithmetic the TPU
    kernel runs."""
    wd = wd.astype(jnp.float32)
    cs = jnp.maximum(jnp.max(jnp.abs(wd), axis=0, keepdims=True),
                     1e-12) * (1.0 / 127.0)
    # multiply-by-reciprocal, NOT division: the kernel requantizes with
    # v * (1/cs) (qmatmul._qmm_int8), and the two round() inputs differ
    # by a couple f32 ULPs — enough to flip ties and break exact
    # kernel-vs-emulation conformance checks
    w8 = jnp.round(wd * (1.0 / cs)).astype(jnp.int8)
    if isinstance(x2d, ActQ):
        q, sx = x2d.q, x2d.s.astype(jnp.float32)
    else:
        xf = x2d.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-12) * (1.0 / 127.0)
        q = jnp.round(xf * (1.0 / sx)).astype(jnp.int8)
    acc = jnp.dot(q, w8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * cs


def _pad_dim(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


def quantized_matmul(x2d: jax.Array | ActQ, w: QuantizedTensor,
                     b: jax.Array | None = None, act: str | None = None,
                     emit: str = "no", out_dtype=None,
                     interpret: bool = False):
    """[M, K] @ quantized [K, N] (+bias, +act) -> [M, N] in x2d.dtype,
    padding M to the tile size. Bias/activation run fused in the kernel.

    x2d may be an ActQ (pre-quantized int8 activation + row scales) —
    the int8-MXU kernel then consumes it directly; the caller must have
    gated on int8_engages for the shape. emit: "no" | "both" | "only" —
    additionally return the output as an ActQ quantized in-kernel
    ("only" skips the dense output entirely; see ops/qmatmul.qmatmul)."""
    assert w.block_axis == -2
    prequant = isinstance(x2d, ActQ)
    M, K = x2d.shape
    _, N = w.shape
    i8_intent = _use_int8() or prequant
    xb = 1 if prequant else 2
    bm_cap = max(8, -(-M // 8) * 8)  # small-M friendliness
    if i8_intent and bm_cap >= 512:
        # int8 mode: take bm=512 when it costs no bn (pick_bm_int8) —
        # fewer grid steps amortize the per-step VPU rescale better
        bm = _qmm.pick_bm_int8(K, N, w.packed, x_bytes=xb)
    else:
        bm = min(256, bm_cap)
    out_dtype = out_dtype or (jnp.bfloat16 if prequant else x2d.dtype)
    interpret = interpret or _INTERPRET

    def _bm_ok(b):
        # pallas_fits at the bf16 budget (conservative: also covers the
        # ragged-lane bf16 fallback the kernel may take out of int8)
        if not _qmm.pallas_fits(K, N, b, w.packed, x_bytes=xb):
            return False
        return emit == "no" or _qmm.emit_fits(K, N, b, w.packed,
                                              int8=i8_intent, x_bytes=xb)

    kernel_ok = _use_pallas() or interpret
    if kernel_ok and not _bm_ok(bm):
        if bm > 256 and _bm_ok(min(256, bm_cap)):
            bm = min(256, bm_cap)
        else:
            kernel_ok = False
    if kernel_ok:
        # relu has no kernel epilogue (no published reglu encoder needs
        # the fusion); bias still runs fused, relu applies after
        epi = {None: None, "relu": None, "gelu": "bias_gelu",
               "gelu_tanh": "bias_gelu_tanh", "silu": "bias_silu"}[act]
        i8 = (i8_intent
              and _qmm.int8_engages(K, N, bm, w.packed, x_bytes=xb))
        if prequant and not i8:
            # shape can't run the int8 kernel: dequantize the rows back
            # (callers gate on int8_engages, so this is a safety net)
            x2d = (x2d.q.astype(jnp.float32) * x2d.s).astype(out_dtype)
            prequant = False
        xp = _pad_dim(x2d.q if prequant else x2d, 0, bm)
        sxp = _pad_dim(x2d.s, 0, bm) if prequant else None
        out = _qmm.qmatmul(xp, w.codes, w.scales, w.mins, b, kind=w.kind,
                           epilogue=epi, bm=bm, packed=w.packed,
                           int8_compute=i8, x_scale=sxp,
                           emit_quantized=emit, out_dtype=out_dtype,
                           interpret=interpret)
        if emit == "no":
            out = out[:M]
            return jnp.maximum(out, 0) if act == "relu" else out
        assert act != "relu"
        if emit == "only":
            o8, osc = out
            return ActQ(o8[:M], osc[:M])
        o, o8, osc = out
        return o[:M], ActQ(o8[:M], osc[:M])
    if _use_int8() or prequant:
        y = _int8_emulated_dot(x2d, dequantize(w))
    else:
        y = jnp.dot(x2d, dequantize(w), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if act == "silu":
        y = jax.nn.silu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act is not None:
        y = jax.nn.gelu(y, approximate=(act == "gelu_tanh"))
    if emit == "only":
        return quantize_act(y)
    if emit == "both":
        return y.astype(out_dtype), quantize_act(y)
    return y.astype(out_dtype)


def linear_residual_ln(x: jax.Array | ActQ, w, b, residual: jax.Array,
                       ln_scale: jax.Array, ln_bias: jax.Array,
                       eps: float, emit: str = "no",
                       interpret: bool = False):
    """LayerNorm(residual + x @ w + b) — the post-attention / post-FFN
    step (bert.cpp:1040-1082). On the quantized TPU path the residual-add
    and LayerNorm run inside the matmul kernel epilogue (saves one [M, N]
    HBM write+read round trip per call); elsewhere it's the composed ops.

    x: [..., K] or a pre-quantized ActQ; residual: [..., N]. Returns
    [..., N]. emit="both": additionally return the LN output as an ActQ
    quantized in-kernel — the chained int8 path feeds it straight to the
    next quantized matmul without ever re-deriving row absmaxes.
    """
    from ..models.bert import layer_norm  # late import: avoids a cycle
    prequant = isinstance(x, ActQ)
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = residual.shape[-1]
    out_dtype = jnp.bfloat16 if prequant else x.dtype
    interpret = interpret or _INTERPRET
    if (isinstance(w, QuantizedTensor) and w.block_axis == -2
            and (_use_pallas() or interpret)):
        M = 1
        for d in lead:
            M *= d
        # largest VMEM-feasible bm first: 512 measured 4% faster than 256
        # on the o-proj shape (K=N=768) at M=32K; FFN-down (K=3072) only
        # fits at 128 on the bf16 path — int8 mode (no bf16 staging
        # scratch) fits it at 256, so the int8 fit is probed first at
        # each bm before downgrading
        bms = (min(512, max(8, -(-M // 8) * 8)),
               min(256, max(8, -(-M // 8) * 8)), 128, 64)
        pick = None
        if _use_int8() or prequant:
            # pre-quantized x halves the x-tile VMEM (x_bytes=1), which
            # is what lets the K=3072 FFN-down res-LN case take bm=512
            pick = next((bm for bm in bms if bm <= M + 8 and
                         _qmm.residual_ln_fits(K, N, bm, w.packed,
                                               int8=True,
                                               x_bytes=2 - prequant)),
                        None)
        i8 = pick is not None
        if pick is None:
            pick = next((bm for bm in bms if bm <= M + 8 and
                         _qmm.residual_ln_fits(K, N, bm, w.packed)), None)
        if prequant and not i8:
            # safety net — callers gate chaining on int8_engages
            x = (x.q.astype(jnp.float32) * x.s).astype(out_dtype)
            prequant = False
        if pick is not None:
            bm = pick
            if prequant:
                xp = _pad_dim(x.q.reshape(M, K), 0, bm)
                sxp = _pad_dim(x.s.reshape(M, 1), 0, bm)
            else:
                xp = _pad_dim(x.reshape(M, K), 0, bm)
                sxp = None
            rp = _pad_dim(residual.reshape(-1, N).astype(out_dtype),
                          0, bm)
            out = _qmm.qmatmul(
                xp, w.codes, w.scales, w.mins, b, kind=w.kind,
                epilogue="bias_residual_ln", residual=rp,
                ln_scale=ln_scale, ln_bias=ln_bias, ln_eps=eps,
                bm=bm, packed=w.packed, int8_compute=i8, x_scale=sxp,
                emit_quantized=emit, out_dtype=out_dtype,
                interpret=interpret)
            if emit == "both":
                o, o8, osc = out
                return (o[:M].reshape(*lead, N),
                        _reshape_actq(ActQ(o8[:M], osc[:M]), *lead))
            assert emit == "no"
            return out[:M].reshape(*lead, N)
    y = linear(x, w, b)
    out = layer_norm(residual + y, ln_scale, ln_bias, eps)
    if emit == "both":
        return out, _reshape_actq(quantize_act(out.reshape(-1, N)), *lead)
    return out

def _reshape_actq(a: ActQ, *shape) -> ActQ:
    return ActQ(a.q.reshape(*shape, a.q.shape[-1]),
                a.s.reshape(*shape, 1))


def linear(x: jax.Array | ActQ, w, b: jax.Array | None = None,
           act: str | None = None, emit: str = "no"):
    """y = act(x @ w + b) with w either dense [K, N] or QuantizedTensor.

    x: [..., K] — or an ActQ (pre-quantized int8 rows + scales) consumed
    directly by the int8-MXU kernel. Returns [..., N] in x.dtype (f32
    accumulation on the MXU; bias added at accumulator precision).
    act: None | "gelu" | "gelu_tanh" — fused into the Pallas kernel on
    the quantized path. emit: also return the output as an ActQ
    (quantized in-kernel; "only" skips the dense output)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    if isinstance(w, QuantizedTensor):
        x2d = (_reshape_actq(x, -1) if isinstance(x, ActQ)
               else x.reshape(-1, K))
        out = quantized_matmul(x2d, w, b, act, emit=emit)
        if emit == "only":
            return _reshape_actq(out, *lead)
        if emit == "both":
            y, yq = out
            return (y.reshape(*lead, y.shape[-1]),
                    _reshape_actq(yq, *lead))
        return out.reshape(*lead, out.shape[-1])
    assert not isinstance(x, ActQ) and emit == "no"
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b  # bias added at accumulator precision
    if act == "silu":
        y = jax.nn.silu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act is not None:
        y = jax.nn.gelu(y, approximate=(act == "gelu_tanh"))
    return y.astype(x.dtype)
