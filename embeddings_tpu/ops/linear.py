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

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor, dequantize
from . import qmatmul as _qmm

# Global switch: "auto" uses Pallas on TPU backends only; "never" forces the
# XLA fallback (useful for debugging); "always" forces Pallas (interpret mode
# on CPU).
_PALLAS_MODE = "auto"
# int8 MXU compute mode for quantized matmuls (s8xs8->s32 at 2x the bf16
# rate on v5e): off by default; scoped on via int8_mode(True) — the engine
# sets it from EngineConfig.int8_compute at trace time.
_INT8_MODE = False


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


def _use_pallas() -> bool:
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE == "always":
        return True
    return jax.default_backend() not in ("cpu",)


def _int8_emulated_dot(x2d: jax.Array, wd: jax.Array) -> jax.Array:
    """XLA emulation of the kernel's int8 MXU mode (same numerics, no
    fusion): per-column-symmetric int8 weights on top of the dequantized
    f32 values, per-row dynamic int8 activations, s8xs8->s32 dot, rank-1
    rescale. Keeps CPU tests and the quality evaluators on the int8
    arithmetic the TPU kernel runs."""
    wd = wd.astype(jnp.float32)
    cs = jnp.maximum(jnp.max(jnp.abs(wd), axis=0, keepdims=True),
                     1e-12) * (1.0 / 127.0)
    w8 = jnp.round(wd / cs).astype(jnp.int8)
    xf = x2d.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-12) * (1.0 / 127.0)
    q = jnp.round(xf / sx).astype(jnp.int8)
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


def quantized_matmul(x2d: jax.Array, w: QuantizedTensor,
                     b: jax.Array | None = None, act: str | None = None,
                     interpret: bool = False) -> jax.Array:
    """[M, K] @ quantized [K, N] (+bias, +act) -> [M, N] in x2d.dtype,
    padding M to the tile size. Bias/activation run fused in the kernel."""
    assert w.block_axis == -2
    M, K = x2d.shape
    _, N = w.shape
    bm = min(256, max(8, -(-M // 8) * 8))  # small-M friendliness
    if (_use_pallas() or interpret) and _qmm.pallas_fits(K, N, bm, w.packed):
        xp = _pad_dim(x2d, 0, bm)
        # relu has no kernel epilogue (no published reglu encoder needs
        # the fusion); bias still runs fused, relu applies after
        epi = {None: None, "relu": None, "gelu": "bias_gelu",
               "gelu_tanh": "bias_gelu_tanh", "silu": "bias_silu"}[act]
        i8 = _use_int8() and _qmm.pallas_fits(K, N, bm, w.packed, int8=True)
        out = _qmm.qmatmul(xp, w.codes, w.scales, w.mins, b, kind=w.kind,
                           epilogue=epi, bm=bm, packed=w.packed,
                           int8_compute=i8, interpret=interpret)
        out = out[:M]
        return jnp.maximum(out, 0) if act == "relu" else out
    if _use_int8():
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
    return y.astype(x2d.dtype)


def linear_residual_ln(x: jax.Array, w, b, residual: jax.Array,
                       ln_scale: jax.Array, ln_bias: jax.Array,
                       eps: float, interpret: bool = False) -> jax.Array:
    """LayerNorm(residual + x @ w + b) — the post-attention / post-FFN
    step (bert.cpp:1040-1082). On the quantized TPU path the residual-add
    and LayerNorm run inside the matmul kernel epilogue (saves one [M, N]
    HBM write+read round trip per call); elsewhere it's the composed ops.

    x: [..., K]; residual: [..., N]. Returns [..., N] in x.dtype.
    """
    from ..models.bert import layer_norm  # late import: avoids a cycle
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = residual.shape[-1]
    if (isinstance(w, QuantizedTensor) and w.block_axis == -2
            and (_use_pallas() or interpret)):
        x2d = x.reshape(-1, K)
        M = x2d.shape[0]
        # largest VMEM-feasible bm first: 512 measured 4% faster than 256
        # on the o-proj shape (K=N=768) at M=32K; FFN-down (K=3072) only
        # fits at 128 on the bf16 path — int8 mode (no bf16 staging
        # scratch) fits it at 256, so the int8 fit is probed first at
        # each bm before downgrading
        bms = (min(512, max(8, -(-M // 8) * 8)),
               min(256, max(8, -(-M // 8) * 8)), 128, 64)
        pick = None
        if _use_int8():
            pick = next((bm for bm in bms if bm <= M + 8 and
                         _qmm.residual_ln_fits(K, N, bm, w.packed,
                                               int8=True)), None)
        i8 = pick is not None
        if pick is None:
            pick = next((bm for bm in bms if bm <= M + 8 and
                         _qmm.residual_ln_fits(K, N, bm, w.packed)), None)
        if pick is not None:
            bm = pick
            xp = _pad_dim(x2d, 0, bm)
            rp = _pad_dim(residual.reshape(-1, N).astype(x.dtype), 0, bm)
            out = _qmm.qmatmul(
                xp, w.codes, w.scales, w.mins, b, kind=w.kind,
                epilogue="bias_residual_ln", residual=rp,
                ln_scale=ln_scale, ln_bias=ln_bias, ln_eps=eps,
                bm=bm, packed=w.packed, int8_compute=i8,
                interpret=interpret)
            return out[:M].reshape(*lead, N).astype(x.dtype)
    y = linear(x, w, b)
    return layer_norm(residual + y, ln_scale, ln_bias, eps)


def linear(x: jax.Array, w, b: jax.Array | None = None,
           act: str | None = None) -> jax.Array:
    """y = act(x @ w + b) with w either dense [K, N] or QuantizedTensor.

    x: [..., K]. Returns [..., N] in x.dtype (f32 accumulation on the MXU;
    bias added at accumulator precision). act: None | "gelu" | "gelu_tanh"
    — fused into the Pallas kernel on the quantized path.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    if isinstance(w, QuantizedTensor):
        x2d = x.reshape(-1, K)
        y = quantized_matmul(x2d, w, b, act)
        return y.reshape(*lead, y.shape[-1]).astype(x.dtype)
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
