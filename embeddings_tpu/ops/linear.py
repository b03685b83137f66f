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

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor, dequantize
from . import qmatmul as _qmm

# Global switch: "auto" uses Pallas on TPU backends only; "never" forces the
# XLA fallback (useful for debugging); "always" forces Pallas (interpret mode
# on CPU).
_PALLAS_MODE = "auto"


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "always", "never")
    _PALLAS_MODE = mode


def _use_pallas() -> bool:
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE == "always":
        return True
    return jax.default_backend() not in ("cpu",)


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
    if _use_pallas() or interpret:
        bm = min(256, max(8, -(-M // 8) * 8))  # small-M friendliness
        xp = _pad_dim(x2d, 0, bm)
        epi = {None: None, "gelu": "bias_gelu",
               "gelu_tanh": "bias_gelu_tanh"}[act]
        out = _qmm.qmatmul(xp, w.codes, w.scales, w.mins, b, kind=w.kind,
                           epilogue=epi, bm=bm, interpret=interpret)
        return out[:M]
    y = jnp.dot(x2d, dequantize(w), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if act is not None:
        y = jax.nn.gelu(y, approximate=(act == "gelu_tanh"))
    return y.astype(x2d.dtype)


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
    if act is not None:
        y = jax.nn.gelu(y, approximate=(act == "gelu_tanh"))
    return y.astype(x.dtype)
