"""Fused multi-head attention kernel (Pallas TPU).

The XLA einsum path materializes scores and probabilities
([B, H, L, L] f32 ≈ 400 MB at bench shapes) in HBM. This kernel computes
softmax(q kᵀ/√d + mask) v entirely in VMEM — the TPU-idiomatic analogue of
the reference materializing its [L, L, H·B] mask+scores in the ggml arena
(bert.cpp:957-1025). For encoder lengths (≤512) a full [L, L] score tile
fits VMEM, so no online-softmax streaming is needed; the kernel is written
per (batch, head-group) so it extends to a blockwise/flash variant for
longer L later.

Layout trick: the kernel reads the *fused qkv projection output* [M, 3E]
directly — three BlockSpecs with different column index maps slice q, k, v
per head group with zero relayout (a [B,L,H,D] -> [B,H,L,D] transpose
would cost ~300 MB of HBM traffic per layer). Heads are processed in
groups of 128/D lanes to satisfy the TPU lane-tiling constraint.

Padding: instead of an additive bias tensor, per-sequence lengths arrive
as a scalar-prefetch operand and the mask is built in-kernel from iota —
pad keys get -1e9 before softmax (same numerics as the einsum path for
prefix masks, which is the only mask shape the engine produces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _attn_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
                 L: int, D: int, hps: int, scale: float, mask_value: float):
    b = pl.program_id(0)
    n = lengths_ref[b]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) < n
    bias = jnp.where(key_ok, 0.0, mask_value).astype(jnp.float32)
    for i in range(hps):
        sl = slice(i * D, (i + 1) * D)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        v = v_ref[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, sl] = jax.lax.dot(
            p.astype(q.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def supported(L: int, H: int, D: int) -> bool:
    if D > LANE or LANE % D != 0:
        return False
    hps = LANE // D
    return H % hps == 0 and L % 8 == 0


@functools.partial(jax.jit, static_argnames=("B", "L", "H", "D",
                                             "mask_value", "interpret"))
def fused_attention(qkv: jax.Array, lengths: jax.Array, *, B: int, L: int,
                    H: int, D: int, mask_value: float = -1e9,
                    interpret: bool = False) -> jax.Array:
    """qkv [B*L, 3*H*D] (column layout [q | k | v], heads contiguous),
    lengths [B] int32 -> context [B*L, H*D] (pre-output-projection)."""
    E = H * D
    M = B * L
    assert qkv.shape == (M, 3 * E), (qkv.shape, (M, 3 * E))
    assert supported(L, H, D), (L, H, D)
    hps = LANE // D          # heads per grid step
    G = H // hps             # head groups
    bw = hps * D             # block width (== 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((L, bw), lambda b, g, *_: (b, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bw), lambda b, g, *_: (b, G + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bw), lambda b, g, *_: (b, 2 * G + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, bw), lambda b, g, *_: (b, g),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_attn_kernel, L=L, D=D, hps=hps,
                               scale=1.0 / (D ** 0.5), mask_value=mask_value)
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
            bytes_accessed=M * 3 * E * qkv.dtype.itemsize
            + M * E * qkv.dtype.itemsize,
            transcendentals=B * H * L * L),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv)
