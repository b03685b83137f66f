"""Rotary position embeddings (RoPE) for rotary BERT-family encoders.

The reference supports absolute learned positions only
(/root/reference/bert.cpp:963-984); rotary models (RoFormer,
nomic-bert-2048 behind nomic-embed-text) encode position by rotating
each head's query/key vectors pairwise by position-dependent angles, so
there is no position table at all and the context length is set by the
attention kernel, not an embedding matrix — which is what makes the
>512-token path (ops/attention.py blocked-query grids) reachable.

Two pairing conventions exist in the wild and produce different numbers
with the same weights:

- interleaved (RoFormer, GPT-J): pairs are (x0, x1), (x2, x3), ...
- half-split (GPT-NeoX, flash-attn's default, nomic-bert): pairs are
  (x0, x_{D/2}), (x1, x_{D/2+1}), ...

Both are pure elementwise transforms applied to q and k after the QKV
projection; XLA fuses them into the surrounding program, so no Pallas
kernel is needed (the attention kernel itself is position-agnostic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_tables(positions: jax.Array, dim: int,
                base: float = 10000.0) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for rotary dimension ``dim`` (a head's D).

    positions: int32 [...] (typically [L] or [B, L] for packed rows with
    per-segment restarts). Returns (cos, sin), each f32
    [..., dim // 2] — frequency j rotates pair j by
    pos * base^(-2j/dim), matching RoFormer/GPT-NeoX semantics.
    """
    half = dim // 2
    inv_freq = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array,
                 interleaved: bool = False) -> jax.Array:
    """Rotate [..., L, H, D] by per-position angles.

    cos/sin carry no head axis — [L, D/2] (shared positions) or
    [B, L, D/2] (per-row positions, token-packed batches); one is
    inserted here so they broadcast over heads.
    """
    cos = cos[..., None, :]   # broadcast over the head axis
    sin = sin[..., None, :]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        # re-interleave: stack pairs back on a trailing axis
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1 = xf[..., :half]
        x2 = xf[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin,
                               x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


def apply_rotary_qkv(qkv: jax.Array, cos: jax.Array, sin: jax.Array,
                     H: int, D: int, interleaved: bool = False) -> jax.Array:
    """Rotate the q and k thirds of a fused [B, L, 3*H*D] projection
    (v passes through), preserving the [q | k | v] column layout the
    fused attention kernel expects."""
    B, L, _ = qkv.shape
    E = H * D
    q = apply_rotary(qkv[..., :E].reshape(B, L, H, D), cos, sin,
                     interleaved).reshape(B, L, E)
    k = apply_rotary(qkv[..., E:2 * E].reshape(B, L, H, D), cos, sin,
                     interleaved).reshape(B, L, E)
    return jnp.concatenate([q, k, qkv[..., 2 * E:]], axis=-1)
