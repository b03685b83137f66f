"""Sequence/context parallelism (CP): shard the sequence axis over a
"seq" mesh axis.

The reference is single-process with a hard 512-token cap
(bert.cpp:867-871) — SURVEY §2 scopes ring/Ulysses CP out for parity but
asks that attention be written so a CP axis can be added later. This is
that axis: activations are sharded [B, L/sp, E] per chip, each layer
all-gathers K/V over ICI and computes attention for its local query
chunk (the standard all-gather CP for encoders — at encoder lengths the
K/V gather is a few MB and one hop, so a ring schedule would only add
latency), and pooling finishes with one psum. Embeddings use
global positions via axis_index.

Composability: the CP forward keeps weights replicated (BERT-family
weights are <=0.4 GB even dense — TP exists for ICI bandwidth, not
capacity); combine dp x sp via make_mesh_cp. CP x TP composition is
deliberately OUT OF SCOPE: at encoder scale the weight per chip never
needs TP's capacity split, and head-sharding the gathered K/V would
re-introduce the all-to-all Ulysses traffic this design avoids — use
dp x tp OR dp x sp, not all three. Collectives: one all-gather per
layer ([B, Lc, 2E] -> [B, L, 2E]) + one psum at pooling, all riding
ICI.

Attention per shard runs the fused VMEM kernel
(ops/attention.fused_attention_cp: local [Lc, L] score tiles, prefix
lengths) when shapes allow; the einsum fallback otherwise.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import BertConfig
from ..models import bert
from ..ops.linear import linear, linear_residual_ln
from .mesh import DATA_AXIS

SEQ_AXIS = "seq"

Params = dict[str, Any]


def make_mesh_cp(dp: int | None = None, sp: int = 1,
                 devices: list | None = None) -> Mesh:
    """A ("data", "seq") mesh for DP x CP serving."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp({dp}) x sp({sp}) != device count {n}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def _cp_attention(layer: Params, config: BertConfig, x: jax.Array,
                  mask_bias: jax.Array,
                  lengths: jax.Array | None = None,
                  rope: tuple[jax.Array, jax.Array] | None = None
                  ) -> jax.Array:
    """Local-query attention: q from the local [B, Lc, E] chunk, k/v
    all-gathered to the full sequence. Returns local context [B, Lc, E].

    With prefix lengths and a supported shape, the fused VMEM kernel
    (ops/attention.fused_attention_cp) computes the [Lc, L] score tile
    on-chip; the einsum fallback materializes [B, H, Lc, L] in HBM
    (kept for CPU tests / tiny shapes). rope = local-position (cos, sin):
    rotation is per-position, so rotating the local q/k chunk BEFORE the
    k/v gather yields globally-correct rotary attention.
    """
    from ..ops import attention as attn_ops
    from ..ops.linear import _use_pallas
    from ..ops.rotary import apply_rotary
    B, Lc, E = x.shape
    D = config.head_dim
    a = layer["attn"]
    if "qkv" in a:
        qkv = linear(x, a["qkv"]["w"], a["qkv"]["b"])   # [B, Lc, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(x, a["q"]["w"], a["q"]["b"])
        k = linear(x, a["k"]["w"], a["k"]["b"])
        v = linear(x, a["v"]["w"], a["v"]["b"])
    H = q.shape[-1] // D
    if rope is not None:
        q = apply_rotary(q.reshape(B, Lc, H, D), *rope,
                         interleaved=config.rotary_interleaved
                         ).reshape(B, Lc, H * D)
        k = apply_rotary(k.reshape(B, Lc, H, D), *rope,
                         interleaved=config.rotary_interleaved
                         ).reshape(B, Lc, H * D)
    # one gather for k and v together: [B, L, 2E] over ICI
    kv = lax.all_gather(jnp.concatenate([k, v], axis=-1), SEQ_AXIS,
                        axis=1, tiled=True)
    L = kv.shape[1]
    if lengths is not None and _use_pallas():
        if (attn_ops.whole_row_fits(L, H * D)
                and attn_ops.supported(L, H, D) and Lc % 8 == 0):
            ctx = attn_ops.fused_attention_cp(
                q.reshape(B * Lc, H * D), kv.reshape(B * L, 2 * H * D),
                lengths, B=B, Lc=Lc, L=L, H=H, D=D)
            return ctx.reshape(B, Lc, H * D)
        bk = attn_ops.pick_bk(L)
        if (attn_ops.stream_supported(L, H, D, bk)
                and Lc % attn_ops.BQ == 0):
            # past the whole-row VMEM ceiling: stream gathered K/V
            # blocks (CP's raison d'etre is long L)
            ctx = attn_ops.fused_attention_cp_stream(
                q.reshape(B * Lc, H * D), kv.reshape(B * L, 2 * H * D),
                lengths, B=B, Lc=Lc, L=L, H=H, D=D, BK=bk)
            return ctx.reshape(B, Lc, H * D)
    k_full, v_full = jnp.split(kv, 2, axis=-1)
    qh = q.reshape(B, Lc, H, D)
    kh = k_full.reshape(B, L, H, D)
    vh = v_full.reshape(B, L, H, D)
    scores = jnp.einsum("blhd,bmhd->bhlm", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(D)) + mask_bias   # [B,1,1,L] bcast
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhlm,bmhd->blhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return ctx.reshape(B, Lc, H * D)


def _cp_layer(layer: Params, config: BertConfig, x: jax.Array,
              mask_bias: jax.Array,
              lengths: jax.Array | None = None,
              rope: tuple[jax.Array, jax.Array] | None = None) -> jax.Array:
    """One encoder block with CP attention; everything after the
    attention context is local along L (bert.encoder_layer numerics)."""
    a, m = layer["attn"], layer["mlp"]
    eps = config.layer_norm_eps
    ctx = _cp_attention(layer, config, x, mask_bias, lengths, rope)
    act = {"gelu_tanh": "gelu_tanh", "silu": "silu"}.get(
        config.hidden_act, "gelu")
    x = linear_residual_ln(ctx, a["o"]["w"], a["o"]["b"], x,
                           a["ln"]["scale"], a["ln"]["bias"], eps)
    if "gate" in m:   # gated MLP (nomic-bert): local along L
        h = (linear(x, m["gate"]["w"], m["gate"]["b"], act=act)
             * linear(x, m["up"]["w"], m["up"]["b"]))
    else:
        h = linear(x, m["up"]["w"], m["up"]["b"], act=act)
    return linear_residual_ln(h, m["down"]["w"], m["down"]["b"], x,
                              m["ln"]["scale"], m["ln"]["bias"], eps)


def make_cp_forward(config: BertConfig, mesh: Mesh, *,
                    pooling: str | None = None,
                    compute_dtype: str | None = None,
                    mask_value: float = -1e9):
    """jitted (params, ids [B, L], mask [B, L]) -> [B, E] with B sharded
    over "data" and L over "seq". B must divide the data-axis size and L
    the seq-axis size. Weights are replicated."""
    import inspect
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    _params = inspect.signature(shard_map).parameters
    _nocheck = ({"check_vma": False} if "check_vma" in _params
                else {"check_rep": False})
    pool = pooling or config.pooling
    if (config.relative_attention_num_buckets
            or config.position_embedding_type == "alibi"):
        # the [H, Lc, L] bias would need per-shard global positions in
        # both kernel and einsum paths — not wired; refuse rather than
        # silently dropping the bias (MPNet/jina-v2 without it is a
        # different model)
        raise ValueError("context parallelism does not support "
                         "attention-logit-bias models (MPNet relative "
                         "bias, jina-bert-v2 ALiBi); use dp/tp instead")
    if config.norm_style != "post" or config.causal:
        # the CP layer body is the post-LN BERT block; running a
        # pre-norm (ModernBERT/Qwen2) or causal model through it would
        # silently compute a different network — refuse instead
        raise ValueError("context parallelism supports post-LN "
                         "bidirectional encoders only (ModernBERT/"
                         "Qwen2-family models: use dp/tp instead)")

    def local_fwd(p, ids, mask):
        B, Lc = ids.shape
        idx = lax.axis_index(SEQ_AXIS)
        pos = (idx * Lc + jnp.arange(Lc, dtype=jnp.int32))[None, :]
        x = bert.embed(p, config, ids,
                       position_ids=jnp.broadcast_to(pos, (B, Lc)))
        if compute_dtype is not None:
            x = x.astype(jnp.dtype(compute_dtype))
        x = bert._project_embeddings(p, x)  # ALBERT factorized embeddings
        rope = None
        if config.position_embedding_type == "rotary":
            # local-position tables: rotation precedes the k/v gather
            from ..ops.rotary import rope_tables
            rope = rope_tables(pos[0], config.head_dim, config.rotary_base)
        mask_full = lax.all_gather(mask, SEQ_AXIS, axis=1, tiled=True)
        bias = ((1.0 - mask_full.astype(jnp.float32))
                * mask_value)[:, None, None, :]          # [B, 1, 1, L]
        # the engine produces prefix masks only — the fused CP kernel
        # takes the per-sequence lengths directly
        lengths = jnp.sum(mask_full, axis=1).astype(jnp.int32)

        x = bert._scan_layers(
            p, config, x,
            lambda layer, h: _cp_layer(layer, config, h, bias, lengths,
                                       rope))
        xf = x.astype(jnp.float32)
        maskf = mask.astype(jnp.float32)
        if pool == "mean":
            s = lax.psum(jnp.einsum("ble,bl->be", xf, maskf), SEQ_AXIS)
            denom = lax.psum(jnp.sum(maskf, axis=1, keepdims=True),
                             SEQ_AXIS)
            pooled = s / jnp.maximum(denom, 1.0)
        elif pool == "cls":
            # the CLS token lives on the first seq shard
            pooled = lax.psum(
                jnp.where(idx == 0, xf[:, 0], jnp.zeros_like(xf[:, 0])),
                SEQ_AXIS)
        elif pool == "max":
            neg = jnp.float32(-1e30)
            local = jnp.max(jnp.where(maskf[..., None] > 0, xf, neg),
                            axis=1)
            pooled = lax.pmax(local, SEQ_AXIS)
        else:
            raise ValueError(f"unknown pooling {pool!r}")
        if config.normalize_embeddings:
            norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            pooled = pooled / jnp.maximum(norm, 1e-12)
        return pooled

    sharded = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, SEQ_AXIS)),
        out_specs=P(DATA_AXIS, None),
        **_nocheck)
    return jax.jit(sharded)
