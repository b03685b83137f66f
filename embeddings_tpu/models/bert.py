"""Functional BERT-family encoder forward pass (JAX, TPU-first).

Covers the same math as the reference's ``bert_forward_batch``
(/root/reference/bert.cpp:827-1147): embedding-sum + LayerNorm, N layers of
{pad-masked multi-head self-attention, residual+LN, GELU FFN, residual+LN},
masked mean pooling, L2 normalization — redesigned for XLA:

- one jitted program per (batch, seq) bucket instead of a per-call graph
  rebuild (the reference rebuilds its ggml graph every forward);
- layers run under ``lax.scan`` over stacked parameters — one compiled layer
  body regardless of depth;
- attention is batched einsum on the MXU with an additive pad mask (the
  reference materializes the same [L,L] mask at bert.cpp:957-961);
- quantized weights (Q4_0/Q4_1/Q8_0) flow through the same code path: the
  ``linear`` op dispatches to a Pallas fused dequant-matmul kernel on TPU
  (ops/qmatmul.py) — the TPU-native replacement for ggml's
  ``ggml_vec_dot_q4_0`` SIMD kernels.

Note on GELU: ggml uses the tanh approximation while HF BERT uses erf
(exact); ``config.hidden_act`` selects ("gelu" = erf = HF = default).
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..config import BertConfig
from ..ops.quant import QuantizedTensor, gather_rows
from ..ops.linear import linear

Params = dict[str, Any]


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm over the last axis, computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """RMSNorm over the last axis (no mean subtraction, no bias), f32
    accumulation — Qwen2/Llama-family decoder embedders."""
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                       + eps)
    return (y * scale).astype(x.dtype)


def _norm(config: BertConfig, x: jax.Array, ln: Params) -> jax.Array:
    """config-selected normalization (ln["bias"] is zeros for RMSNorm
    models — the translators synthesize it for stacking uniformity)."""
    if config.norm_type == "rmsnorm":
        return rms_norm(x, ln["scale"], config.layer_norm_eps)
    return layer_norm(x, ln["scale"], ln["bias"], config.layer_norm_eps)


def gelu(x: jax.Array, approximate: bool) -> jax.Array:
    return jax.nn.gelu(x, approximate=approximate)


def embed(params: Params, config: BertConfig, token_ids: jax.Array,
          type_ids: jax.Array | None = None,
          position_ids: jax.Array | None = None) -> jax.Array:
    """word + token-type + position embedding sum, then LayerNorm
    (bert.cpp:963-984). position_ids [B, L] overrides the default 0..L-1
    (token-packed rows restart positions at each segment)."""
    B, L = token_ids.shape
    emb = params["embeddings"]
    if isinstance(emb["word"], QuantizedTensor):
        x = gather_rows(emb["word"], token_ids)
    else:
        x = jnp.take(emb["word"], token_ids, axis=0)
    if type_ids is None:
        x = x + emb["token_type"][0]
    else:
        x = x + jnp.take(emb["token_type"], type_ids, axis=0)
    if "position" in emb:  # absent for rotary models (RoFormer, nomic)
        off = config.position_offset  # RoBERTa rows start at padding_idx+1
        if position_ids is None:
            x = x + emb["position"][off:off + L]
        else:
            x = x + jnp.take(emb["position"], position_ids + off
                             if off else position_ids, axis=0)
    if "ln" not in emb:  # Qwen2-family: bare token embedding, no norm
        return x
    return layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"], config.layer_norm_eps)


def _project_embeddings(params: Params, x: jax.Array) -> jax.Array:
    """ALBERT factorized embeddings: project [B, L, E_emb] -> [B, L, H]
    before the encoder (HF's embedding_hidden_mapping_in). No-op for
    models without a projection."""
    proj = params["embeddings"].get("proj")
    if proj is None:
        return x
    return linear(x, proj["w"], proj["b"])


def _scan_layers(params: Params, config: BertConfig, x: jax.Array,
                 apply_layer, aux: Params | None = None) -> jax.Array:
    """Run the encoder stack: scan over stacked per-layer params, or —
    ALBERT cross-layer sharing — scan num_hidden_layers iterations over
    the single stored layer (one compiled body either way). aux: an
    optional pytree of per-layer [NL, ...] arrays scanned alongside the
    params (ModernBERT's is_global / ln_apply flags); apply_layer then
    receives (layer, h, aux_i).

    Carry layout note (measured, do not redo): the int8 roofline shows
    ~0.5 ms of XLA layout copies around this loop (copy.15/copy.16/
    broadcast.12 at [128,256,768] — layout assignment picks {1,2,0}/
    {2,0,1} for the embedding output vs the loop carry). Carrying the
    hidden state 2-D ([B*L, E]) to force row-major agreement was tried
    and is WORSE: XLA then copies inside the body instead (copy.20/21
    ~600 us; forward 25,870 vs 25,224 us on chip)."""
    if config.shared_layers:
        assert aux is None, "per-layer aux with shared layers"
        shared = jax.tree_util.tree_map(lambda a: a[0], params["layers"])

        def body(h, _):
            return apply_layer(shared, h), None

        x, _ = lax.scan(body, x, None, length=config.num_hidden_layers)
    elif "dense" in params["layers"]:
        # MoE interleave: scan over (dense, moe) layer pairs — the two
        # phases have different param SHAPES (expert stacks), so each
        # gets its own stacked half and the pair is one scan step
        assert aux is None, "per-layer aux with MoE interleave"

        def body(h, pair):
            h = apply_layer(pair["dense"], h)
            return apply_layer(pair["moe"], h), None

        x, _ = lax.scan(body, x, params["layers"])
    elif aux is not None:
        def body(h, t):
            layer, aux_i = t
            return apply_layer(layer, h, aux_i), None

        x, _ = lax.scan(body, x, (params["layers"], aux))
    else:
        def body(h, layer):
            return apply_layer(layer, h), None

        x, _ = lax.scan(body, x, params["layers"])
    return x


def _relative_position_bucket(rel: jax.Array, num_buckets: int,
                              max_distance: int) -> jax.Array:
    """T5/MPNet bidirectional relative-position bucketing (HF
    modeling_mpnet.py relative_position_bucket): half the buckets for
    each sign; within a sign, exact buckets up to num_buckets/4, then
    log-spaced out to max_distance."""
    n = -rel
    half = num_buckets // 2
    ret = jnp.where(n < 0, half, 0)
    n = jnp.abs(n)
    max_exact = half // 2
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, half - 1)
    return ret + jnp.where(n < max_exact, n, val_if_large)


def relative_attention_bias(table: jax.Array, position_ids: jax.Array,
                            config: BertConfig) -> jax.Array:
    """MPNet relative position bias: [num_buckets, H] table ->
    additive [B, H, Lq, Lk] attention-logit bias, shared across layers
    (HF MPNetEncoder.compute_position_bias). position_ids [B, L] (or
    [1, L] for the standard 0..L-1 case — broadcasts over the batch).
    Under tensor parallelism the table arrives head-sharded, so H here
    is the local head count."""
    rel = position_ids[:, None, :] - position_ids[:, :, None]  # [B, L, L]
    bucket = _relative_position_bucket(
        rel, config.relative_attention_num_buckets,
        config.relative_attention_max_distance)
    values = jnp.take(table, bucket, axis=0)       # [B, L, L, H]
    return jnp.transpose(values, (0, 3, 1, 2)).astype(jnp.float32)


def alibi_attention_bias(slopes: jax.Array, position_ids: jax.Array
                         ) -> jax.Array:
    """Symmetric (encoder) ALiBi: additive [B, H, Lq, Lk] attention-logit
    bias ``-slope_h * |pos_i - pos_j|`` (jina-bert-v2; ops/alibi.py).
    position_ids [B, L] or [1, L] (broadcasts over the batch). Under
    tensor parallelism the slopes arrive head-sharded, so H here is the
    local head count — mirrors relative_attention_bias."""
    dist = jnp.abs(position_ids[:, None, :]
                   - position_ids[:, :, None])          # [B, L, L]
    return (-slopes.astype(jnp.float32)[None, :, None, None]
            * dist[:, None, :, :].astype(jnp.float32))


def _logit_bias(params: Params, config: BertConfig,
                position_ids: jax.Array) -> jax.Array | None:
    """The model family's additive attention-logit bias ([B|1, H, L, L]
    f32), or None: MPNet's bucketed relative-position table or
    jina-bert-v2's ALiBi penalty. Both are position-only and shared by
    every layer, so callers compute it once per forward."""
    rel = params.get("rel_bias")
    if rel is not None:
        return relative_attention_bias(rel, position_ids, config)
    slopes = params.get("alibi_slopes")
    if slopes is not None:
        return alibi_attention_bias(slopes, position_ids)
    return None


def attention_route_name(L, H, D, E, segmented, attn_window, has_bias4,
                         has_local_window, has_alibi, causal) -> str:
    """Human-readable name of the fused-attention kernel
    _fused_attn_dispatch would pick for these (static) shape/flag args —
    the single source of truth for route logging and the quality gates'
    kernel-route assertions (tests/benchmarks check the served path is
    the one the artifact claims)."""
    from ..ops import attention as attn_ops
    if has_local_window:
        return "cond(stream|windowed)"  # ModernBERT alternating layers
    if has_bias4:
        return "fused_bias"             # MPNet relative-position bias
    if segmented:
        nK = L // attn_ops.BQ
        if (L > attn_ops.BQ and L % attn_ops.BQ == 0
                and 0 < attn_window <= nK - 2):
            return "segmented_blockskip"
        return "segmented"
    if has_alibi:
        return "stream_alibi"
    if causal:
        return "stream_causal"
    if not attn_ops.whole_row_fits(L, E):
        return "stream"
    return "whole_row"


def _fused_attn_dispatch(qkv2d, lengths, segments, B, L, H, D,
                         attn_window=0, bias4=None, local_window=None,
                         alibi=None, causal=False, emit_int8=False):
    """emit_int8: ask the kernel to return the context pre-quantized
    (ActQ) for the chained int8 o-projection — honored by the whole-row
    and segmented kernels (the serving hot paths); other routes return
    the bf16 context and the caller quantizes with one XLA pass."""
    from ..ops import attention as attn_ops
    from ..ops.linear import ActQ
    E = H * D
    # trace-time (static args): fires once per compiled shape, so a gate
    # run's log records which kernel actually carried the forward
    logging.getLogger(__name__).info(
        "attention route: %s (B=%d L=%d H=%d D=%d)",
        attention_route_name(L, H, D, E, segments is not None,
                             attn_window, bias4 is not None,
                             local_window is not None, alibi is not None,
                             causal), B, L, H, D)

    def global_attn(q2d):
        if alibi is not None or causal:
            # streaming kernel's static mask modes: in-kernel ALiBi
            # (jina-bert-v2 — slopes derive from the head count, no
            # O(L^2) bias operand at any length) and causal (decoder
            # embedders)
            return attn_ops.fused_attention_stream(
                q2d, lengths, B=B, L=L, H=H, D=D, BK=attn_ops.pick_bk(L),
                alibi_slopes=alibi, causal=causal)
        if not attn_ops.whole_row_fits(L, E):
            # whole-row K/V would not fit VMEM: stream key blocks
            return attn_ops.fused_attention_stream(
                q2d, lengths, B=B, L=L, H=H, D=D, BK=attn_ops.pick_bk(L))
        i8s = attn_ops.use_int8_scores()
        if emit_int8:
            o8, osc = attn_ops.fused_attention(
                q2d, lengths, B=B, L=L, H=H, D=D, emit_quantized="only",
                int8_scores=i8s)
            return ActQ(o8, osc)
        return attn_ops.fused_attention(q2d, lengths, B=B, L=L, H=H, D=D,
                                        int8_scores=i8s)

    if local_window is not None:
        # ModernBERT alternating attention: one lax.cond per layer picks
        # the global kernel or the banded sliding-window kernel (both
        # compiled once; is_global is the scanned per-layer flag)
        g, w = local_window
        return lax.cond(
            g > 0, global_attn,
            lambda q2d: attn_ops.fused_attention_window(
                q2d, lengths, B=B, L=L, H=H, D=D, window=w),
            qkv2d)
    if bias4 is not None:
        # MPNet relative position bias folded into the fused kernel
        return attn_ops.fused_attention_bias(qkv2d, lengths, bias4,
                                             B=B, L=L, H=H, D=D)
    if segments is not None:
        nK = L // attn_ops.BQ
        if (L > attn_ops.BQ and L % attn_ops.BQ == 0
                and 0 < attn_window <= nK - 2):
            # long packed rows with a known small window: only compute
            # key blocks sharing a segment with the query block (the
            # O(L^2) cross-segment waste is what previously pinned packed
            # rows to 128 tokens). attn_window comes from the host
            # (packing.max_block_span) — it is a static shape parameter.
            # Threshold nK-2: the windowed kernel's per-block overhead
            # (~25% on v5e) needs >= 2 skipped blocks to pay off; at one
            # saved block the monolithic [L, L] tile is still faster.
            return attn_ops.fused_attention_segmented_blockskip(
                qkv2d, segments, B=B, L=L, H=H, D=D, window=attn_window)
        if emit_int8:
            o8, osc = attn_ops.fused_attention_segmented(
                qkv2d, segments, B=B, L=L, H=H, D=D,
                emit_quantized="only")
            return ActQ(o8, osc)
        return attn_ops.fused_attention_segmented(
            qkv2d, segments, B=B, L=L, H=H, D=D)
    return global_attn(qkv2d)


def _attn_kernels_ok(L: int, H: int, D: int, segments,
                     local_window, alibi, causal: bool = False) -> bool:
    """Can the requested fused-attention flavor run at this shape?"""
    from ..ops import attention as attn_ops
    if segments is not None:
        return attn_ops.supported(L, H, D)
    if local_window is not None:
        # both cond branches: banded (BK=128) + global (whole-row/stream)
        return attn_ops.stream_supported(L, H, D, attn_ops.BQ)
    if alibi is not None or causal:
        return attn_ops.stream_supported(L, H, D, attn_ops.pick_bk(L))
    if not attn_ops.whole_row_fits(L, H * D):
        return attn_ops.stream_supported(L, H, D, attn_ops.pick_bk(L))
    return attn_ops.supported(L, H, D)


def attention_context(layer: Params, config: BertConfig, x: jax.Array,
                      mask_bias: jax.Array,
                      lengths: jax.Array | None = None,
                      segments: jax.Array | None = None,
                      attn_window: int = 0,
                      bias4: jax.Array | None = None,
                      rope: tuple[jax.Array, jax.Array] | None = None,
                      local_window: tuple | None = None,
                      alibi: tuple[float, ...] | None = None,
                      causal: bool = False,
                      xq=None, emit_int8: bool = False):
    """Pad-masked multi-head self-attention, up to (not including) the
    output projection (bert.cpp:994-1036). Returns [B, L, E_local]
    context. Under shard_map tensor parallelism the q/k/v weights are
    column-sharded by head, so E_local = E / tp — the head count is
    derived from the projection width, not from config. The fused VMEM
    kernel runs when either prefix lengths or packed segment ids are
    given; otherwise the additive-mask einsum path. rope = (cos, sin)
    rotates q/k per position (ops/rotary.py) before either path — the
    rotation is per-head, so it composes with head-sharded TP."""
    from ..ops import attention as attn_ops
    from ..ops.linear import _use_pallas
    from ..ops.rotary import apply_rotary, apply_rotary_qkv
    B, L, E = x.shape
    D = config.head_dim
    a = layer["attn"]
    want_fused = (lengths is not None or segments is not None)
    if "qkv" in a:
        # fused projection (params.fuse_qkv): one matmul, x read once;
        # contiguous column slices (a strided 5-D reshape costs ~1ms here).
        # xq (pre-quantized int8 rows of x, the chained-int8 path): the
        # projection consumes it directly on the int8 MXU
        qkv = linear(xq if xq is not None else x,
                     a["qkv"]["w"], a["qkv"]["b"])  # [B, L, 3*E_local]
        El = qkv.shape[-1] // 3
        H = El // D
        if (want_fused and _use_pallas()
                and _attn_kernels_ok(L, H, D, segments, local_window,
                                     alibi, causal)):
            if rope is not None:
                qkv = apply_rotary_qkv(qkv, *rope, H=H, D=D,
                                       interleaved=config.rotary_interleaved)
            # fully fused VMEM attention: scores/probs never touch HBM
            ctx = _fused_attn_dispatch(qkv.reshape(B * L, 3 * El), lengths,
                                       segments, B, L, H, D, attn_window,
                                       bias4, local_window, alibi, causal,
                                       emit_int8=emit_int8)
            from ..ops.linear import ActQ, _reshape_actq
            if isinstance(ctx, ActQ):
                return _reshape_actq(ctx, B, L)
            return ctx.reshape(B, L, El)
        q = qkv[..., :El].reshape(B, L, H, D)
        k = qkv[..., El:2 * El].reshape(B, L, H, D)
        v = qkv[..., 2 * El:].reshape(B, L, H, D)
    else:
        q = linear(x, a["q"]["w"], a["q"]["b"])
        El = q.shape[-1]
        H = El // D
        k = linear(x, a["k"]["w"], a["k"]["b"])
        v = linear(x, a["v"]["w"], a["v"]["b"])
        if k.shape[-1] != El:
            # grouped-query attention (Qwen2 family): repeat each K/V
            # head over its group of query heads (HF repeat_kv order —
            # query head h reads kv head h // n_rep). fuse_qkv skips GQA
            # models, so this is the only projection layout.
            rep = El // k.shape[-1]
            k = jnp.repeat(k.reshape(B, L, -1, D), rep,
                           axis=2).reshape(B, L, El)
            v = jnp.repeat(v.reshape(B, L, -1, D), rep,
                           axis=2).reshape(B, L, El)
        if (want_fused and _use_pallas()
                and _attn_kernels_ok(L, H, D, segments, local_window,
                                     alibi, causal)):
            qkv = jnp.concatenate([q, k, v], axis=-1)
            if rope is not None:
                qkv = apply_rotary_qkv(
                    qkv, *rope, H=H, D=D,
                    interleaved=config.rotary_interleaved)
            ctx = _fused_attn_dispatch(qkv.reshape(B * L, 3 * El), lengths,
                                       segments, B, L, H, D, attn_window,
                                       bias4, local_window, alibi, causal,
                                       emit_int8=emit_int8)
            from ..ops.linear import ActQ, _reshape_actq
            if isinstance(ctx, ActQ):
                return _reshape_actq(ctx, B, L)
            return ctx.reshape(B, L, El)
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)
    if rope is not None:
        q = apply_rotary(q, *rope, interleaved=config.rotary_interleaved)
        k = apply_rotary(k, *rope, interleaved=config.rotary_interleaved)
    # scores: [B, H, L, L] on the MXU; accumulate in f32.
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(D)) + mask_bias  # [B,1,1,L] broadcast
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return ctx.reshape(B, L, El)


def _row_parallel_residual_ln(h, w, b, residual, ln, eps, tp_axis):
    """Megatron row-parallel linear + residual + LN: each shard holds a
    K/tp slice of the weight, partial products are summed over ICI with
    one psum, then bias/residual/LN run on the replicated result. The
    fused in-kernel residual-LN epilogue cannot be used here because the
    psum must happen between the matmul and the LayerNorm."""
    y = linear(h, w, None)
    y = lax.psum(y, tp_axis)
    y = y + b.astype(y.dtype)
    return layer_norm(residual + y, ln["scale"], ln["bias"], eps)


def encoder_layer(layer: Params, config: BertConfig, x: jax.Array,
                  mask_bias: jax.Array,
                  lengths: jax.Array | None = None,
                  tp_axis: str | None = None,
                  segments: jax.Array | None = None,
                  attn_window: int = 0,
                  bias4: jax.Array | None = None,
                  rope: tuple[jax.Array, jax.Array] | None = None,
                  alibi: tuple[float, ...] | None = None,
                  ep_axis: str | None = None,
                  xq=None, chain: bool = False):
    """One transformer encoder block (post-LN, bert.cpp:987-1084).

    Single-device: the two residual+LayerNorm steps run fused inside the
    o-proj / FFN-down matmul kernels (ops/linear.py linear_residual_ln),
    saving two [B·L, E] HBM round trips per layer. Under shard_map TP
    (tp_axis set) those two matmuls are row-parallel with an explicit
    psum each — one all-reduce per layer pair, riding ICI. Gated MLP
    (nomic-bert swiglu): h = act(gate(x)) * up(x), the activation fused
    into the gate matmul's kernel epilogue.

    chain=True (int8-MXU chained activations, gated by _int8_chain_ok):
    matmuls consume int8 activations produced exactly once per value,
    by the PRODUCING kernel's emission epilogue, along the links enabled
    in ops.linear._CHAIN_LINKS ("attn"/"ln"/"ffn" — each independently
    measurable, benchmarks/int8_chain_ablate.py). With "ln" on, xq is
    x's pre-quantized rows and the layer returns (x', xq'); otherwise
    the consumers quantize bf16 rows in-kernel (the round-3 mode) and
    the layer returns x'."""
    from ..ops.linear import linear_residual_ln
    a, m = layer["attn"], layer["mlp"]
    eps = config.layer_norm_eps
    if chain:
        from ..ops.linear import chain_link_on
        ctx = attention_context(layer, config, x, mask_bias, lengths,
                                segments, attn_window, bias4, rope,
                                alibi=alibi, xq=xq,
                                emit_int8=chain_link_on("attn"))
        # ctx is an ActQ when the attention kernel emitted it
        # pre-quantized (the bf16 context never touched HBM); on
        # non-emitting routes (bias/stream/window/einsum, or "attn"
        # link off) the o-proj kernel quantizes the bf16 rows itself —
        # in-kernel, once (bn == N for the residual-LN epilogue), which
        # beats a separate XLA quantize pass (one [M, E] HBM round trip)
        ln_emit = "both" if chain_link_on("ln") else "no"
        out = linear_residual_ln(ctx, a["o"]["w"], a["o"]["b"], x,
                                 a["ln"]["scale"], a["ln"]["bias"], eps,
                                 emit=ln_emit)
        x, xq = out if ln_emit == "both" else (out, None)
        # GELU link: the up-projection's output feeds ONLY the down
        # matmul — emitting int8-only halves that link's HBM
        # write+read, but forces the up matmul onto a bn == N (=3072)
        # tile; measured per-subset by the ablation
        ffn_in = xq if xq is not None else x
        if chain_link_on("ffn"):
            hq = _ffn_hidden(m, ffn_in, config, emit="only")
        else:
            hq = _ffn_hidden(m, ffn_in, config)
        out = linear_residual_ln(hq, m["down"]["w"], m["down"]["b"], x,
                                 m["ln"]["scale"], m["ln"]["bias"], eps,
                                 emit=ln_emit)
        return out
    ctx = attention_context(layer, config, x, mask_bias, lengths, segments,
                            attn_window, bias4, rope, alibi=alibi, xq=xq)
    if tp_axis is not None:
        x = _row_parallel_residual_ln(ctx, a["o"]["w"], a["o"]["b"], x,
                                      a["ln"], eps, tp_axis)
        if "router" in m:
            # EP rides the SAME mesh axis as Megatron TP: activations
            # are replicated here (post-psum), each shard holds
            # num_experts/tp experts, one psum combines — the same
            # collective budget as the dense row-parallel FFN
            return _moe_half(m, config, x, eps, tp_axis, "replicated")
        h = _ffn_hidden(m, x, config)
        return _row_parallel_residual_ln(h, m["down"]["w"], m["down"]["b"],
                                         x, m["ln"], eps, tp_axis)
    x = linear_residual_ln(ctx, a["o"]["w"], a["o"]["b"], x,
                           a["ln"]["scale"], a["ln"]["bias"], eps)
    if "router" in m:  # MoE FFN half (nomic-v2-moe layers)
        return _moe_half(m, config, x, eps, ep_axis)
    h = _ffn_hidden(m, x, config)  # activation fused in-kernel
    return linear_residual_ln(h, m["down"]["w"], m["down"]["b"], x,
                              m["ln"]["scale"], m["ln"]["bias"], eps)


def _int8_chain_ok(params: Params, config: BertConfig,
                   tp_axis: str | None) -> bool:
    """Trace-time gate for the chained int8 activation path: int8 mode
    on, Pallas available, vanilla post-LN encoder (fused qkv, non-gated
    dense FFN, no MoE interleave, no TP), all four matmul weights
    quantized. Per-matmul shape feasibility is NOT checked here — the
    linear ops carry safety nets that dequantize an ActQ when a shape
    can't run the int8 kernel, so an exotic shape degrades gracefully
    instead of asserting."""
    from ..ops.linear import _use_int8, _use_interpret, _use_pallas
    from ..ops.quant import QuantizedTensor
    if not (_use_int8() and (_use_pallas() or _use_interpret())):
        return False
    if tp_axis is not None:
        return False
    if config.norm_style == "pre":
        return False
    layers = params.get("layers")
    if not isinstance(layers, dict) or "dense" in layers:
        return False
    a, m = layers.get("attn", {}), layers.get("mlp", {})
    if "qkv" not in a or "gate" in m or "router" in m:
        return False
    try:
        ws = (a["qkv"]["w"], a["o"]["w"], m["up"]["w"], m["down"]["w"])
    except KeyError:
        return False
    return all(isinstance(w, QuantizedTensor) for w in ws)


def _moe_half(m: Params, config: BertConfig, x: jax.Array, eps: float,
              ep_axis: str | None, ep_tokens: str = "sharded"
              ) -> jax.Array:
    """Post-LN MoE FFN half: LN(x + moe_ffn(x)). Expert weights are
    dense (never quantized). Expert parallelism is detected by SHAPE:
    when the local expert stack already holds all num_experts experts
    (single device, or a replication fallback for non-divisible expert
    counts), no collective is emitted; a sharded stack gets the EP
    schedule over ep_axis (ops/moe.py)."""
    from ..ops.moe import moe_ffn, moe_ffn_ragged
    if m["up"]["w"].shape[0] == config.num_experts:
        ep_axis = None  # all experts local: replicated compute, no psum
    B, L, E = x.shape
    act = {"gelu_tanh": "gelu_tanh", "silu": "silu", "relu": "relu"}.get(
        config.hidden_act, "gelu")
    xt = x.reshape(B * L, E)
    if (config.moe_dispatch == "ragged"
            or (config.moe_dispatch == "auto" and ep_axis is None)):
        y = moe_ffn_ragged(xt, m, top_k=config.moe_top_k, act=act,
                           normalize_topk=config.moe_normalize_topk)
    else:
        y = moe_ffn(xt, m, top_k=config.moe_top_k, act=act,
                    normalize_topk=config.moe_normalize_topk,
                    ep_axis=ep_axis, ep_tokens=ep_tokens)
    return layer_norm(x + y.reshape(B, L, E),
                      m["ln"]["scale"], m["ln"]["bias"], eps)


def _ffn_hidden(m: Params, x, config: BertConfig,
                emit: str = "no"):
    """MLP hidden: act(up(x)) — or act(gate(x)) * up(x) for gated MLPs
    (nomic swiglu, jina/ModernBERT geglu) with the activation fused into
    the gate matmul's kernel epilogue. x may be a pre-quantized ActQ
    (chained int8 path); emit="only" returns the hidden as an ActQ
    quantized in the up-matmul's epilogue (non-gated MLPs only)."""
    act = {"gelu_tanh": "gelu_tanh", "silu": "silu", "relu": "relu"}.get(
        config.hidden_act, "gelu")
    if "gate" in m:
        assert emit == "no", "gated MLPs don't chain int8 emission"
        return (linear(x, m["gate"]["w"], m["gate"]["b"], act=act)
                * linear(x, m["up"]["w"], m["up"]["b"]))
    return linear(x, m["up"]["w"], m["up"]["b"], act=act, emit=emit)


def _prenorm_scan_args(config: BertConfig, L: int, positions: jax.Array,
                       mask_value: float):
    """Per-layer scan flags, local-theta RoPE tables, and the
    sliding-window logit bias for the pre-norm (ModernBERT) stack.

    positions: the same array the caller's global RoPE tables were built
    from — 1-D [L] (padded batches) or [B, L] (packed rows, restarting
    per segment). Returns (aux, rope_l, window_bias); rope_l is None
    when the local theta equals the global one (caller reuses rope_g),
    window_bias is None when every layer is global.
    """
    NL = config.num_hidden_layers
    n = max(1, config.global_attn_every_n_layers)
    # layer 0's attention norm is nn.Identity in ModernBERT (the
    # embedding LayerNorm immediately precedes it); Qwen2-family norms
    # every layer
    skip0 = 1 if config.first_attn_norm_identity else 0
    aux = {"is_global": (jnp.arange(NL) % n == 0).astype(jnp.float32),
           "ln_apply": (jnp.arange(NL) >= skip0).astype(jnp.float32)}
    rope_l = None
    if (config.position_embedding_type == "rotary"
            and config.local_rotary_base
            and config.local_rotary_base != config.rotary_base):
        from ..ops.rotary import rope_tables
        rope_l = rope_tables(positions, config.head_dim,
                             config.local_rotary_base)
    window_bias = None
    if config.local_attention_window > 0 and n > 1 and NL > 1:
        p = positions if positions.ndim == 2 else positions[None]
        dist = jnp.abs(p[:, None, :] - p[:, :, None])      # [B|1, L, L]
        window_bias = jnp.where(
            dist <= config.local_attention_window // 2, 0.0,
            mask_value).astype(jnp.float32)[:, None]       # [B|1,1,L,L]
    return aux, rope_l, window_bias


def encoder_layer_pre(layer: Params, config: BertConfig, x: jax.Array,
                      mask_bias: jax.Array, aux: Params,
                      rope_g: tuple[jax.Array, jax.Array],
                      rope_l: tuple[jax.Array, jax.Array],
                      window_bias: jax.Array | None,
                      lengths: jax.Array | None = None,
                      tp_axis: str | None = None,
                      window_kernel: bool = False) -> jax.Array:
    """One pre-norm encoder block (ModernBERT):
    x += Wo·attn(attn_norm(x)); x += Wo·glu(mlp_norm(x)).

    aux (per-layer scalars from the scan): is_global selects global vs
    sliding-window attention AND the matching RoPE table (global/local
    theta differ); ln_apply skips layer 0's identity attention norm.
    Attention: with window_kernel (TPU, kernel-supported shape) each
    layer runs a lax.cond between the global fused/streaming kernel and
    the banded sliding-window kernel (O(L·window) work, scores never in
    HBM); otherwise local layers fold the window into the additive mask
    and take the einsum path. Residual adds stay outside the matmuls
    (no post-LN to fuse into the kernel epilogue here); under TP the
    o/down matmuls are row-parallel with one psum each, bias added
    after the reduction."""
    a, m = layer["attn"], layer["mlp"]
    g = aux["is_global"]
    xn = _norm(config, x, a["ln"])
    xn = jnp.where(aux["ln_apply"] > 0, xn, x)
    rope = (rope_g if rope_l is rope_g else
            tuple(jnp.where(g > 0, cg, cl)
                  for cg, cl in zip(rope_g, rope_l)))
    mb = mask_bias
    local_window = None
    if window_bias is not None and window_kernel:
        local_window = (g, config.local_attention_window)
    elif window_bias is not None:
        # einsum fallback: local layers additionally mask |i-j| > w//2
        mb = mask_bias + (1.0 - g) * window_bias
        lengths = None
    ctx = attention_context(layer, config, xn, mb, lengths, rope=rope,
                            local_window=local_window,
                            causal=config.causal)

    def residual_add(h, lin, res):
        if tp_axis is not None:
            y = linear(h, lin["w"], None)
            y = lax.psum(y, tp_axis) + lin["b"].astype(jnp.float32)
            return res + y.astype(res.dtype)
        return res + linear(h, lin["w"], lin["b"])

    x = residual_add(ctx, a["o"], x)
    hn = _norm(config, x, m["ln"])
    return residual_add(_ffn_hidden(m, hn, config), m["down"], x)


def encode_tokens(params: Params, config: BertConfig, token_ids: jax.Array,
                  attention_mask: jax.Array, *, pooling: str | None = None,
                  normalize: bool | None = None,
                  mask_value: float = -1e9,
                  compute_dtype: str | None = None,
                  prefix_mask: bool = True,
                  tp_axis: str | None = None,
                  return_hidden: bool = False,
                  type_ids: jax.Array | None = None) -> jax.Array:
    """Full forward: token ids + mask -> pooled, normalized embeddings.

    token_ids:       int32 [B, L] (pad positions may hold any id; the mask
                     rules them out — the reference pads with id 101 and
                     relies on the same masking, bert.cpp:916).
    attention_mask:  [B, L], 1 for real tokens, 0 for pads.
    prefix_mask:     True (default) promises each row's mask is a prefix
                     (1s then 0s — what the engine's right-padded batches
                     produce, and the only shape the reference supports).
                     The fused attention kernel relies on this; pass False
                     for left-padded or non-contiguous masks to route
                     attention through the exact additive-mask einsum path.
    Returns [B, E] float32 embeddings (or [B, L, E] if return_hidden).
    """
    pooling = pooling or config.pooling
    normalize = config.normalize_embeddings if normalize is None else normalize
    mask = attention_mask.astype(jnp.float32)
    # Additive bias: 0 for real tokens, mask_value for pads. The reference
    # builds (pad⊗pad - 1)·1e5 (bert.cpp:957-961); keying off the key-side
    # mask alone is equivalent post-softmax for real query rows, and pad
    # query rows are dropped by pooling either way.
    mask_bias = ((1.0 - mask) * mask_value)[:, None, None, :]  # [B,1,1,L]
    if config.causal:
        # decoder embedders: fold the causal mask for the einsum path
        # (the fused path applies it in-kernel; XLA drops this term
        # when the kernel route is taken)
        pos = jnp.arange(token_ids.shape[1])
        mask_bias = mask_bias + jnp.where(
            pos[None, :] <= pos[:, None], 0.0, mask_value)[None, None]

    x = embed(params, config, token_ids, type_ids=type_ids)
    # Activation dtype: bf16 keeps every matmul on the MXU's native path
    # (LayerNorm/softmax still accumulate in f32); f32 for parity tests.
    if compute_dtype is not None:
        x = x.astype(jnp.dtype(compute_dtype))
    x = _project_embeddings(params, x)  # ALBERT factorized embeddings

    # prefix lengths for the fused-attention kernel's in-kernel mask;
    # only valid when the mask really is a prefix (see docstring)
    lengths = (jnp.sum(attention_mask.astype(jnp.int32), axis=1)
               if prefix_mask else None)

    bias4 = None
    alibi_static = None
    L = token_ids.shape[1]
    if "alibi_slopes" in params or params.get("rel_bias") is not None:
        # Family logit bias (MPNet relative-position / jina ALiBi).
        # Fast path: the fused VMEM kernel takes the bias as a
        # [nQ, H_local, Lq, L] operand — computed ONCE here
        # (batch-independent) and reused by every layer. ALiBi at long L
        # (bias operand past the kernel's VMEM cap): the slopes are
        # STATIC, so the streaming kernel computes the penalty from iota
        # in-kernel and no O(L^2) bias array ever exists. Otherwise fold
        # the bias into the additive mask ([B,1,1,L] + [1,H,L,L] ->
        # [B,H,L,L]) and take the einsum path.
        from ..ops import attention as attn_ops
        from ..ops.linear import _use_pallas
        H_cfg, D = config.num_attention_heads, config.head_dim
        if ("alibi_slopes" in params and prefix_mask and tp_axis is None
                and _use_pallas()
                and not attn_ops.bias_supported(L, H_cfg, D)
                and attn_ops.stream_supported(L, H_cfg, D,
                                              attn_ops.pick_bk(L))):
            # gated on tp_axis is None: H_cfg then equals the head count
            # attention_context derives, so its inner check agrees
            from ..ops.alibi import alibi_slopes
            alibi_static = tuple(alibi_slopes(H_cfg))
        else:
            bias = _logit_bias(params, config, jnp.arange(L)[None])
            H_local = bias.shape[1]
            if (prefix_mask and _use_pallas()
                    and attn_ops.bias_supported(L, H_local, D)):
                bias4 = attn_ops.prepare_attention_bias(bias, L)
            else:
                mask_bias = mask_bias + bias
                lengths = None

    rope = None
    if config.position_embedding_type == "rotary":
        # cos/sin computed once (position-only), shared by every layer
        from ..ops.rotary import rope_tables
        rope = rope_tables(jnp.arange(token_ids.shape[1]),
                           config.head_dim, config.rotary_base)

    if config.norm_style == "pre":
        # ModernBERT: scan per-layer flags alongside the stacked params
        aux, rope_l, window_bias = _prenorm_scan_args(
            config, L, jnp.arange(L), mask_value)
        rope_l = rope if rope_l is None else rope_l
        # banded-kernel route: each layer lax.conds between the global
        # kernel and the O(L·window) sliding-window kernel. Gated on
        # tp_axis is None so this check uses the SAME head count as
        # attention_context's inner check — if they could disagree the
        # einsum fallback would silently drop the window mask.
        from ..ops.linear import _use_pallas
        window_kernel = (window_bias is not None and lengths is not None
                         and tp_axis is None and _use_pallas()
                         and _attn_kernels_ok(
                             L, config.num_attention_heads,
                             config.head_dim, None, (1.0, 1), None))
        x = _scan_layers(params, config, x,
                         lambda layer, h, aux_i: encoder_layer_pre(
                             layer, config, h, mask_bias, aux_i,
                             rope_g=rope, rope_l=rope_l,
                             window_bias=window_bias, lengths=lengths,
                             tp_axis=tp_axis, window_kernel=window_kernel),
                         aux=aux)
    elif _int8_chain_ok(params, config, tp_axis):
        # chained int8. With the "ln" link on, the scan carry is
        # (x bf16, ActQ of x) — each layer's residual-LN kernels emit
        # the next layer's int8 input; with it off the carry is x and
        # consumers quantize in-kernel (link set: ops.linear.chain_links)
        from ..ops.linear import chain_link_on, quantize_act

        if chain_link_on("ln"):
            def _chained(layer, h):
                hx, hq = h
                return encoder_layer(layer, config, hx, mask_bias,
                                     lengths, tp_axis=None, bias4=bias4,
                                     rope=rope, alibi=alibi_static,
                                     xq=hq, chain=True)

            x, _ = _scan_layers(params, config, (x, quantize_act(x)),
                                _chained)
        else:
            x = _scan_layers(
                params, config, x,
                lambda layer, h: encoder_layer(
                    layer, config, h, mask_bias, lengths, tp_axis=None,
                    bias4=bias4, rope=rope, alibi=alibi_static,
                    chain=True))
    else:
        # lax.scan over (stacked or shared) layer params: one compiled
        # block.
        x = _scan_layers(params, config, x,
                         lambda layer, h: encoder_layer(
                             layer, config, h, mask_bias, lengths,
                             tp_axis=tp_axis, bias4=bias4, rope=rope,
                             alibi=alibi_static))

    if "final_ln" in params:  # ModernBERT/Qwen2 post-stack norm
        x = _norm(config, x, params["final_ln"])

    if return_hidden:
        return x.astype(jnp.float32)

    xf = x.astype(jnp.float32)
    if pooling == "mean":
        # Masked mean (the reference's matmul-with-1/len-weights trick,
        # bert.cpp:905-922, 1087-1089).
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.einsum("ble,bl->be", xf, mask) / denom
    elif pooling == "cls":
        pooled = xf[:, 0]
    elif pooling == "max":
        neg = jnp.where(mask[:, :, None] > 0, xf, -jnp.inf)
        pooled = jnp.max(neg, axis=1)
    elif pooling == "lasttoken":
        # decoder-based embedders: the last non-pad position (right
        # padding; the engine always right-pads)
        idx = jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
        pooled = xf[jnp.arange(xf.shape[0]), idx]
    else:
        raise ValueError(f"unknown pooling: {pooling}")

    pooled = _apply_st_dense(params, config, pooled)
    if normalize:
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        pooled = pooled / jnp.maximum(norm, 1e-12)
    return pooled


def _apply_st_dense(params: Params, config: BertConfig,
                    pooled: jax.Array) -> jax.Array:
    """SentenceTransformers Dense modules (modules.json — distiluse
    768->512, LaBSE pooler): post-pooling projections applied in module
    order, in f32 (the final projection sets output precision). No-op
    without params["st_dense"]."""
    stack = params.get("st_dense")
    if not stack:
        return pooled
    for i, act in enumerate(config.st_dense_acts):
        d = stack[str(i)]
        pooled = jnp.dot(pooled, d["w"].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        if "b" in d:
            pooled = pooled + d["b"].astype(jnp.float32)
        if act == "tanh":
            pooled = jnp.tanh(pooled)
    return pooled


def score_pairs(params: Params, config: BertConfig, token_ids: jax.Array,
                attention_mask: jax.Array,
                type_ids: jax.Array | None = None, *,
                mask_value: float = -1e9,
                compute_dtype: str | None = None,
                tp_axis: str | None = None) -> jax.Array:
    """Cross-encoder relevance scoring: (query, document) pair tokens ->
    logits [B] (single-label heads: bge-reranker, ms-marco
    cross-encoders) or [B, num_labels].

    The head rides on the CLS position of the SAME encoder forward the
    embedding path uses: BERT style applies the model pooler
    (tanh(dense(cls))) then the classifier; RoBERTa style (bge-reranker)
    applies classifier.dense (tanh) then classifier.out_proj — matching
    HF BertForSequenceClassification / RobertaClassificationHead.
    type_ids: [B, L] segment ids (0 = query span, 1 = document span) for
    BERT-family pair encoding; None for RoBERTa-family (single type).
    """
    head = params.get("cls_head")
    if head is None:
        raise ValueError("this checkpoint has no classification head "
                         "(cls_head) — not a cross-encoder/reranker")
    x = encode_tokens(params, config, token_ids, attention_mask,
                      mask_value=mask_value, compute_dtype=compute_dtype,
                      tp_axis=tp_axis, return_hidden=True,
                      type_ids=type_ids)
    cls = x[:, 0].astype(jnp.float32)
    mid = head.get("pooler") or head.get("dense")
    if mid is not None:
        cls = jnp.tanh(linear(cls, mid["w"].astype(jnp.float32),
                              mid["b"].astype(jnp.float32)))
    logits = linear(cls, head["out"]["w"].astype(jnp.float32),
                    head["out"]["b"].astype(jnp.float32))
    return logits[:, 0] if logits.shape[-1] == 1 else logits


def encode_packed(params: Params, config: BertConfig, token_ids: jax.Array,
                  seg_ids: jax.Array, position_ids: jax.Array,
                  pool_weights: jax.Array, *,
                  normalize: bool | None = None,
                  mask_value: float = -1e9,
                  compute_dtype: str | None = None,
                  tp_axis: str | None = None,
                  attn_window: int = 0) -> jax.Array:
    """Forward over token-packed rows (runtime/packing.py).

    token_ids:    int32 [B, L], several sentences back-to-back per row.
    seg_ids:      int32 [B, L], segment index per token, -1 for pads.
    position_ids: int32 [B, L], restarting at 0 per segment.
    pool_weights: f32 [B, S, L] — mean (1/len) or CLS (single 1) pooling
                  matrix per segment slot; all-zero rows for empty slots.
    Returns [B, S, E] float32: one embedding per (row, segment slot)
    (empty slots produce zero vectors before normalization, which maps
    them to themselves — callers index only real slots).
    """
    normalize = config.normalize_embeddings if normalize is None else normalize
    # within-segment attention only: the packed analogue of the pad mask
    same = (seg_ids[:, :, None] == seg_ids[:, None, :])
    valid = (seg_ids >= 0)[:, None, :]
    mask_bias = jnp.where(same & valid, 0.0, mask_value
                          ).astype(jnp.float32)[:, None]   # [B,1,L,L]
    if config.causal:
        # packed decoder rows: segments are contiguous and ascending, so
        # the row-global triangular mask IS the within-segment causal
        # mask (cross-segment pairs are already masked above)
        pos = jnp.arange(token_ids.shape[1])
        mask_bias = mask_bias + jnp.where(
            pos[None, :] <= pos[:, None], 0.0, mask_value)[None, None]

    x = embed(params, config, token_ids, position_ids=position_ids)
    if compute_dtype is not None:
        x = x.astype(jnp.dtype(compute_dtype))
    x = _project_embeddings(params, x)

    bias = _logit_bias(params, config, position_ids)
    if bias is not None:
        # MPNet/ALiBi packed rows: bias from the per-segment-restarting
        # position ids (cross-segment entries are masked out anyway);
        # einsum path — the segmented kernels have no bias operand
        mask_bias = mask_bias + bias
        seg_for_attn = None
    elif config.causal:
        seg_for_attn = None  # segmented kernels have no causal mode
    else:
        seg_for_attn = seg_ids

    rope = None
    if config.position_embedding_type == "rotary":
        # packed rows: per-token positions restart at each segment, so
        # the tables are per-row [B, L, D/2]
        from ..ops.rotary import rope_tables
        rope = rope_tables(position_ids, config.head_dim,
                           config.rotary_base)

    if config.norm_style == "pre":
        # ModernBERT packed rows: window distances from the per-segment
        # positions (cross-segment pairs are already masked); einsum
        # attention via the combined mask
        aux, rope_l, window_bias = _prenorm_scan_args(
            config, token_ids.shape[1], position_ids, mask_value)
        rope_l = rope if rope_l is None else rope_l
        x = _scan_layers(params, config, x,
                         lambda layer, h, aux_i: encoder_layer_pre(
                             layer, config, h, mask_bias, aux_i,
                             rope_g=rope, rope_l=rope_l,
                             window_bias=window_bias, tp_axis=tp_axis),
                         aux=aux)
    elif _int8_chain_ok(params, config, tp_axis):
        from ..ops.linear import chain_link_on, quantize_act

        if chain_link_on("ln"):
            def _chained(layer, h):
                hx, hq = h
                return encoder_layer(layer, config, hx, mask_bias, None,
                                     tp_axis=None, segments=seg_for_attn,
                                     attn_window=attn_window, rope=rope,
                                     xq=hq, chain=True)

            x, _ = _scan_layers(params, config, (x, quantize_act(x)),
                                _chained)
        else:
            x = _scan_layers(
                params, config, x,
                lambda layer, h: encoder_layer(
                    layer, config, h, mask_bias, None, tp_axis=None,
                    segments=seg_for_attn, attn_window=attn_window,
                    rope=rope, chain=True))
    else:
        x = _scan_layers(params, config, x,
                         lambda layer, h: encoder_layer(
                             layer, config, h, mask_bias, None,
                             tp_axis=tp_axis, segments=seg_for_attn,
                             attn_window=attn_window, rope=rope))
    if "final_ln" in params:  # ModernBERT/Qwen2 post-stack norm
        x = _norm(config, x, params["final_ln"])
    pooled = jnp.einsum("bsl,ble->bse", pool_weights, x.astype(jnp.float32))
    pooled = _apply_st_dense(params, config, pooled)
    if normalize:
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        pooled = pooled / jnp.maximum(norm, 1e-12)
    return pooled
