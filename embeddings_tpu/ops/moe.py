"""Mixture-of-experts FFN for encoder embedders (nomic-embed-text-v2-moe).

The reference engine is dense-only (bert.cpp has no expert tensors);
this implements the MoE feed-forward used by the nomic-bert-moe GGUF
architecture (llama.cpp's LLM_ARCH_NOMIC_BERT_MOE; HF
nomic-ai/nomic-embed-text-v2-moe):

  router logits = x @ Wr            -> softmax over all experts
  top-k expert probabilities       (k = moe_top_k, no renormalization
                                     unless moe_normalize_topk)
  y = sum_e  p_e * down_e(act(up_e(x)))   [+ shared output bias]

TPU-first design, two deliberate choices:

* **Dense-expert evaluation.** Every expert runs on every token; the
  top-k router weights (zero for unselected experts) mask the combine.
  For the published shapes (8 experts, top-2) this costs 4x the
  selected-expert FLOPs but keeps every matmul a large static-shape
  MXU op — no gather/scatter, no capacity dropping, bit-exact routing.
  Sparse dispatch (sort + capacity buffers) only wins when
  n_experts >> k; at 8 experts the MXU utilization of [T, D] @ [D, I]
  per expert dominates.
* **Expert parallelism = shard the expert axis.** Under shard_map each
  device holds n_experts/ep experts and DOES proportionally less work
  (the 4x disappears across the mesh): tokens are all-gathered over the
  expert axis, each device computes its local experts' weighted
  contributions for the whole group, and a psum_scatter returns each
  token's combined output to its owner shard — the classic
  all-gather + reduce-scatter EP schedule, riding ICI.

Experts run in a lax.scan over the (local) expert axis so peak memory
stays one [T, I] activation regardless of expert count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .linear import linear

Params = dict


def route_topk(x: jax.Array, router_w: jax.Array,
               router_b: jax.Array | None, *, top_k: int,
               normalize: bool = False) -> jax.Array:
    """Per-token expert weights [T, E]: softmax over ALL experts, then
    keep the top-k probabilities (zeros elsewhere).

    Softmax-before-top-k without renormalization is the nomic-v2-moe
    convention (NomicRouter: logits.softmax(-1).topk(k), megablocks
    default moe_normalize_expert_weights=None); ``normalize=True``
    rescales the kept weights to sum to 1 for checkpoints that set it.
    """
    probs = _route_probs(x, router_w, router_b)
    kth = lax.top_k(probs, top_k)[0][..., -1:]
    weights = jnp.where(probs >= kth, probs, 0.0)
    if normalize:
        weights = weights / jnp.maximum(
            weights.sum(-1, keepdims=True), 1e-9)
    return weights


def _route_probs(x, router_w, router_b):
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    if router_b is not None:
        logits = logits + router_b.astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def moe_ffn(x: jax.Array, moe: Params, *, top_k: int, act: str,
            normalize_topk: bool = False,
            ep_axis: str | None = None,
            ep_tokens: str = "sharded") -> jax.Array:
    """MoE feed-forward on 2-D tokens x [T, D] -> [T, D].

    moe params: router {w [D, E], b [E]?}, up {w [E, D, I], b [E, I]},
    down {w [E, I, D], b [E, D]}, optional shared output bias [D]
    ("bias", HF NomicExperts.bias — added once, after the combine).

    With ep_axis set (inside shard_map), up/down carry only this
    shard's experts on their leading axis; the router weight is
    replicated and full-width. Two token layouts:

    * ep_tokens="sharded": x holds this shard's tokens. Tokens are
      all-gathered over ep_axis and the combined output psum_scattered
      back (the classic all-gather + reduce-scatter EP schedule).
    * ep_tokens="replicated": x already holds ALL tokens on every shard
      (the Megatron-TP activation layout — bert.encoder_layer composes
      EP with TP over the same model axis this way). Each shard
      computes its local experts' contributions and one psum combines
      them, mirroring the dense row-parallel FFN's single collective.

    Either way the result matches the single-device evaluation up to
    f32 reduction order.
    """
    if ep_axis is not None and ep_tokens == "sharded":
        r = lax.axis_index(ep_axis)
        x_all = lax.all_gather(x, ep_axis, axis=0, tiled=True)
    elif ep_axis is not None:
        r = lax.axis_index(ep_axis)
        x_all = x
    else:
        r = 0
        x_all = x
    weights = route_topk(x_all, moe["router"]["w"],
                         moe["router"].get("b"), top_k=top_k,
                         normalize=normalize_topk)            # [T, E]
    e_local = moe["up"]["w"].shape[0]
    w_local = lax.dynamic_slice_in_dim(weights, r * e_local, e_local,
                                       axis=1)                # [T, e]

    def one_expert(acc, e):
        up_w, up_b, down_w, down_b, we = e
        h = linear(x_all, up_w, up_b, act=act)
        y = linear(h, down_w, down_b)
        return acc + we[:, None] * y.astype(jnp.float32), None

    zero = jnp.zeros((x_all.shape[0], moe["down"]["w"].shape[-1]),
                     jnp.float32)
    out, _ = lax.scan(one_expert, zero,
                      (moe["up"]["w"], moe["up"]["b"],
                       moe["down"]["w"], moe["down"]["b"],
                       jnp.moveaxis(w_local, 1, 0)))
    if ep_axis is not None and ep_tokens == "sharded":
        out = lax.psum_scatter(out, ep_axis, scatter_dimension=0,
                               tiled=True)
    elif ep_axis is not None:
        out = lax.psum(out, ep_axis)
    if "bias" in moe:
        out = out + moe["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def moe_ffn_ragged(x: jax.Array, moe: Params, *, top_k: int, act: str,
                   normalize_topk: bool = False) -> jax.Array:
    """Sparse-dispatch MoE FFN on [T, D] tokens: grouped matmuls via
    lax.ragged_dot — only the SELECTED experts' FLOPs are computed
    (k/E of the dense-evaluation cost; top-2 of 8 experts = 4x fewer
    matmul FLOPs than moe_ffn).

    The TPU shape discipline holds throughout: every array is static
    [T*k, ...]; routing variability lives in ragged_dot's group_sizes
    operand (XLA's native grouped-matmul, the MaxText/Mosaic MoE
    primitive) and in gather/segment-sum indices.

      1. top-k (weight, expert) per token            [T, k]
      2. stable-sort the T*k (token, expert) pairs by expert
      3. gather tokens -> ragged_dot(up) -> act -> ragged_dot(down)
      4. weight rows and segment-sum back to tokens  [T, D]

    Single-device / replicated-experts only (the EP schedules live in
    moe_ffn; bert._moe_half picks the path). Numerics match moe_ffn up
    to f32 summation order.
    """
    T, D = x.shape
    # jnp-coerce once: raw-numpy params indexed by traced gather indices
    # (up_b[es] under lax.map / jit) would hit TracerArrayConversionError
    moe = jax.tree_util.tree_map(jnp.asarray, moe)
    E = moe["router"]["w"].shape[-1]
    probs = _route_probs(x, moe["router"]["w"], moe["router"].get("b"))
    top_w, top_e = lax.top_k(probs, top_k)              # [T, k]
    if normalize_topk:
        top_w = top_w / jnp.maximum(top_w.sum(-1, keepdims=True), 1e-9)

    flat_e = top_e.reshape(-1)                          # [T*k]
    flat_w = top_w.reshape(-1)
    flat_t = jnp.repeat(jnp.arange(T), top_k)
    order = jnp.argsort(flat_e, stable=True)            # group by expert
    e_sorted = flat_e[order]
    t_sorted = flat_t[order]

    xs = x[t_sorted]                                    # [T*k, D]
    y = _ragged_mlp(xs, e_sorted, moe, act, x.dtype)
    y = y.astype(jnp.float32) + moe["down"]["b"].astype(jnp.float32)[
        e_sorted]
    y = y * flat_w[order][:, None]
    out = jax.ops.segment_sum(y, t_sorted, num_segments=T)
    if "bias" in moe:
        out = out + moe["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


# Max rows per ragged_dot call: Mosaic's ragged-dot tiling heuristic
# scales the row tile with the operand and blows the v5e scoped-VMEM
# budget past ~64k rows (tile 4096x768 lhs + 4096x512 out, double-
# buffered > 16 MB). Chunking keeps every call inside the envelope; the
# rows stay globally expert-sorted, so per-chunk group_sizes are just
# the chunk's expert histogram.
_RAGGED_CHUNK_ROWS = 16384


def _ragged_mlp(xs: jax.Array, e_sorted: jax.Array, moe: Params,
                act: str, dtype) -> jax.Array:
    """act(ragged_dot(xs, up) + up_b[e]) -> ragged_dot(., down) over
    expert-sorted rows, chunked to _RAGGED_CHUNK_ROWS per call."""
    E = moe["router"]["w"].shape[-1]
    up_w = moe["up"]["w"].astype(dtype)
    up_b = moe["up"]["b"]
    down_w = moe["down"]["w"].astype(dtype)

    def run(rows, es):
        gs = jnp.bincount(es, length=E).astype(jnp.int32)
        h = lax.ragged_dot(rows, up_w, gs)
        h = h + up_b.astype(h.dtype)[es]
        if act == "silu":
            h = jax.nn.silu(h)
        elif act == "relu":
            h = jax.nn.relu(h)
        else:
            h = jax.nn.gelu(h, approximate=(act == "gelu_tanh"))
        return lax.ragged_dot(h, down_w, gs)

    rows = xs.shape[0]
    if rows <= _RAGGED_CHUNK_ROWS:
        return run(xs, e_sorted)
    R = _RAGGED_CHUNK_ROWS
    C = -(-rows // R)
    pad = C * R - rows
    # pad rows to a whole number of chunks; padding experts are E-1 so
    # the (globally sorted) order survives the split
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    es_p = jnp.pad(e_sorted, (0, pad), constant_values=E - 1)
    y = lax.map(lambda t: run(*t),
                (xs_p.reshape(C, R, -1), es_p.reshape(C, R)))
    return y.reshape(C * R, -1)[:rows]
