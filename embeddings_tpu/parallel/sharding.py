"""GSPMD parameter/activation shardings for the BERT encoder.

Megatron-style tensor parallelism expressed purely as NamedShardings — XLA
inserts the collectives:

- QKV and FFN-up weights are column-parallel (output features over
  MODEL_AXIS): each chip computes its head/intermediate slice locally.
- attention-out and FFN-down weights are row-parallel (input features over
  MODEL_AXIS): XLA emits one psum (ICI all-reduce) per layer pair.
- embeddings/LayerNorm/biases-of-row-parallel are replicated.
- activations are sharded batch-first over DATA_AXIS.

Quantized weights shard the same way: codes/scales/mins are all sliced
along the same logical axis (the per-32 block axis divides cleanly because
tp | K/32 for every supported model).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BertConfig
from ..models import bert
from ..ops.quant import QuantizedTensor
from .mesh import DATA_AXIS, MODEL_AXIS

Params = dict[str, Any]


def _divisible(shape: tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * len(shape)):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def param_pspecs(params: Params, mesh: Mesh) -> Params:
    """A pytree of PartitionSpec congruent with `params` (QuantizedTensor
    leaves expanded in flatten order: codes, scales, mins). Scale/min
    arrays whose per-32-block axis is smaller than the TP degree fall back
    to replication (they are 1/32 the bytes of the codes)."""
    col = P(None, None, MODEL_AXIS)   # [NL, K, N] column-parallel
    row = P(None, MODEL_AXIS, None)   # [NL, K, N] row-parallel
    rep1 = P(None, None)              # [NL, E] replicated bias/LN

    def fit(x, spec: P) -> P:
        return spec if _divisible(x.shape, spec, mesh) else P()

    def for_linear(v: dict, w_spec: P, b_spec: P):
        """Specs for one linear's weight+bias. All-or-nothing: if any
        piece of a QuantizedTensor (codes, scales, mins) cannot shard —
        e.g. the per-32-block scales axis is smaller than the TP degree —
        the WHOLE tensor (and its bias, when the bias shards the same
        axis) falls back to replication. Mixed shardings would desync the
        codes from their block scales, which is fatal under shard_map
        (per-shard dequant sees mismatched shapes)."""
        w, b = v["w"], v["b"]
        if isinstance(w, QuantizedTensor):
            pieces = [w.codes, w.scales] + ([] if w.mins is None else [w.mins])
            ok = all(_divisible(x.shape, w_spec, mesh) for x in pieces)
            if ok and w.packed:
                # group-64 nibble layout: a shard of the packed-row axis
                # (-2 of codes) must hold whole 32-packed-row groups or
                # per-shard dequant breaks
                spec_t = tuple(w_spec) + (None,) * len(w.codes.shape)
                pos = len(w.codes.shape) - 2
                axis = spec_t[pos]
                if axis is not None:
                    ok = (w.codes.shape[pos] // mesh.shape[axis]) % 32 == 0
            wspec = (QuantizedTensor(w_spec, w_spec,
                                     None if w.mins is None else w_spec,
                                     w.kind, w.block_axis, w.packed) if ok
                     else QuantizedTensor(P(), P(),
                                          None if w.mins is None else P(),
                                          w.kind, w.block_axis, w.packed))
        else:
            ok = _divisible(w.shape, w_spec, mesh)
            wspec = w_spec if ok else P()
        # a sharded bias only makes sense next to a sharded weight
        bspec = fit(b, b_spec) if ok else P()
        return {"w": wspec, "b": bspec}

    # Embedding tables are replicated: they are small once quantized
    # (~12 MB for bge-base q4_0), the gather result must be fully
    # replicated on E before the embedding LayerNorm anyway, and their
    # scale arrays [V, E/32] often have fewer blocks than TP degree.
    emb_word = params["embeddings"]["word"]
    rep2 = P(None, None)
    if isinstance(emb_word, QuantizedTensor):
        word_spec = QuantizedTensor(rep2, rep2,
                                    None if emb_word.mins is None else rep2,
                                    emb_word.kind, emb_word.block_axis,
                                    emb_word.packed)
    else:
        word_spec = rep2

    ln2 = {"scale": rep1, "bias": rep1}
    emb_specs: Params = {
        "word": word_spec,
        "token_type": rep2,
    }
    if "ln" in params["embeddings"]:  # absent for Qwen2-family decoders
        emb_specs["ln"] = {"scale": P(None), "bias": P(None)}
    if "position" in params["embeddings"]:  # absent for rotary models
        emb_specs["position"] = rep2
    if "proj" in params["embeddings"]:
        # ALBERT factorized-embedding projection: small, replicated
        emb_specs["proj"] = {"w": rep2, "b": P(None)}
    def stack_specs(lyr: Params) -> Params:
        """Specs for one {attn, mlp} layer stack (the whole model, or
        one half of the MoE (dense, moe) interleave)."""
        s = {
            "attn": {
                "q": for_linear(lyr["attn"]["q"], col, P(None, MODEL_AXIS)),
                "k": for_linear(lyr["attn"]["k"], col, P(None, MODEL_AXIS)),
                "v": for_linear(lyr["attn"]["v"], col, P(None, MODEL_AXIS)),
                "o": for_linear(lyr["attn"]["o"], row, rep1),
                "ln": ln2,
            },
        }
        if "router" in lyr["mlp"]:
            # MoE FFN half: expert parallelism over MODEL_AXIS — the
            # [NLh, Ex, ...] expert stacks shard on the EXPERT axis
            # (each chip holds Ex/tp experts and computes their
            # contributions for all tokens; one psum combines,
            # bert._moe_half). Router/shared-bias/LN replicate. Falls
            # back to replicated experts when Ex % tp != 0 — safe: the
            # forward detects all-experts-local by shape and skips the
            # psum.
            m = lyr["mlp"]
            # all-or-nothing across up/down (+biases): the forward
            # infers the local expert count from up.w's shape, so a
            # partially sharded expert stack would desync the scan
            exp = P(None, MODEL_AXIS)
            exp_ok = all(_divisible(a.shape, exp, mesh)
                         for a in (m["up"]["w"], m["up"]["b"],
                                   m["down"]["w"], m["down"]["b"]))
            espec = exp if exp_ok else P()
            s["mlp"] = {
                "router": {"w": P(None, None, None)},
                "up": {"w": espec, "b": espec},
                "down": {"w": espec, "b": espec},
                "ln": ln2,
            }
            if "bias" in m:
                s["mlp"]["bias"] = rep1
            return s
        s["mlp"] = {
            "up": for_linear(lyr["mlp"]["up"], col, P(None, MODEL_AXIS)),
            "down": for_linear(lyr["mlp"]["down"], row, rep1),
            "ln": ln2,
        }
        if "gate" in lyr["mlp"]:
            # gated MLP (nomic-bert): gate is column-parallel like up —
            # the elementwise act(gate)*up then happens shard-locally
            s["mlp"]["gate"] = for_linear(lyr["mlp"]["gate"], col,
                                          P(None, MODEL_AXIS))
        return s

    if "dense" in params["layers"]:
        layer_specs: Params = {
            "dense": stack_specs(params["layers"]["dense"]),
            "moe": stack_specs(params["layers"]["moe"])}
    else:
        layer_specs = stack_specs(params["layers"])
    specs: Params = {
        "embeddings": emb_specs,
        "layers": layer_specs,
    }
    if "rel_bias" in params:
        # MPNet relative-bias table [buckets, H]: head axis follows the
        # column-parallel q/k/v head split so each shard biases exactly
        # its local heads (falls back to replicated on non-divisible H)
        spec = P(None, MODEL_AXIS)
        if not _divisible(params["rel_bias"].shape, spec, mesh):
            spec = P(None, None)
        specs["rel_bias"] = spec
    if "alibi_slopes" in params:
        # jina-bert-v2 ALiBi slopes [H]: same head split as rel_bias
        spec = P(MODEL_AXIS)
        if not _divisible(params["alibi_slopes"].shape, spec, mesh):
            spec = P(None)
        specs["alibi_slopes"] = spec
    if "final_ln" in params:
        # ModernBERT post-stack norm: tiny, replicated
        specs["final_ln"] = {"scale": P(None), "bias": P(None)}
    for extra in ("st_dense", "cls_head"):
        # post-pooling heads (sentence-transformers Dense stack,
        # reranker classification head): tiny, replicated
        if extra in params:
            specs[extra] = jax.tree_util.tree_map(
                lambda a: P(*(None,) * a.ndim), params[extra])
    return specs


def adapt_packed_params(params: Params, mesh: Mesh) -> Params:
    """Keep true-4-bit packed weights under tensor parallelism wherever the
    shards stay valid, unpacking only the exceptions.

    Column-parallel weights (q/k/v, FFN-up) shard along N, which never
    touches the packed-row axis — always fine packed. Row-parallel weights
    (attn-out, FFN-down) shard along K: each shard must hold whole
    group-64 nibble packs, i.e. (K/2)/tp % 32 == 0. When it does not
    (e.g. MiniLM K=384 at tp=4), only that weight falls back to int8
    codes; the rest of the model keeps the halved HBM weight footprint.
    (Replaces the round-1 behavior of unpacking EVERYTHING under a mesh.)
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def shardable_packed(w: QuantizedTensor) -> bool:
        rows = w.codes.shape[-2]  # packed rows = K/2
        return rows % tp == 0 and (rows // tp) % 32 == 0

    def unpack_one(w: QuantizedTensor) -> QuantizedTensor:
        from ..ops.quant import codes_int8
        return QuantizedTensor(jnp.asarray(codes_int8(w)), w.scales,
                               w.mins, w.kind, w.block_axis, packed=False)

    if tp <= 1:
        return params

    def adapt_stack(layers: Params) -> Params:
        out = dict(layers)
        for grp, name in (("attn", "o"), ("mlp", "down")):
            if name not in out.get(grp, {}):
                continue  # MoE half: mlp has router/experts, no "down"
            node = dict(out[grp])
            lin = dict(node[name])
            w = lin["w"]
            if (isinstance(w, QuantizedTensor) and w.packed
                    and w.block_axis == -2 and not shardable_packed(w)):
                lin["w"] = unpack_one(w)
                node[name] = lin
                out[grp] = node
        return out

    out = dict(params)
    if "dense" in params["layers"]:
        out["layers"] = {h: adapt_stack(params["layers"][h])
                         for h in ("dense", "moe")}
    else:
        out["layers"] = adapt_stack(params["layers"])
    return out


def _tree_map_qt(f, specs, params):
    """Map f(spec_leaf, param_leaf) over congruent trees where
    QuantizedTensor is treated as an internal node on both sides."""
    return jax.tree_util.tree_map(f, specs, params)


def shard_params(params: Params, config: BertConfig, mesh: Mesh) -> Params:
    """device_put every leaf with its NamedSharding."""
    specs = param_pspecs(params, mesh)

    def put(spec, x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return _tree_map_qt(put, specs, params)


def _check_tp_shardable(pspecs: Params, tp: int) -> None:
    """Every matmul weight must really be TP-sharded: a replication
    fallback (non-divisible dim) would make the shard_map psum
    over-count by tp. Fail loudly instead. (MoE expert stacks are
    exempt: their replication fallback is SAFE — the forward detects
    all-experts-local by shape and emits no psum.)"""
    def _has_model_axis(spec) -> bool:
        return any(ax == MODEL_AXIS for ax in spec if ax)

    stacks = ([("", pspecs["layers"])] if "attn" in pspecs["layers"]
              else [("dense.", pspecs["layers"]["dense"]),
                    ("moe.", pspecs["layers"]["moe"])])
    for prefix, node in stacks:
        checks = [(("attn", "q"), "attn.q"),
                  (("attn", "k"), "attn.k"),
                  (("attn", "v"), "attn.v"),
                  (("attn", "o"), "attn.o")]
        if "router" not in node["mlp"]:
            checks += [(("mlp", "up"), "mlp.up"),
                       (("mlp", "down"), "mlp.down")]
            if "gate" in node["mlp"]:
                checks.append((("mlp", "gate"), "mlp.gate"))
        for path, name in checks:
            w = node
            for k in path:
                w = w[k]
            w = w["w"]
            spec = w.codes if isinstance(w, QuantizedTensor) else w
            if not _has_model_axis(spec):
                raise ValueError(
                    f"tp={tp} cannot shard {prefix}{name} for this "
                    f"model (dimension not divisible); lower tp or "
                    f"use spmd='gspmd'")


def make_sharded_forward(config: BertConfig, mesh: Mesh, *,
                         pooling: str | None = None,
                         compute_dtype: str | None = None,
                         mask_value: float = -1e9,
                         pallas: str = "auto",
                         int8: bool = False,
                         spmd: str = "shard_map"):
    """jitted (params, ids, mask) -> [B, E] with batch over DATA_AXIS and
    Megatron TP over MODEL_AXIS.

    spmd="shard_map" (default): explicit per-shard programs — every chip
    runs the single-device forward (INCLUDING the Pallas fused kernels) on
    its local weight shards, with one lax.psum over ICI after each
    row-parallel matmul (o-proj, FFN-down). This is the production path:
    Mosaic kernels run as-is inside shard_map.

    spmd="gspmd": the same math jitted with NamedSharding constraints and
    XLA-inserted collectives. Pallas is disabled here (Mosaic custom calls
    have no GSPMD partitioning rules), so quantized weights take the
    XLA dequant+matmul fallback — kept for cross-checking numerics.
    """
    from ..ops.linear import int8_mode, pallas_mode
    data = NamedSharding(mesh, P(DATA_AXIS, None))
    out_s = NamedSharding(mesh, P(DATA_AXIS, None))
    tp = mesh.shape[MODEL_AXIS]

    if spmd == "shard_map":
        import inspect
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        # the replication-check kwarg was renamed check_rep -> check_vma
        _params = inspect.signature(shard_map).parameters
        _nocheck = ({"check_vma": False} if "check_vma" in _params
                    else {"check_rep": False})

        def make_fn(params):
            pspecs = param_pspecs(params, mesh)
            tp_axis = MODEL_AXIS if tp > 1 else None
            if tp_axis is not None:
                _check_tp_shardable(pspecs, tp)

            def local_fwd(p, ids, mask):
                # honor the engine's kernel-path knobs at trace time
                # (use_pallas='never' must still work under a mesh)
                with pallas_mode(pallas), int8_mode(int8):
                    return bert.encode_tokens(p, config, ids, mask,
                                              pooling=pooling,
                                              compute_dtype=compute_dtype,
                                              mask_value=mask_value,
                                              tp_axis=tp_axis)

            sharded = shard_map(
                local_fwd, mesh=mesh,
                in_specs=(pspecs, P(DATA_AXIS, None), P(DATA_AXIS, None)),
                out_specs=P(DATA_AXIS, None),
                **_nocheck)
            return jax.jit(sharded)

        # params structure is needed to build in_specs; build lazily on
        # first call and cache (structure is stable per engine)
        cache: dict = {}

        def fwd(params, ids, mask):
            key = jax.tree_util.tree_structure(params)
            if key not in cache:
                cache[key] = make_fn(params)
            return cache[key](params, ids, mask)

        return fwd

    def fwd(params, ids, mask):
        with pallas_mode("never"):  # applies at trace time
            return bert.encode_tokens(params, config, ids, mask,
                                      pooling=pooling,
                                      compute_dtype=compute_dtype,
                                      mask_value=mask_value)

    return jax.jit(fwd, in_shardings=(None, data, data), out_shardings=out_s)


def make_sharded_packed_forward(config: BertConfig, mesh: Mesh, *,
                                compute_dtype: str | None = None,
                                mask_value: float = -1e9,
                                pallas: str = "auto",
                                int8: bool = False):
    """jitted (params, ids, seg, pos, pool, attn_window) -> [B, S, E]
    for token-PACKED batches over the mesh: rows are independent by
    construction, so the row axis shards over DATA_AXIS exactly like the
    bucketed batch axis, and Megatron TP applies within each shard via
    the same tp_axis psums — the 1.5x packing win survives scale-out.
    attn_window is static (bucketed by the engine)."""
    import inspect
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from ..ops.linear import int8_mode, pallas_mode
    _sig = inspect.signature(shard_map).parameters
    _nocheck = ({"check_vma": False} if "check_vma" in _sig
                else {"check_rep": False})
    tp = mesh.shape.get(MODEL_AXIS, 1)
    tp_axis = MODEL_AXIS if tp > 1 else None
    row = P(DATA_AXIS, None)
    cache: dict = {}

    def make_fn(params, attn_window: int):
        pspecs = param_pspecs(params, mesh)
        if tp_axis is not None:
            # same fail-loud contract as the bucketed path: a
            # replication fallback would silently psum-over-count
            _check_tp_shardable(pspecs, tp)

        def local_fwd(p, ids, seg, pos, pool):
            # attn_window is a closed-over static (one compiled program
            # per bucketed window value, same as the single-device path)
            with pallas_mode(pallas), int8_mode(int8):
                return bert.encode_packed(p, config, ids, seg, pos, pool,
                                          compute_dtype=compute_dtype,
                                          mask_value=mask_value,
                                          tp_axis=tp_axis,
                                          attn_window=attn_window)

        sharded = shard_map(
            local_fwd, mesh=mesh,
            in_specs=(pspecs, row, row, row, P(DATA_AXIS, None, None)),
            out_specs=P(DATA_AXIS, None, None),
            **_nocheck)
        return jax.jit(sharded)

    def fwd(params, ids, seg, pos, pool, attn_window=0):
        key = (jax.tree_util.tree_structure(params), int(attn_window))
        if key not in cache:
            cache[key] = make_fn(params, int(attn_window))
        return cache[key](params, ids, seg, pos, pool)

    return fwd
