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
        w = v["w"]
        if isinstance(w, QuantizedTensor):
            wspec = QuantizedTensor(
                fit(w.codes, w_spec), fit(w.scales, w_spec),
                None if w.mins is None else fit(w.mins, w_spec),
                w.kind, w.block_axis)
        else:
            wspec = w_spec
        return {"w": wspec, "b": b_spec}

    # Embedding tables are replicated: they are small once quantized
    # (~12 MB for bge-base q4_0), the gather result must be fully
    # replicated on E before the embedding LayerNorm anyway, and their
    # scale arrays [V, E/32] often have fewer blocks than TP degree.
    emb_word = params["embeddings"]["word"]
    rep2 = P(None, None)
    if isinstance(emb_word, QuantizedTensor):
        word_spec = QuantizedTensor(rep2, rep2,
                                    None if emb_word.mins is None else rep2,
                                    emb_word.kind, emb_word.block_axis)
    else:
        word_spec = rep2

    ln2 = {"scale": rep1, "bias": rep1}
    return {
        "embeddings": {
            "word": word_spec,
            "position": rep2,
            "token_type": rep2,
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "layers": {
            "attn": {
                "q": for_linear(params["layers"]["attn"]["q"], col, P(None, MODEL_AXIS)),
                "k": for_linear(params["layers"]["attn"]["k"], col, P(None, MODEL_AXIS)),
                "v": for_linear(params["layers"]["attn"]["v"], col, P(None, MODEL_AXIS)),
                "o": for_linear(params["layers"]["attn"]["o"], row, rep1),
                "ln": ln2,
            },
            "mlp": {
                "up": for_linear(params["layers"]["mlp"]["up"], col, P(None, MODEL_AXIS)),
                "down": for_linear(params["layers"]["mlp"]["down"], row, rep1),
                "ln": ln2,
            },
        },
    }


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


def make_sharded_forward(config: BertConfig, mesh: Mesh, *,
                         pooling: str | None = None,
                         compute_dtype: str | None = None,
                         mask_value: float = -1e9):
    """jitted (params, ids, mask) -> [B, E] with batch over DATA_AXIS and
    Megatron TP over MODEL_AXIS; collectives inserted by XLA.

    The Pallas kernels are disabled under a mesh: Mosaic custom calls have
    no GSPMD partitioning rules outside shard_map, so XLA could not shard
    them — the mesh path uses the pure-XLA dequant+matmul/einsum ops, which
    GSPMD partitions freely. (Per-shard Pallas via shard_map is the planned
    follow-up.)"""
    from ..ops.linear import pallas_mode
    data = NamedSharding(mesh, P(DATA_AXIS, None))
    out_s = NamedSharding(mesh, P(DATA_AXIS, None))

    def fwd(params, ids, mask):
        with pallas_mode("never"):  # applies at trace time
            return bert.encode_tokens(params, config, ids, mask,
                                      pooling=pooling,
                                      compute_dtype=compute_dtype,
                                      mask_value=mask_value)

    return jax.jit(fwd, in_shardings=(None, data, data), out_shardings=out_s)
