"""Reader/writer for GGUF model files (BERT architecture).

The reference pins a pre-GGUF 2023 ggml and its README's own TODO is
"Update to the latest ggml lib and gguf format" — modern llama.cpp-era
embedding checkpoints (bge/nomic/MiniLM GGUFs) use this container. This
module implements GGUF v3 from the public spec so those files load
directly into the engine, and so our checkpoints can be exported for
llama.cpp-ecosystem tooling.

Layout (little-endian throughout):

  u32 magic 'GGUF' (0x46554747), u32 version (3),
  u64 n_tensors, u64 n_kv,
  n_kv x { string key, u32 vtype, value },
  n_tensors x { string name, u32 n_dims, u64 ne[n_dims] (ne[0] innermost),
                u32 ggml_type, u64 offset (into the data section) },
  pad to `general.alignment` (default 32),
  tensor data (each tensor offset aligned).

Strings are u64-length-prefixed UTF-8. Arrays are { u32 elem_vtype,
u64 n, elems }.

Quantized blocks (current ggml, different from the legacy .bin era that
ggml_io handles): Q4_0 = { f16 d; u8 qs[16] } per 32 elements with LOW
nibbles = elements 0..15 and HIGH nibbles = 16..31 (the legacy format
used f32 d and adjacent-pair nibbles); Q4_1 = { f16 d; f16 m; u8 qs[16] };
Q8_0 = { f16 d; i8 qs[32] }.

BERT tensor names follow llama.cpp's bert arch (token_embd.weight,
blk.N.attn_q.weight, ...) — mapped to/from HF state-dict names below.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, BinaryIO

import numpy as np

from ..config import BertConfig
from ..ops import quant as Q

MAGIC = 0x46554747  # 'GGUF'
VERSION = 3
ALIGNMENT = 32

# GGUF metadata value types
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL = range(8)
T_STRING, T_ARRAY, T_U64, T_I64, T_F64 = 8, 9, 10, 11, 12

# ggml tensor types
GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q4_1 = 0, 1, 2, 3
GGML_Q8_0 = 8
GGML_TYPE_NAMES = {GGML_F32: "f32", GGML_F16: "f16", GGML_Q4_0: "q4_0",
                   GGML_Q4_1: "q4_1", GGML_Q8_0: "q8_0"}
DTYPE_TO_GGML = {"f32": GGML_F32, "f16": GGML_F16, "q4_0": GGML_Q4_0,
                 "q4_1": GGML_Q4_1, "q8_0": GGML_Q8_0}

QK = Q.QK  # 32-element blocks

# llama.cpp bert-arch tensor name <-> HF state-dict name
_STATIC_NAMES = {
    "token_embd.weight": "embeddings.word_embeddings.weight",
    "token_types.weight": "embeddings.token_type_embeddings.weight",
    "position_embd.weight": "embeddings.position_embeddings.weight",
    "token_embd_norm.weight": "embeddings.LayerNorm.weight",
    "token_embd_norm.bias": "embeddings.LayerNorm.bias",
}
_BLOCK_NAMES = {
    "attn_q": "attention.self.query",
    "attn_k": "attention.self.key",
    "attn_v": "attention.self.value",
    "attn_output": "attention.output.dense",
    "attn_output_norm": "attention.output.LayerNorm",
    "ffn_up": "intermediate.dense",
    "ffn_down": "output.dense",
    "layer_output_norm": "output.LayerNorm",
}


def gguf_to_hf_name(name: str) -> str | None:
    """llama.cpp bert tensor name -> HF name (None = unknown/skip)."""
    if name in _STATIC_NAMES:
        return _STATIC_NAMES[name]
    if name.startswith("blk."):
        _, i, rest = name.split(".", 2)
        stem, _, suffix = rest.rpartition(".")
        hf = _BLOCK_NAMES.get(stem)
        if hf is not None and suffix in ("weight", "bias"):
            return f"encoder.layer.{i}.{hf}.{suffix}"
    return None


_STATIC_NAMES_INV = {v: k for k, v in _STATIC_NAMES.items()}


def hf_to_gguf_name(name: str) -> str | None:
    if name in _STATIC_NAMES_INV:
        return _STATIC_NAMES_INV[name]
    if name.startswith("encoder.layer."):
        parts = name.split(".")
        i = parts[2]
        suffix = parts[-1]
        hf_stem = ".".join(parts[3:-1])
        for g, h in _BLOCK_NAMES.items():
            if h == hf_stem:
                return f"blk.{i}.{g}.{suffix}"
    return None


# ---------------------------------------------------------------------------
# GGUF-era block codecs (vectorized; note the layout differs from the
# legacy .bin codecs in ops/quant.py)
# ---------------------------------------------------------------------------

def q4_0_to_bytes(a: np.ndarray) -> bytes:
    """f32 [R, K] (K innermost, K%32==0) -> GGUF Q4_0 block stream."""
    R, K = a.shape
    nb = K // QK
    blocks = a.reshape(R * nb, QK).astype(np.float32)
    idx = np.abs(blocks).argmax(axis=-1, keepdims=True)
    maxv = np.take_along_axis(blocks, idx, axis=-1)
    # llama.cpp quantize_row_q4_0_ref: codes come from the FULL-precision
    # scale; only the stored d is rounded to f16 (bit-parity with
    # llama.cpp-quantized artifacts, same reason as the q8_0 roundf fix)
    df = (maxv / -8.0).astype(np.float32)
    d = df.astype(np.float16)
    inv = np.where(df != 0.0, 1.0 / np.where(df == 0.0, 1.0, df), 0.0)
    q = np.clip(np.floor(blocks * inv + 8.5), 0.0, 15.0).astype(np.uint8)
    lo, hi = q[:, :QK // 2], q[:, QK // 2:]
    qs = (lo | (hi << 4)).astype(np.uint8)          # [R*nb, 16]
    rec = np.zeros(R * nb, dtype=np.dtype([("d", "<f2"),
                                           ("qs", "u1", (QK // 2,))]))
    rec["d"] = d[:, 0]
    rec["qs"] = qs
    return rec.tobytes()


def q4_0_from_bytes(buf: bytes, R: int, K: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """GGUF Q4_0 stream -> (codes int8 [R, K] in [-8, 7], scales f32
    [R, K//32])."""
    nb = K // QK
    rec = np.dtype([("d", "<f2"), ("qs", "u1", (QK // 2,))])
    arr = np.frombuffer(buf, dtype=rec, count=R * nb).reshape(R, nb)
    d = arr["d"].astype(np.float32)
    qs = arr["qs"]
    codes = np.empty((R, nb, QK), np.int8)
    codes[..., :QK // 2] = (qs & 0x0F).astype(np.int8) - 8
    codes[..., QK // 2:] = (qs >> 4).astype(np.int8) - 8
    return codes.reshape(R, K), d


def q4_1_to_bytes(a: np.ndarray) -> bytes:
    R, K = a.shape
    nb = K // QK
    blocks = a.reshape(R * nb, QK).astype(np.float32)
    mn = blocks.min(axis=-1, keepdims=True)
    mx = blocks.max(axis=-1, keepdims=True)
    # full-precision d/min for the codes, f16 only for storage
    # (llama.cpp quantize_row_q4_1_ref parity)
    df = ((mx - mn) / 15.0).astype(np.float32)
    d = df.astype(np.float16)
    m = mn.astype(np.float16)
    inv = np.where(df != 0.0, 1.0 / np.where(df == 0.0, 1.0, df), 0.0)
    q = np.clip(np.floor((blocks - mn) * inv + 0.5),
                0.0, 15.0).astype(np.uint8)
    lo, hi = q[:, :QK // 2], q[:, QK // 2:]
    rec = np.zeros(R * nb, dtype=np.dtype([("d", "<f2"), ("m", "<f2"),
                                           ("qs", "u1", (QK // 2,))]))
    rec["d"] = d[:, 0]
    rec["m"] = m[:, 0]
    rec["qs"] = (lo | (hi << 4)).astype(np.uint8)
    return rec.tobytes()


def q4_1_from_bytes(buf: bytes, R: int, K: int):
    """Returns the repo-wide QuantizedTensor q4_1 convention: CENTERED
    codes in [-8, 7] with FOLDED mins (m + 8d), matching
    ops.quant.unpack_ggml_q4_1 — pack_codes_g64 and the kernels assume
    centered codes, so raw [0, 15] codes would overflow the nibble
    packing and silently corrupt the weights."""
    nb = K // QK
    rec = np.dtype([("d", "<f2"), ("m", "<f2"), ("qs", "u1", (QK // 2,))])
    arr = np.frombuffer(buf, dtype=rec, count=R * nb).reshape(R, nb)
    d = arr["d"].astype(np.float32)
    m = arr["m"].astype(np.float32) + 8.0 * d   # fold the centering shift
    qs = arr["qs"]
    codes = np.empty((R, nb, QK), np.int8)
    codes[..., :QK // 2] = (qs & 0x0F).astype(np.int8) - 8
    codes[..., QK // 2:] = (qs >> 4).astype(np.int8) - 8
    return codes.reshape(R, K), d, m


def q8_0_to_bytes(a: np.ndarray) -> bytes:
    R, K = a.shape
    nb = K // QK
    blocks = a.reshape(R * nb, QK).astype(np.float32)
    amax = np.abs(blocks).max(axis=-1, keepdims=True)
    d = (amax / 127.0).astype(np.float16)
    df = d.astype(np.float32)
    inv = np.where(df != 0.0, 1.0 / np.where(df == 0.0, 1.0, df), 0.0)
    v = blocks * inv
    # half-away-from-zero like C roundf (llama.cpp quantize_row_q8_0)
    q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int8)
    rec = np.zeros(R * nb, dtype=np.dtype([("d", "<f2"),
                                           ("qs", "i1", (QK,))]))
    rec["d"] = d[:, 0]
    rec["qs"] = q
    return rec.tobytes()


def q8_0_from_bytes(buf: bytes, R: int, K: int):
    nb = K // QK
    rec = np.dtype([("d", "<f2"), ("qs", "i1", (QK,))])
    arr = np.frombuffer(buf, dtype=rec, count=R * nb).reshape(R, nb)
    return arr["qs"].reshape(R, K).copy(), arr["d"].astype(np.float32)


_BLOCK_BYTES = {GGML_Q4_0: 2 + 16, GGML_Q4_1: 4 + 16, GGML_Q8_0: 2 + 32}


def _tensor_nbytes(ggml_type: int, ne: tuple[int, ...]) -> int:
    nel = int(np.prod(ne))
    if ggml_type == GGML_F32:
        return nel * 4
    if ggml_type == GGML_F16:
        return nel * 2
    if ggml_type not in _BLOCK_BYTES:
        raise ValueError(
            f"unsupported ggml tensor type {ggml_type} (supported: "
            f"{sorted(GGML_TYPE_NAMES.values())}; K-quants like Q4_K/Q6_K "
            f"are not implemented — re-quantize to q4_0/q8_0)")
    return nel // QK * _BLOCK_BYTES[ggml_type]


# ---------------------------------------------------------------------------
# Metadata primitives
# ---------------------------------------------------------------------------

def _w_str(f: BinaryIO, s: str) -> None:
    b = s.encode("utf-8")
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


_SCALAR_FMT = {T_U8: "<B", T_I8: "<b", T_U16: "<H", T_I16: "<h",
               T_U32: "<I", T_I32: "<i", T_F32: "<f", T_BOOL: "<?",
               T_U64: "<Q", T_I64: "<q", T_F64: "<d"}


def _w_value(f: BinaryIO, vtype: int, v: Any) -> None:
    if vtype == T_STRING:
        _w_str(f, v)
    elif vtype == T_ARRAY:
        etype, items = v
        f.write(struct.pack("<IQ", etype, len(items)))
        for it in items:
            _w_value(f, etype, it)
    else:
        f.write(struct.pack(_SCALAR_FMT[vtype], v))


def _r_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _r_value(f: BinaryIO, vtype: int) -> Any:
    if vtype == T_STRING:
        return _r_str(f)
    if vtype == T_ARRAY:
        etype, n = struct.unpack("<IQ", f.read(12))
        return [_r_value(f, etype) for _ in range(n)]
    fmt = _SCALAR_FMT[vtype]
    (v,) = struct.unpack(fmt, f.read(struct.calcsize(fmt)))
    return v


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def write_gguf(path: str | Path, params: dict, config: BertConfig,
               vocab_tokens: list[str], dtype: str = "f32", *,
               name: str = "embeddings_tpu bert export") -> None:
    """Write our params as a GGUF v3 BERT model.

    dtype (f32|f16|q4_0|q4_1|q8_0) applies to 2-D '.weight' tensors, the
    same selection rule as the legacy pipeline (convert-to-ggml.py:93-98,
    quantize.cpp:154-167); everything else stays f32.
    """
    from .params import to_hf_state_dict
    sd = to_hf_state_dict(params)
    ggml_type = DTYPE_TO_GGML[dtype]

    specials = {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"}
    tok_types = [3 if t in specials or
                 (t.startswith("[unused") and t.endswith("]")) else 1
                 for t in vocab_tokens]

    def tok_id(tok: str, default: int) -> int:
        try:
            return vocab_tokens.index(tok)
        except ValueError:
            return default

    kv: list[tuple[str, int, Any]] = [
        ("general.architecture", T_STRING, "bert"),
        ("general.name", T_STRING, name),
        ("general.alignment", T_U32, ALIGNMENT),
        ("general.file_type", T_U32,
         {GGML_F32: 0, GGML_F16: 1, GGML_Q4_0: 2, GGML_Q4_1: 3,
          GGML_Q8_0: 7}[ggml_type]),
        *([("general.quantization_version", T_U32, 2)]  # GGML_QNT_VERSION
          if ggml_type not in (GGML_F32, GGML_F16) else []),
        ("bert.context_length", T_U32, config.max_position_embeddings),
        # llama.cpp writes pooling_type for embedding models (1=mean,
        # 2=cls); loaders that check it would otherwise default to none
        ("bert.pooling_type", T_U32,
         {"mean": 1, "cls": 2, "max": 0}.get(config.pooling, 1)),
        ("bert.embedding_length", T_U32, config.hidden_size),
        ("bert.feed_forward_length", T_U32, config.intermediate_size),
        ("bert.block_count", T_U32, config.num_hidden_layers),
        ("bert.attention.head_count", T_U32, config.num_attention_heads),
        ("bert.attention.layer_norm_epsilon", T_F32, config.layer_norm_eps),
        ("bert.vocab_size", T_U32, config.vocab_size),
        ("tokenizer.ggml.model", T_STRING, "bert"),
        ("tokenizer.ggml.tokens", T_ARRAY, (T_STRING, vocab_tokens)),
        ("tokenizer.ggml.token_type", T_ARRAY, (T_I32, tok_types)),
        ("tokenizer.ggml.unknown_token_id", T_U32,
         tok_id("[UNK]", config.unk_token_id)),
        ("tokenizer.ggml.padding_token_id", T_U32,
         tok_id("[PAD]", config.pad_token_id)),
        ("tokenizer.ggml.cls_token_id", T_U32,
         tok_id("[CLS]", config.cls_token_id)),
        # llama.cpp's historical spelling
        ("tokenizer.ggml.seperator_token_id", T_U32,
         tok_id("[SEP]", config.sep_token_id)),
    ]

    # assemble tensor payloads (name, ne, type, bytes)
    tensors: list[tuple[str, tuple[int, ...], int, bytes]] = []
    for hf_name, arr in sd.items():
        gname = hf_to_gguf_name(hf_name)
        if gname is None:
            continue
        arr = np.ascontiguousarray(arr, np.float32)
        ne = arr.shape[::-1]  # ne[0] innermost
        quantize_this = (ggml_type != GGML_F32 and arr.ndim == 2
                         and hf_name.endswith(".weight")
                         and ne[0] % QK == 0)
        if not quantize_this:
            tensors.append((gname, ne, GGML_F32, arr.tobytes()))
        elif ggml_type == GGML_F16:
            tensors.append((gname, ne, GGML_F16,
                            arr.astype(np.float16).tobytes()))
        else:
            enc = {GGML_Q4_0: q4_0_to_bytes, GGML_Q4_1: q4_1_to_bytes,
                   GGML_Q8_0: q8_0_to_bytes}[ggml_type]
            tensors.append((gname, ne, ggml_type, enc(arr)))

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", MAGIC, VERSION,
                            len(tensors), len(kv)))
        for key, vtype, v in kv:
            _w_str(f, key)
            f.write(struct.pack("<I", vtype))
            _w_value(f, vtype, v)
        offset = 0
        for gname, ne, ttype, data in tensors:
            _w_str(f, gname)
            f.write(struct.pack("<I", len(ne)))
            f.write(struct.pack(f"<{len(ne)}Q", *ne))
            f.write(struct.pack("<IQ", ttype, offset))
            offset += len(data)
            offset += (-offset) % ALIGNMENT
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % ALIGNMENT))
        for _, _, _, data in tensors:
            f.write(data)
            f.write(b"\x00" * ((-len(data)) % ALIGNMENT))


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------

def read_gguf(path: str | Path, *, dequant: bool = False):
    """Parse a GGUF BERT file -> (state_dict, BertConfig, metadata dict).

    state_dict maps HF names to f32 arrays (or QuantizedTensor in the
    ggml [K, N] orientation for quantized 2-D weights when dequant=False
    — ready for ggml_io.build_params_from_sd). metadata holds the raw KV
    pairs (tokenizer.ggml.tokens etc.).
    """
    with open(path, "rb") as f:
        magic, version, n_tensors, n_kv = struct.unpack("<IIQQ", f.read(24))
        if magic != MAGIC:
            raise ValueError(f"bad GGUF magic {magic:#x}")
        if version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {version}")
        meta: dict[str, Any] = {}
        for _ in range(n_kv):
            key = _r_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            meta[key] = _r_value(f, vtype)
        arch = meta.get("general.architecture", "bert")
        if arch != "bert":
            # nomic-bert (RoPE) / jina-bert-v2 (ALiBi) use the same
            # container but different position handling — loading them
            # through the vanilla BERT forward would silently produce
            # wrong embeddings, so refuse instead
            raise ValueError(
                f"unsupported GGUF architecture {arch!r} (only vanilla "
                f"'bert' encoders; nomic/jina variants need RoPE/ALiBi)")
        infos = []
        for _ in range(n_tensors):
            tname = _r_str(f)
            (n_dims,) = struct.unpack("<I", f.read(4))
            ne = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            infos.append((tname, ne, ttype, offset))
        align = int(meta.get("general.alignment", ALIGNMENT))
        pos = f.tell()
        data_start = pos + ((-pos) % align)

        sd: dict[str, Any] = {}
        for tname, ne, ttype, offset in infos:
            hf_name = gguf_to_hf_name(tname)
            if hf_name is None:
                continue  # pooler etc.
            f.seek(data_start + offset)
            raw = f.read(_tensor_nbytes(ttype, ne))
            shape = tuple(int(x) for x in ne[::-1])  # numpy shape
            if ttype == GGML_F32:
                sd[hf_name] = np.frombuffer(raw, "<f4").reshape(
                    shape).astype(np.float32)
            elif ttype == GGML_F16:
                sd[hf_name] = np.frombuffer(raw, "<f2").reshape(
                    shape).astype(np.float32)
            elif ttype in (GGML_Q4_0, GGML_Q4_1, GGML_Q8_0):
                K = int(ne[0])
                R = int(np.prod(ne[1:])) if len(ne) > 1 else 1
                if ttype == GGML_Q4_0:
                    codes, d = q4_0_from_bytes(raw, R, K)
                    qt = Q.QuantizedTensor(_j(codes.T), _j(d.T), None,
                                           "q4_0", -2)
                elif ttype == GGML_Q8_0:
                    codes, d = q8_0_from_bytes(raw, R, K)
                    qt = Q.QuantizedTensor(_j(codes.T), _j(d.T), None,
                                           "q8_0", -2)
                else:
                    codes, d, m = q4_1_from_bytes(raw, R, K)
                    qt = Q.QuantizedTensor(_j(codes.T), _j(d.T), _j(m.T),
                                           "q4_1", -2)
                if dequant:
                    sd[hf_name] = np.asarray(
                        Q.dequantize(qt)).T.reshape(shape)
                else:
                    sd[hf_name] = qt  # [K, R] = transposed vs HF
            else:
                raise ValueError(
                    f"unsupported ggml tensor type {ttype} ({tname})")

    n_head = int(meta.get("bert.attention.head_count", 12))
    config = BertConfig(
        vocab_size=int(meta.get("bert.vocab_size",
                                len(meta.get("tokenizer.ggml.tokens", []))
                                or 30522)),
        hidden_size=int(meta["bert.embedding_length"]),
        num_hidden_layers=int(meta["bert.block_count"]),
        num_attention_heads=n_head,
        intermediate_size=int(meta["bert.feed_forward_length"]),
        max_position_embeddings=int(meta.get("bert.context_length", 512)),
        layer_norm_eps=float(
            meta.get("bert.attention.layer_norm_epsilon", 1e-12)),
        # llama.cpp pooling_type enum: 1=mean, 2=cls (0=none -> our mean
        # default, matching the reference's mean-pool-everything)
        pooling={2: "cls"}.get(int(meta.get("bert.pooling_type", 1)),
                               "mean"),
    )
    return sd, config, meta


def _j(x: np.ndarray):
    import jax.numpy as jnp
    return jnp.asarray(np.ascontiguousarray(x))


def load_gguf_model(path: str | Path):
    """.gguf -> (params pytree, BertConfig, WordPieceTokenizer)."""
    import dataclasses
    from ..tokenizer import WordPieceTokenizer, WordPieceVocab
    from .ggml_io import build_params_from_sd
    sd, config, meta = read_gguf(path, dequant=False)
    tokens = meta.get("tokenizer.ggml.tokens")
    if not tokens:
        raise ValueError("GGUF file has no tokenizer.ggml.tokens")
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(tokens))
    ids = {}
    for key, field in (("unknown_token_id", "unk_token_id"),
                       ("padding_token_id", "pad_token_id"),
                       ("cls_token_id", "cls_token_id"),
                       ("seperator_token_id", "sep_token_id"),
                       ("separator_token_id", "sep_token_id")):
        v = meta.get(f"tokenizer.ggml.{key}")
        if v is not None:
            ids[field] = int(v)
    config = dataclasses.replace(config, **ids)
    params = build_params_from_sd(sd, config)
    return params, config, tok
