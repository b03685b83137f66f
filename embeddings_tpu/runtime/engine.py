"""The Engine: tokenizer + params + jit cache + batch scheduler.

Public capability surface mirrors the reference C API (bert.h:33-90):

  reference                      engine
  ---------------------------   -------------------------------------
  bert_load_from_file           load_model(path_or_dir, dtype=...)
  bert_free                     (garbage collection)
  bert_tokenize                 Engine.tokenize
  bert_forward / _batch         Engine.forward (padded ids+mask in)
  bert_encode / _batch          Engine.encode / Engine.encode_batch
  bert_n_embd                   Engine.n_embd
  bert_n_max_tokens             Engine.max_seq_len
  bert_vocab_id_to_token        Engine.tokenizer.id_to_token

Instead of ggml's per-call graph rebuild + arena resize
(bert.cpp:788-810, 876-882), the Engine jits one forward and lets JAX cache
one executable per (batch, seq) bucket; warmup() precompiles the standard
grid. Optional mesh/shardings route the same jitted fn over a TPU mesh
(parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from pathlib import Path
from typing import Any, Sequence

import jax
import numpy as np

from ..config import BertConfig, EngineConfig
from ..models import bert, params as P
from ..tokenizer import WordPieceTokenizer
from .batching import extend_buckets, pad_batch, plan_batches


def _bucket_window(w: int, row_len: int, bq: int | None = None) -> int:
    """Quantize the packed attention window (a STATIC jit argument) to a
    small fixed set so serving load with varied corpora compiles at most a
    handful of packed programs per row_len instead of one per distinct
    span value (1..row_len/128). Values past the block-skip dispatch
    threshold (row_len/128 - 2, models/bert.py) all select the monolithic
    segmented kernel and ignore the window, so they collapse to one
    sentinel. Rounding a span UP only widens the computed window — always
    correct, occasionally a block of extra work."""
    if w <= 0:
        return 0
    if bq is None:
        # same source of truth as packing.max_block_span: the kernel's
        # query-block size (a hardcoded 128 here would silently desync
        # the window from the span if BQ were ever retuned)
        from ..ops.attention import BQ as bq
    nk = row_len // bq
    usable = [b for b in (3, 4, 6, 8, 12, 16, 24, 32) if w <= b <= nk - 2]
    if usable:
        return usable[0]
    # between the largest fitting bucket and the dispatch threshold:
    # widen to the threshold (still block-skip, one shared key)
    return nk - 2 if w <= nk - 2 else nk


class Engine:
    def __init__(self, params: dict, config: BertConfig,
                 tokenizer: WordPieceTokenizer,
                 engine_config: EngineConfig | None = None,
                 mesh: "jax.sharding.Mesh | None" = None):
        self.config = config
        self.tokenizer = tokenizer
        # private copy: the mesh branch adjusts batch fields in place, and
        # a caller-shared EngineConfig must not drift between Engines
        self.engine_config = dataclasses.replace(
            engine_config or EngineConfig())
        self.mesh = mesh
        # fast host-side tokenizer (native C++ ext: WordPiece or
        # byte-level BPE) when built; the Python tokenizer remains the
        # API surface (id_to_token, vocab, ...)
        from ..tokenizer import native as _native
        self._fast_tokenizer = _native.wrap_fast(tokenizer)
        cd = self.engine_config.compute_dtype
        if cd is None and jax.default_backend() == "tpu":
            cd = "bfloat16"
        if cd == "bf16":
            cd = "bfloat16"
        self._compute_dtype = cd
        mv = self.engine_config.mask_value
        mode = self.engine_config.use_pallas
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS
            # shard_map needs batch shapes divisible by the data-axis size
            self._dp = mesh.shape.get(DATA_AXIS, 1)
            ec = self.engine_config
            ec.batch_size = -(-ec.batch_size // self._dp) * self._dp
            ec.batch_buckets = tuple(
                b for b in ec.batch_buckets if b % self._dp == 0
            ) or (self._dp,)
            from ..parallel.context import SEQ_AXIS
            if SEQ_AXIS in mesh.shape:
                # context parallelism: L sharded over "seq" (weights
                # replicated); power-of-two seq buckets >= 16 are always
                # divisible by the seq-axis size
                from ..parallel.context import make_cp_forward
                sp = mesh.shape[SEQ_AXIS]
                ec.seq_buckets = tuple(b for b in ec.seq_buckets
                                       if b % sp == 0) or (sp,)
                self.params = params
                self._forward = make_cp_forward(config, mesh,
                                                compute_dtype=cd,
                                                mask_value=mv)
            else:
                from ..parallel.sharding import (make_sharded_forward,
                                                 shard_params)
                self.params = shard_params(params, config, mesh)
                self._forward = make_sharded_forward(
                    config, mesh, compute_dtype=cd, mask_value=mv,
                    pallas=mode, int8=self.engine_config.int8_compute)
        else:
            from ..ops.linear import int8_mode, pallas_mode
            self._dp = 1
            self.params = P.fuse_qkv(params)  # single-device: merge q/k/v
            params = self.params
            i8 = self.engine_config.int8_compute

            def _fwd(p, ids, mask):
                # scoped (trace-time) kernel-path selection: no global leak
                with pallas_mode(mode), int8_mode(i8):
                    return bert.encode_tokens(p, config, ids, mask,
                                              compute_dtype=cd, mask_value=mv)

            self._forward = jax.jit(_fwd)

    # -- introspection (bert.h:78-88 equivalents) ---------------------------
    @property
    def n_embd(self) -> int:
        dense = self.params.get("st_dense")
        if dense:
            # SentenceTransformers Dense stack: output dim = last
            # projection's width (distiluse: 768 -> 512)
            last = dense[str(len(dense) - 1)]
            return int(last["w"].shape[-1])
        return self.config.hidden_size

    @property
    def max_seq_len(self) -> int:
        # RoBERTa reserves the first position_offset rows (its 514-row
        # table serves 512 usable positions)
        return min(self.engine_config.max_seq_len,
                   self.config.max_position_embeddings
                   - self.config.position_offset)

    # -- tokenize -----------------------------------------------------------
    def tokenize(self, text: str) -> list[int]:
        tok = self._fast_tokenizer or self.tokenizer
        return tok.encode(text, max_len=self.max_seq_len)

    # -- forward on pre-tokenized, padded arrays ----------------------------
    def forward(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        if self._dp > 1 and ids.shape[0] % self._dp:
            raise ValueError(
                f"batch size {ids.shape[0]} not divisible by the data-axis "
                f"size {self._dp}; pad the batch (encode_batch does this "
                f"automatically) or use a divisible batch")
        out = self._forward(self.params, ids, mask)
        return np.asarray(out)

    # -- encode (the primary API) --------------------------------------------
    def encode(self, text: str | Sequence[str]) -> np.ndarray:
        """Encode one string -> [E], or a list -> [N, E] (single device
        batch, like bert_encode / bert_forward_batch)."""
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        out = self.encode_batch(texts, batch_size=max(len(texts), 1))
        return out[0] if single else out

    def encode_batch(self, texts: Sequence[str],
                     batch_size: int | None = None) -> np.ndarray:
        """Tokenize, length-sort into bucketed chunks, run, scatter back
        (bert_encode_batch semantics, bert.cpp:1374-1444).

        Device calls run ahead of result read-back through a bounded
        window: JAX dispatch is asynchronous, so the host pads/transfers
        chunk i+1 while the TPU computes chunk i — the reference's ggml
        threadpool blocks per chunk instead (bert.cpp:1436-1442). The
        window (engine_config.inflight_batches) caps how many output
        buffers are live at once, so retrieval-scale corpora encode in
        O(window) device memory."""
        toks = [self.tokenize(t) for t in texts]
        return self.encode_toks(toks, batch_size)

    def encode_toks(self, toks: list[list[int]],
                    batch_size: int | None = None) -> np.ndarray:
        """Bucketed encode of pre-tokenized inputs (shared by encode_batch,
        the packed path's long-sentence routing, and servers that tokenize
        once to also count tokens)."""
        ec = self.engine_config
        batch_size = batch_size or ec.batch_size
        # under a mesh, device batches must divide by the data-axis size
        batch_size = -(-batch_size // self._dp) * self._dp
        out = np.empty((len(toks), self.n_embd), np.float32)
        # a caller-supplied batch_size may exceed the configured buckets
        # (e.g. encode() passes len(texts)); grow the bucket set to cover it
        bb = extend_buckets(ec.batch_buckets, batch_size)
        plans = plan_batches([len(t) for t in toks], batch_size,
                             self._seq_buckets(), bb)

        def dispatch():
            for plan in plans:
                ids, mask = pad_batch([toks[i] for i in plan.indices],
                                      plan.batch, plan.seq,
                                      self.tokenizer.pad_id)
                yield plan, self._forward(self.params, ids, mask)

        def scatter(plan, emb):
            out[list(plan.indices)] = np.asarray(emb)[: len(plan.indices)]

        self._windowed_drain(dispatch(), scatter)
        return out

    def _windowed_drain(self, tasks, scatter) -> None:
        """Drive a (meta, device_value) generator with a bounded in-flight
        window: dispatch runs ahead of result read-back by at most
        engine_config.inflight_batches device batches, keeping the
        host/device pipeline full while holding O(window) output buffers
        (shared by the bucketed and packed encode paths)."""
        window = max(1, self.engine_config.inflight_batches)
        pending: deque = deque()
        for meta, val in tasks:
            pending.append((meta, val))
            if len(pending) > window:
                scatter(*pending.popleft())
        while pending:
            scatter(*pending.popleft())

    def rerank(self, query: str, documents: Sequence[str],
               batch_size: int | None = None) -> np.ndarray:
        """Cross-encoder relevance scores [N] for (query, document)
        pairs (raw logits — HF convention; apply a sigmoid for [0, 1]
        scores). Needs a checkpoint with a classification head
        (bge-reranker family, ms-marco cross-encoders); the loader
        attaches it as params["cls_head"].
        """
        if "cls_head" not in self.params:
            raise ValueError(
                "this model has no classification head — load a "
                "cross-encoder/reranker checkpoint (e.g. bge-reranker, "
                "ms-marco cross-encoders) to use rerank()")
        if self.mesh is not None:
            raise NotImplementedError(
                "rerank() runs single-device (reranker backbones are "
                "small); build the Engine without a mesh")
        enc = getattr(self.tokenizer, "encode_pair", None)
        if enc is None:
            raise ValueError(
                f"{type(self.tokenizer).__name__} has no pair encoding")
        pairs = [enc(query, d, max_len=self.max_seq_len)
                 for d in documents]
        ec = self.engine_config
        batch_size = batch_size or ec.batch_size
        out = np.empty(len(pairs), np.float32)
        bb = extend_buckets(ec.batch_buckets, batch_size)
        plans = plan_batches([len(p[0]) for p in pairs], batch_size,
                             self._seq_buckets(), bb)
        if getattr(self, "_forward_pairs", None) is None:
            from ..ops.linear import int8_mode, pallas_mode
            cd, mv = self._compute_dtype, ec.mask_value
            mode = ec.use_pallas
            i8 = ec.int8_compute
            cfg = self.config

            def _fp(p, ids, types, mask):
                with pallas_mode(mode), int8_mode(i8):
                    return bert.score_pairs(p, cfg, ids, mask, types,
                                            compute_dtype=cd,
                                            mask_value=mv)

            self._forward_pairs = jax.jit(_fp)

        def dispatch():
            for plan in plans:
                ids, mask = pad_batch([pairs[i][0] for i in plan.indices],
                                      plan.batch, plan.seq,
                                      self.tokenizer.pad_id)
                types = np.zeros_like(ids)
                for r, i in enumerate(plan.indices):
                    t = pairs[i][1]
                    types[r, : len(t)] = t
                yield plan, self._forward_pairs(self.params, ids, types,
                                                mask)

        def scatter(plan, scores):
            out[list(plan.indices)] = np.asarray(
                scores)[: len(plan.indices)]

        self._windowed_drain(dispatch(), scatter)
        return out

    def encode_batch_packed(self, texts: Sequence[str],
                            row_len: int | None = None,
                            batch_rows: int | None = None) -> np.ndarray:
        """Token-packed encode: several sentences per device row
        (runtime/packing.py) — the 'token-level packing' mode. Much faster
        than bucketed padding when sentences are short relative to the
        efficient device sequence length. Requires mean or CLS pooling.
        Works on single devices and dp/tp meshes (rows shard over the
        data axis); CP (seq-sharded) meshes fall back to bucketed."""
        toks = [self.tokenize(t) for t in texts]
        return self.encode_toks_packed(toks, row_len, batch_rows)

    def encode_toks_packed(self, toks: list[list[int]],
                           row_len: int | None = None,
                           batch_rows: int | None = None) -> np.ndarray:
        """Token-packed encode of pre-tokenized inputs (see
        encode_batch_packed)."""
        if self.mesh is not None:
            from ..parallel.context import SEQ_AXIS
            if SEQ_AXIS in self.mesh.shape:
                # context parallelism shards L itself — packed rows mix
                # segments across the seq shards; out of scope
                import logging
                logging.getLogger("embeddings_tpu.engine").warning(
                    "token packing is not implemented for seq-parallel "
                    "(CP) meshes; falling back to bucketed encode")
                return self.encode_toks(toks)
        if self.config.pooling not in ("mean", "cls", "lasttoken"):
            raise ValueError("packing supports mean/cls/lasttoken pooling")
        from .batching import pick_bucket
        from .packing import materialize, plan_packing
        ec = self.engine_config
        # short rows beat long ones: attention is O(row_len^2) per row and
        # the segmented kernel computes cross-segment blocks too (wasted);
        # 128 with ~32K tokens per dispatch measured fastest (~15% lower
        # device time than bucketed batching on an STSB-length corpus,
        # with 28% fewer padded tokens and 5.5x fewer dispatches).
        # row_len stays FIXED across calls — a per-batch value derived
        # from the longest text churns the jit cache (compile stalls
        # under serving load); sentences longer than row_len take the
        # bucketed path instead.
        row_len = row_len or min(128, self.max_seq_len)
        batch_rows = batch_rows or max(ec.batch_size, 32768 // row_len)
        # mesh: the row axis shards over "data" — row buckets must divide
        batch_rows = -(-batch_rows // self._dp) * self._dp
        out = np.empty((len(toks), self.n_embd), np.float32)
        short = [i for i, t in enumerate(toks) if len(t) <= row_len]
        long_idx = [i for i, t in enumerate(toks) if len(t) > row_len]
        if long_idx:
            out[long_idx] = self.encode_toks([toks[i] for i in long_idx])
        if not short:
            return out
        stoks = [toks[i] for i in short]
        # fixed segments-per-row: one stable compiled shape family
        # (overshoot only pads the tiny [B, S, L] pooling matrix)
        batches = plan_packing([len(t) for t in stoks], row_len, batch_rows,
                               max_segs=max(2, row_len // 8))
        bb = extend_buckets(ec.batch_buckets, batch_rows)
        from .packing import max_block_span

        def dispatch():
            for b in batches:
                b.batch = pick_bucket(len(b.rows), bb)  # pad row count
                ids, seg, pos, pool, mapping = materialize(
                    b, stoks, self.tokenizer.pad_id, self.config.pooling)
                # static attention window for the block-skip kernel
                # (host-side numpy; rows longer than 128 only attend
                # within it). Bucketed so varied corpora can't trigger
                # one XLA compile per distinct span value.
                w = max_block_span(seg) if row_len > 128 else 0
                yield mapping, self._forward_packed(
                    ids, seg, pos, pool, _bucket_window(w, row_len))

        def scatter(mapping, pooled):
            pooled = np.asarray(pooled)
            for r, s, i in mapping:
                out[short[i]] = pooled[r, s]

        self._windowed_drain(dispatch(), scatter)
        return out

    def _forward_packed(self, ids, seg, pos, pool, attn_window: int = 0):
        if not hasattr(self, "_packed_fn"):
            cd = self._compute_dtype  # resolved once in __init__
            mv = self.engine_config.mask_value
            mode = self.engine_config.use_pallas
            config = self.config

            if self.mesh is not None:
                # rows shard over "data", Megatron TP within each shard —
                # the packing win survives scale-out
                from ..parallel.sharding import make_sharded_packed_forward
                self._packed_fn = make_sharded_packed_forward(
                    config, self.mesh, compute_dtype=cd, mask_value=mv,
                    pallas=mode, int8=self.engine_config.int8_compute)
            else:
                from ..ops.linear import int8_mode, pallas_mode
                i8 = self.engine_config.int8_compute

                def _fwd(p, ids, seg, pos, pool, attn_window):
                    with pallas_mode(mode), int8_mode(i8):
                        return bert.encode_packed(
                            p, config, ids, seg, pos, pool,
                            compute_dtype=cd, mask_value=mv,
                            attn_window=attn_window)

                self._packed_fn = jax.jit(_fwd,
                                          static_argnames=("attn_window",))
        return self._packed_fn(self.params, ids, seg, pos, pool,
                               attn_window=attn_window)

    # -- shape warmup --------------------------------------------------------
    def warmup(self, batch_sizes: Sequence[int] | None = None,
               seq_lens: Sequence[int] | None = None) -> int:
        """Precompile the (batch, seq) bucket grid; returns #programs."""
        ec = self.engine_config
        n = 0
        for b in batch_sizes or ec.batch_buckets:
            for s in seq_lens or self._seq_buckets():
                ids = np.zeros((b, s), np.int32)
                mask = np.zeros((b, s), np.int32)
                mask[:, 0] = 1
                self.forward(ids, mask)
                n += 1
        return n

    def warmup_packed(self, row_len: int | None = None,
                      batch_rows: int | None = None,
                      segs_per_row: Sequence[int] = (4, 8, 16)) -> int:
        """Precompile the token-packed program family (one program per
        segs-per-row bucket at the serving row/batch shape). Without
        this, a packed server compiles its first oddly-segmented batch
        MID-REQUEST — observed as a 7.9 s p99 outlier in the serving
        load test. Returns #dispatches run."""
        if self.config.pooling not in ("mean", "cls", "lasttoken"):
            return 0
        row_len = row_len or min(128, self.max_seq_len)
        batch_rows = batch_rows or max(self.engine_config.batch_size,
                                       32768 // row_len)
        tok = 1 if self.tokenizer is None else \
            max(1, self.tokenizer.pad_id + 1)
        n = 0
        for spr in segs_per_row:
            sent_len = max(1, row_len // spr)
            sents = [[tok] * sent_len] * (batch_rows * spr)
            self.encode_toks_packed(sents, row_len, batch_rows)
            n += 1
        # partial serving batches land on the smaller row-count buckets
        # — warm those too (cheap: fewer rows per program)
        from .batching import extend_buckets
        for rb in extend_buckets(self.engine_config.batch_buckets,
                                 batch_rows):
            if rb >= batch_rows:
                break
            sents = [[tok] * max(1, row_len // 8)] * (rb * 8)
            self.encode_toks_packed(sents, row_len, rb)
            n += 1
        return n

    def profile(self, out_dir: str):
        """Context manager: capture a jax.profiler (xprof) device trace of
        everything run inside — the TPU analogue of the reference's
        GGML_PERF per-op timing dumps (bert.cpp:1128-1132)."""
        return jax.profiler.trace(str(out_dir))

    def _seq_buckets(self) -> tuple[int, ...]:
        """Configured seq buckets clipped to max_seq_len — and always
        covering it, since tokenize() truncates at max_seq_len (a 300-token
        input with buckets ending at 256 must plan a 300-wide batch)."""
        bs = tuple(b for b in self.engine_config.seq_buckets
                   if b <= self.max_seq_len)
        if not bs or bs[-1] < self.max_seq_len:
            bs = bs + (self.max_seq_len,)
        return bs


def load_model(path: str | Path, *, dtype: str = "f32",
               engine_config: EngineConfig | None = None,
               mesh=None, tokenizer: WordPieceTokenizer | None = None,
               pooling: str | None = None,
               int8_compute: bool = False) -> Engine:
    """Load an HF model directory or a native .npz checkpoint into an Engine.

    dtype: f32 | bf16 | f16 | q4_0 | q4_1 | q8_0 — quantize/cast on load
    (the reference selects dtype by model file, bert.cpp:499-521; we take a
    flag and one checkpoint).

    int8_compute: enable the int8-MXU compute mode WITHOUT losing the
    model-aware EngineConfig defaults. Passing a bare
    ``EngineConfig(int8_compute=True)`` instead silently resets
    max_seq_len to the 512 dataclass default — which truncated long
    documents and misreported the int8 mode's quality on long-context
    models (caught by the tiny-rotary L~1k STS gate).
    """
    path = Path(path)
    if path.is_dir():
        params, config = P.load_hf_dir(path)
        if pooling is None:
            # HF config.json has no pooling field; SentenceTransformers
            # keeps it in 1_Pooling/config.json, else match KNOWN_MODELS
            # (bge-* are CLS-pooled; the reference mean-pools them all,
            # bert.cpp:1087-1089 — we detect instead of silently meaning)
            from ..config import detect_pooling
            detected = detect_pooling(path)
            if detected is not None:
                config = dataclasses.replace(config, pooling=detected)
        if tokenizer is None:
            # WordPiece (vocab.txt, BERT family) or byte-level BPE
            # (vocab.json+merges.txt / tokenizer.json, RoBERTa family)
            from ..tokenizer import tokenizer_from_dir
            tokenizer = tokenizer_from_dir(path)
    elif path.suffix == ".bin":
        # reference-format ggml model file (vocab embedded)
        from ..models.ggml_io import load_ggml_model
        params, config, file_tok = load_ggml_model(path)
        tokenizer = tokenizer or file_tok
    elif path.suffix == ".gguf":
        # modern llama.cpp-era container (vocab embedded)
        from ..models.gguf_io import load_gguf_model
        params, config, file_tok = load_gguf_model(path)
        tokenizer = tokenizer or file_tok
    else:
        params, config = P.load_native(path)
        if tokenizer is None:
            try:
                from ..tokenizer import tokenizer_from_dir
                tokenizer = tokenizer_from_dir(path.parent)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"no tokenizer: pass tokenizer= or put vocab.txt "
                    f"(or vocab.json+merges.txt) next to {path}") from None
    if pooling is not None:
        config = dataclasses.replace(config, pooling=pooling)
    if (config.norm_type == "rmsnorm"
            and getattr(tokenizer, "special_style", None) == "cls_sep"):
        # decoder-based embedders (Qwen2 family) take bare tokens + eos,
        # not a [CLS]/<s> wrap
        tokenizer.special_style = "eos_only"
    from ..ops.quant import QuantizedTensor
    _mlp = params["layers"].get("dense", params["layers"])["mlp"]
    already_quant = isinstance(_mlp["up"]["w"], QuantizedTensor)
    if dtype != "f32" and not already_quant:
        params = P.quantize_params(params, dtype)
    from ..ops.quant import PACK4_KINDS
    if dtype in PACK4_KINDS:
        # store q4 matmul weights truly 4-bit (2 codes/byte): halves the
        # HBM weight footprint and the weight-read bandwidth that bounds
        # small-batch latency
        params = P.pack_q4_params(params)
        if mesh is not None:
            # keep packed under TP; only row-parallel weights whose
            # K-shards would split group-64 packs fall back to int8 codes
            from ..parallel.sharding import adapt_packed_params
            params = adapt_packed_params(params, mesh)
    config = dataclasses.replace(
        config,
        cls_token_id=tokenizer.cls_id, sep_token_id=tokenizer.sep_id,
        unk_token_id=tokenizer.unk_id, pad_token_id=tokenizer.pad_id)
    if engine_config is None:
        # honor the model's context length (the reference reads
        # n_max_tokens from the model hparams, bert.cpp:499-521): a
        # long-context model (rotary nomic-bert-2048) should not be
        # silently truncated to the 512 BERT default
        from ..config import EngineConfig
        engine_config = EngineConfig(
            max_seq_len=config.max_position_embeddings
            - config.position_offset,
            int8_compute=int8_compute)
    elif int8_compute and not engine_config.int8_compute:
        engine_config = dataclasses.replace(engine_config,
                                            int8_compute=True)
    return Engine(params, config, tokenizer, engine_config, mesh)
