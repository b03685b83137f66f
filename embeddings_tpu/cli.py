"""Command-line interface.

Mirrors the reference's flag surface (bert_params_parse, bert.cpp:140-193:
-m/--model, -p/--prompt, -t/--threads, --port) and its example binaries
(examples/main.cpp = `encode`, examples/server.cpp = `serve`,
models/quantize.cpp = `quantize`, models/convert-to-ggml.py = `convert`),
as subcommands of one tool:

  embeddings-tpu encode   -m MODEL -p "text" [--dtype q4_0]
  embeddings-tpu serve    -m MODEL [--port 8080] [--http-port 8081]
  embeddings-tpu convert  HF_DIR OUT.{npz|bin|gguf} [--dtype f32]
  embeddings-tpu quantize IN.npz OUT.npz --dtype q4_0
  embeddings-tpu bench    -m MODEL [--batch 128 --seq 256]
  embeddings-tpu tokenize -m MODEL -p "text"

MODEL is an HF directory, a native .npz, a reference-format ggml .bin,
or a GGUF .gguf (vocab embedded for the latter two).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS"):
    # some images import jax at interpreter startup pinned to an
    # accelerator platform; honor an explicit JAX_PLATFORMS request
    # (e.g. CPU serving/eval runs) the way the benchmark scripts do
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-m", "--model", required=True,
                   help="HF model dir or native .npz checkpoint")
    p.add_argument("--dtype", default="f32",
                   choices=["f32", "bf16", "f16", "q4_0", "q4_1", "q8_0",
                            "nf4"])
    p.add_argument("--pooling", default=None, choices=["mean", "cls", "max"])
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="accepted for bert.h compatibility; XLA manages "
                        "its own threading")
    p.add_argument("--max-seq", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence/context-parallel mesh size "
                        "(exclusive with --tp)")
    p.add_argument("--int8", action="store_true",
                   help="int8 MXU compute for quantized matmuls (2x the "
                        "bf16 rate on v5e; adds ~2^-7-relative error on "
                        "top of the weight quantization)")


def _load_engine(args):
    from .config import EngineConfig
    from .runtime.engine import load_model
    mesh = None
    sp = getattr(args, "sp", 1)
    if sp > 1 and args.tp > 1:
        raise SystemExit("--sp and --tp are mutually exclusive")
    if sp > 1:
        from .parallel import make_mesh_cp
        mesh = make_mesh_cp(dp=args.dp, sp=sp)
    elif args.tp > 1 or (args.dp or 0) > 1:
        from .parallel import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    ec = EngineConfig(max_seq_len=args.max_seq, batch_size=args.batch_size,
                      int8_compute=getattr(args, "int8", False))
    return load_model(args.model, dtype=args.dtype, engine_config=ec,
                      mesh=mesh, pooling=args.pooling)


def cmd_encode(args) -> int:
    t0 = time.time()
    eng = _load_engine(args)
    t_load = time.time() - t0
    texts = args.prompt if args.prompt else [line.rstrip("\n")
                                             for line in sys.stdin]
    if not texts:
        print("no input: pass -p/--prompt or pipe text on stdin",
              file=sys.stderr)
        return 1
    t0 = time.time()
    embs = (eng.encode_batch_packed(texts) if args.packed
            else eng.encode_batch(texts))
    t_eval = time.time() - t0
    if args.verbose:
        toks = eng.tokenize(texts[0])
        print(f"tokens[0]: {toks}", file=sys.stderr)
        print(f"  {[eng.tokenizer.id_to_token(t) for t in toks]}",
              file=sys.stderr)
    if args.format == "json":
        json.dump({"embeddings": embs.tolist()}, sys.stdout)
        print()
    else:
        for e in embs:
            print(" ".join(f"{v:.6f}" for v in e))
    print(f"load: {t_load*1e3:.0f} ms | eval: {t_eval*1e3:.0f} ms "
          f"({len(texts)} texts)", file=sys.stderr)
    return 0


def cmd_rerank(args) -> int:
    """Cross-encoder reranking: score documents against one query."""
    eng = _load_engine(args)
    docs = args.document if args.document else [line.rstrip("\n")
                                                for line in sys.stdin]
    if not docs:
        print("no documents: pass positional DOC args or pipe one per "
              "line on stdin", file=sys.stderr)
        return 1
    t0 = time.time()
    scores = eng.rerank(args.query, docs)
    t_eval = time.time() - t0
    order = sorted(range(len(docs)), key=lambda i: -scores[i])
    if args.format == "json":
        json.dump({"results": [
            {"index": i, "relevance_score": float(scores[i]),
             "document": docs[i]} for i in order]}, sys.stdout)
        print()
    else:
        for i in order:
            print(f"{scores[i]:+.4f}\t{docs[i]}")
    print(f"eval: {t_eval*1e3:.0f} ms ({len(docs)} documents)",
          file=sys.stderr)
    return 0


def cmd_tokenize(args) -> int:
    eng = _load_engine(args)
    for text in args.prompt:
        ids = eng.tokenize(text)
        print(ids)
        print([eng.tokenizer.id_to_token(i) for i in ids])
    return 0


def cmd_serve(args) -> int:
    import asyncio
    from .runtime.server import serve_forever
    eng = _load_engine(args)
    eng.warmup(batch_sizes=(args.batch_size,), seq_lens=None)
    try:
        asyncio.run(serve_forever(
            eng, host=args.host, tcp_port=args.port,
            http_port=args.http_port, max_batch=args.batch_size,
            max_wait_ms=args.max_wait_ms,
            request_timeout_s=args.request_timeout,
            packed=args.packed))
    except KeyboardInterrupt:
        pass
    return 0


def cmd_convert(args) -> int:
    import os
    from pathlib import Path
    from .models import params as P
    from .ops.quant import PACK4_KINDS
    src = Path(args.hf_dir)
    src_tokens = None  # vocab as an ordered token list, wherever it came from
    if src.suffix in (".bin", ".gguf"):
        if src.suffix == ".bin":
            from .models.ggml_io import load_ggml_model as load_file_model
        else:
            from .models.gguf_io import load_gguf_model as load_file_model
        params, config, file_tok = load_file_model(src)
        v = file_tok.vocab.id_to_token
        src_tokens = [v[i] for i in range(len(v))]
    else:
        params, config = P.load_hf_dir(src)
        vocab_file = src / "vocab.txt"
        if vocab_file.exists():
            src_tokens = vocab_file.read_text(
                encoding="utf-8").splitlines()
    if args.out.endswith(".bin"):
        # export in the reference's ggml .bin format (vocab embedded)
        from .models.ggml_io import NAME_TO_FTYPE, write_ggml
        if args.dtype not in NAME_TO_FTYPE:
            print(f"ggml .bin cannot represent dtype {args.dtype} "
                  f"(reference supports {sorted(NAME_TO_FTYPE)}, "
                  f"bert.cpp:499-521)", file=sys.stderr)
            return 1
        if src_tokens is None:
            print(f"no vocab found for {src} (need vocab.txt next to an HF "
                  f"checkpoint, or a .bin source)", file=sys.stderr)
            return 1
        write_ggml(args.out, params, config, src_tokens, dtype=args.dtype)
        print(f"wrote {args.out} "
              f"({os.path.getsize(args.out)/1e6:.2f} MB, ggml {args.dtype})")
        return 0
    if args.out.endswith(".gguf"):
        # export as GGUF v3 (modern llama.cpp-era container)
        from .models.gguf_io import DTYPE_TO_GGML, write_gguf
        if args.dtype not in DTYPE_TO_GGML:
            print(f"gguf cannot represent dtype {args.dtype} "
                  f"(supported: {sorted(DTYPE_TO_GGML)})", file=sys.stderr)
            return 1
        if src_tokens is None:
            print(f"no vocab found for {src} (need vocab.txt next to an HF "
                  f"checkpoint, or a .bin/.gguf source)", file=sys.stderr)
            return 1
        write_gguf(args.out, params, config, src_tokens, dtype=args.dtype)
        print(f"wrote {args.out} "
              f"({os.path.getsize(args.out)/1e6:.2f} MB, gguf {args.dtype})")
        return 0
    if args.dtype.endswith("_K"):
        print(f"K-quant {args.dtype} is a GGUF block format; use a "
              f".gguf output path", file=sys.stderr)
        return 1
    if args.dtype != "f32":
        params = P.quantize_params(params, args.dtype,
                                   pack4=args.dtype in PACK4_KINDS)
    P.save_native(args.out, params, config)
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.2f} MB, dtype={args.dtype})")
    # write vocab next to the checkpoint so load_model finds the tokenizer
    # (for .bin sources the vocab is embedded in the file, not on disk)
    if src_tokens is not None:
        (Path(args.out).parent / "vocab.txt").write_text(
            "\n".join(src_tokens) + "\n", encoding="utf-8")
    elif src.is_dir():
        # BPE-family source (RoBERTa): carry the tokenizer files over
        import shutil
        for name in ("vocab.json", "merges.txt", "tokenizer.json",
                     "tokenizer_config.json"):
            f = src / name
            dst = Path(args.out).parent / name
            if f.exists() and f.resolve() != dst.resolve():
                shutil.copyfile(f, dst)
    return 0


def cmd_quantize(args) -> int:
    """Offline re-quantization of a native checkpoint (quantize.cpp:27-319
    equivalent; prints per-kind histogram stats like the reference)."""
    import numpy as np
    from .models import params as P
    from .ops.quant import (PACK4_KINDS, QuantizedTensor,
                            codes_int8, nibble_histogram)
    params, config = P.load_native(args.input)
    qp = P.quantize_params(params, args.dtype,
                           pack4=args.dtype in PACK4_KINDS)
    P.save_native(args.out, qp, config)
    if args.dtype in PACK4_KINDS:
        import jax
        hist = np.zeros(16, np.int64)
        for leaf in jax.tree_util.tree_leaves(
                qp, is_leaf=lambda x: isinstance(x, QuantizedTensor)):
            if isinstance(leaf, QuantizedTensor):
                hist += nibble_histogram(codes_int8(leaf))
        total = hist.sum()
        print("nibble histogram:",
              " ".join(f"{h/total:.3f}" for h in hist))
    import os
    print(f"wrote {args.out} "
          f"({os.path.getsize(args.out)/1e6:.2f} MB, dtype={args.dtype})")
    return 0


def cmd_bench(args) -> int:
    import contextlib

    import numpy as np
    from .utils.benchmarking import device_time_us
    eng = _load_engine(args)
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, eng.config.vocab_size,
                                   (args.batch, args.seq)), jnp.int32)
    mask = jnp.ones((args.batch, args.seq), jnp.int32)
    trace = (jax.profiler.trace(args.profile) if args.profile
             else contextlib.nullcontext())
    with trace:
        # time the engine's own jitted forward — the exact program
        # encode/serve runs (compute dtype, mask value, sharding included)
        us = device_time_us(
            lambda i, m: eng._forward(eng.params, i, m),
            (ids, mask), lo=5, hi=20)
    if args.profile:
        print(f"profiler trace written to {args.profile} "
              f"(view with xprof/tensorboard)", file=sys.stderr)
    print(json.dumps({
        "metric": f"sentences/sec/chip {args.dtype} seq{args.seq} "
                  f"batch{args.batch}",
        "value": round(args.batch / (us * 1e-6), 1),
        "unit": "sentences/s",
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="embeddings-tpu",
        description="TPU-native quantized embedding inference")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode", help="embed prompt(s), print vectors")
    _add_model_args(p)
    p.add_argument("-p", "--prompt", action="append", default=None)
    p.add_argument("--format", choices=["text", "json"], default="text")
    p.add_argument("--packed", action="store_true",
                   help="token-level packing (several sentences per row)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("tokenize", help="print token ids for prompt(s)")
    _add_model_args(p)
    p.add_argument("-p", "--prompt", action="append", required=True)
    p.set_defaults(fn=cmd_tokenize)

    p = sub.add_parser(
        "rerank", help="cross-encoder: score documents against a query")
    _add_model_args(p)
    p.add_argument("-q", "--query", required=True)
    p.add_argument("document", nargs="*",
                   help="documents (or pipe one per line on stdin)")
    p.add_argument("--format", choices=["text", "json"], default="text")
    p.set_defaults(fn=cmd_rerank)

    p = sub.add_parser("serve", help="run the embedding server")
    _add_model_args(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080,
                   help="TCP (reference-protocol) port; -1 disables")
    p.add_argument("--http-port", type=int, default=8081,
                   help="HTTP JSON port; -1 disables")
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--request-timeout", type=float, default=None,
                   help="per-request timeout in seconds (default: none)")
    p.add_argument("--packed", action="store_true",
                   help="token-level packing for device batches")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("convert", help="HF checkpoint -> native .npz")
    p.add_argument("hf_dir")
    p.add_argument("out")
    # K-quants are export-only (GGUF interop); the engine's own kernels
    # run q4_0/q4_1/q8_0 and K-quant FILES dequantize on load
    p.add_argument("--dtype", default="f32",
                   choices=["f32", "bf16", "f16", "q4_0", "q4_1", "q8_0",
                            "nf4", "q4_K", "q5_K", "q6_K"])
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("quantize", help="requantize a native checkpoint")
    p.add_argument("input")
    p.add_argument("out")
    p.add_argument("--dtype", required=True,
                   choices=["q4_0", "q4_1", "q8_0", "nf4"])
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("bench", help="device throughput microbenchmark")
    _add_model_args(p)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace (xprof) to DIR")
    p.set_defaults(fn=cmd_bench)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "serve" and args.port == -1:
        args.port = None
    if args.cmd == "serve" and args.http_port == -1:
        args.http_port = None
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
