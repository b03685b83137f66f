"""Embedding service: continuous batching + TCP/HTTP front-ends.

The reference's server (examples/server.cpp:26-124) is a blocking
single-client socket loop: accept one connection, send int32 n_embd, then
{recv <=32 KiB text -> bert_encode(batch=1) -> send n_embd floats}. No
concurrency, no cross-request batching.

This module is the TPU-native replacement:

- ``BatchingService``: an asyncio micro-batcher. Requests from any number
  of connections land in one queue; a scheduler drains up to
  ``max_batch`` requests (waiting at most ``max_wait_ms`` for stragglers),
  forms one bucket-padded device batch, runs it, and resolves futures.
  This is real continuous batching — cross-client, arrival-driven — the
  greenfield the survey calls out (SURVEY.md §3.4).
- ``serve_tcp``: wire-compatible with the reference protocol so the
  reference's ``sample_client.py`` works unmodified against this server.
- ``serve_http``: JSON-over-HTTP (aiohttp) POST /embed + GET /healthz.
"""

from __future__ import annotations

import asyncio
import json
import logging
import struct
from collections import deque
from dataclasses import dataclass, field

import numpy as np

from .engine import Engine

log = logging.getLogger("embeddings_tpu.server")

RECV_MAX = 32 * 1024  # reference server.cpp:27 buffer size


@dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    tokens: int = 0
    errors: int = 0
    timeouts: int = 0
    # ring buffer of recent end-to-end request latencies (seconds)
    latencies: deque = field(default_factory=lambda: deque(maxlen=2048))

    def observe_latency(self, seconds: float) -> None:
        self.latencies.append(seconds)

    def latency_ms(self) -> dict:
        if not self.latencies:
            return {}
        xs = np.sort(np.asarray(self.latencies))
        # nearest-rank percentile: ceil(p/100 * n) - 1
        pct = lambda p: float(
            xs[min(len(xs) - 1,
                   max(0, int(np.ceil(p / 100 * len(xs))) - 1))])
        return {"mean": float(xs.mean() * 1e3),
                "p50": pct(50) * 1e3, "p90": pct(90) * 1e3,
                "p99": pct(99) * 1e3, "max": float(xs[-1] * 1e3)}

    def as_dict(self) -> dict:
        d = dict(requests=self.requests, batches=self.batches,
                 tokens=self.tokens, errors=self.errors,
                 timeouts=self.timeouts)
        d["avg_batch"] = self.requests / self.batches if self.batches else 0.0
        d["latency_ms"] = self.latency_ms()
        return d


class BatchingService:
    """Cross-connection micro-batching around an Engine."""

    def __init__(self, engine: Engine, *, max_batch: int | None = None,
                 max_wait_ms: float = 2.0,
                 request_timeout_s: float | None = None,
                 packed: bool = False):
        self.engine = engine
        self.max_batch = max_batch or engine.engine_config.batch_size
        self.max_wait_ms = max_wait_ms
        self.request_timeout_s = request_timeout_s
        # token-level packing for the device batches (short-text speedup)
        if packed and engine.config.pooling not in ("mean", "cls"):
            raise ValueError(
                f"packed=True requires mean/cls pooling, engine has "
                f"{engine.config.pooling!r}")
        if packed and engine.mesh is not None and \
                "seq" in engine.mesh.shape:
            log.warning("packed=True on a seq-parallel (CP) mesh: token "
                        "packing shards rows over 'data' only, batches "
                        "fall back to bucketed encode")
        self.packed = packed
        self.stats = ServiceStats()
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task: asyncio.Task | None = None
        self._runs: set[asyncio.Task] = set()  # in-flight device batches

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._scheduler())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # let in-flight device batches finish (their futures resolve)
        if self._runs:
            await asyncio.gather(*self._runs, return_exceptions=True)
            self._runs.clear()
        # fail queued requests so waiting clients get an error instead of
        # hanging on a future that will never resolve
        while not self._queue.empty():
            _, fut = self._queue.get_nowait()
            if not fut.done():
                fut.set_exception(
                    ConnectionAbortedError("service stopped"))

    async def embed(self, text: str) -> np.ndarray:
        """Enqueue one text; resolves when its batch has run. Raises
        TimeoutError if request_timeout_s elapses first (the request is
        dropped — its batch slot still runs but the result is discarded)."""
        emb, _ = await self.embed_with_count(text)
        return emb

    async def embed_with_count(self, text: str
                               ) -> tuple[np.ndarray, int]:
        """embed() plus the text's token count, from the SAME
        tokenization the batch used (no second tokenizer pass)."""
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        t0 = loop.time()
        await self._queue.put((text, fut))
        try:
            if self.request_timeout_s is not None:
                out = await asyncio.wait_for(
                    asyncio.shield(fut), self.request_timeout_s)
            else:
                out = await fut
        except asyncio.TimeoutError:
            self.stats.timeouts += 1
            raise TimeoutError(
                f"embed request timed out after {self.request_timeout_s}s")
        self.stats.observe_latency(loop.time() - t0)
        return out

    async def embed_many(self, texts: list[str]) -> np.ndarray:
        embs, _ = await self.embed_many_with_usage(texts)
        return embs

    async def embed_many_with_usage(self, texts: list[str]
                                    ) -> tuple[np.ndarray, int]:
        """(embeddings, total token count) — counts ride along with the
        batch results instead of re-tokenizing."""
        if not texts:
            return np.empty((0, self.engine.n_embd), np.float32), 0
        outs = await asyncio.gather(
            *(self.embed_with_count(t) for t in texts))
        return np.stack([e for e, _ in outs]), sum(n for _, n in outs)

    async def _scheduler(self) -> None:
        runs: set[asyncio.Task] = self._runs
        batch: list = []
        try:
            while True:
                batch = [await self._queue.get()]
                # straggler window: drain until max_batch or timeout
                loop = asyncio.get_running_loop()
                deadline = loop.time() + self.max_wait_ms / 1e3
                while len(batch) < self.max_batch:
                    timeout = deadline - loop.time()
                    if timeout <= 0:
                        break
                    try:
                        batch.append(await asyncio.wait_for(
                            self._queue.get(), timeout))
                    except asyncio.TimeoutError:
                        break
                # pipeline: let one batch run on the device while the
                # next is drained/tokenized — host prep no longer
                # serializes with the device step
                while len(runs) >= 2:
                    done, _ = await asyncio.wait(
                        runs, return_when=asyncio.FIRST_COMPLETED)
                    runs.difference_update(done)
                task = asyncio.create_task(self._run_batch(batch))
                runs.add(task)
                task.add_done_callback(runs.discard)
                batch = []
        except asyncio.CancelledError:
            # fail the batch being formed; in-flight _run_batch tasks
            # keep running (stop() awaits them) so their clients still
            # get results
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(
                        ConnectionAbortedError("service stopped"))
            raise

    def _encode_batch_counted(self, texts: list[str]
                              ) -> tuple[np.ndarray, list[int]]:
        """Tokenize once (worker thread, not the event loop), encode, and
        return (embeddings, per-text token counts) — counts come from
        the same tokenization the encode uses, so neither stats nor the
        usage-reporting endpoints ever re-tokenize."""
        toks = [self.engine.tokenize(t) for t in texts]
        counts = [len(t) for t in toks]
        # Packed mode only pays off once a batch fills a meaningful
        # fraction of a packed row grid; micro-batches (light load) go
        # bucketed — measured faster there (planner+materialize overhead
        # and a mostly-empty fixed row shape dominate tiny batches).
        if self.packed and len(texts) >= 8:
            return self.engine.encode_toks_packed(toks), counts
        return self.engine.encode_toks(toks, len(texts)), counts

    async def _run_batch(self, batch: list) -> None:
        texts = [t for t, _ in batch]
        try:
            # the device step (and host tokenization) runs in a worker
            # thread so the event loop keeps accepting requests while the
            # TPU is busy
            embs, counts = await asyncio.to_thread(
                self._encode_batch_counted, texts)
            self.stats.requests += len(batch)
            self.stats.batches += 1
            self.stats.tokens += sum(counts)
            for (_, fut), e, n in zip(batch, embs, counts):
                if not fut.done():
                    fut.set_result((e, n))
        except Exception as exc:  # resolve futures so clients see the error
            self.stats.errors += len(batch)
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)


# ---------------------------------------------------------------------------
# TCP front-end (reference-compatible protocol)
# ---------------------------------------------------------------------------

def _utf8_incomplete_tail(data: bytes) -> bool:
    """True if data ends mid-way through a multi-byte UTF-8 sequence."""
    for i in range(1, min(4, len(data)) + 1):
        b = data[-i]
        if b < 0x80:
            return False        # ASCII tail: complete
        if b >= 0xC0:           # lead byte: complete iff sequence fits
            need = 2 if b < 0xE0 else 3 if b < 0xF0 else 4
            return i < need
    return False


V2_MAGIC = b"ETF2"  # length-prefixed framing opt-in (first client bytes)


async def _handle_tcp(service: BatchingService, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
    """Reference wire protocol (server.cpp:100-118), plus an opt-in
    length-prefixed v2 mode behind the same greeting.

    v1 (reference clients, e.g. sample_client.py) inherits the reference's
    framing limitation: one recv == one message, so a text fragmented
    across TCP segments arrives as multiple messages. Multi-byte UTF-8
    sequences split at a read boundary ARE reassembled before decoding
    (bounded by a short timeout so a truncated tail can't wedge the
    connection).

    v2: a client whose FIRST bytes after the greeting are ``ETF2``
    switches the connection to robust framing — each request is
    ``<u32 LE byte-length><utf-8 payload>``, each response the usual
    n_embd float32s. No message-size cap beyond sanity (16 MiB).
    Classification: a sane length prefix within the 1 s handshake
    window (or the bare magic followed by silence — older v2 clients
    idle after connect) commits to v2; an insane prefix is a v1 text
    that merely starts with "ETF2". The exact 4-byte v1 text ``ETF2``
    is RESERVED (it classifies as a v2 handshake)."""
    peer = writer.get_extra_info("peername")
    log.info("client connected: %s", peer)
    try:
        # greeting: int32 n_embd (server.cpp:107)
        writer.write(struct.pack("<i", service.engine.n_embd))
        await writer.drain()
        first = await reader.read(RECV_MAX)
        # the 4-byte magic may arrive fragmented: while what we have is a
        # strict prefix of it, keep reading before classifying — a v1
        # text can't be a proper prefix of b"ETF2" and also keep coming
        while first and len(first) < len(V2_MAGIC) and \
                V2_MAGIC.startswith(first):
            # short timeout: a v1 client whose whole message is "E"/"ET"/
            # "ETF" must still get its (v1) reply, not a stalled read
            try:
                more = await asyncio.wait_for(
                    reader.read(RECV_MAX - len(first)), timeout=0.25)
            except asyncio.TimeoutError:
                break
            if not more:
                break
            first += more
        if first.startswith(V2_MAGIC):
            # Classify: wait up to a handshake window for the first
            # length prefix. Sane prefix -> v2. Insane prefix (a v1
            # text like "ETF2000 report") -> v1. EXACTLY the bare magic
            # and silence -> v2 anyway: v2 clients from before the
            # send-magic-with-first-frame change send bare ETF2 at
            # connect and may idle past any window — classifying them
            # as v1 would silently desync their stream. The 4-byte
            # text "ETF2" alone therefore stays reserved (documented).
            rest = bytearray(first[len(V2_MAGIC):])
            while len(rest) < 4:
                try:
                    more = await asyncio.wait_for(
                        reader.read(RECV_MAX), timeout=1.0)
                except asyncio.TimeoutError:
                    break
                if not more:
                    break
                rest.extend(more)
            if not rest or (len(rest) >= 4 and
                            struct.unpack("<I",
                                          bytes(rest[:4]))[0] <= _V2_MAX):
                await _serve_v2(service, reader, writer, bytes(rest))
                return
            first = V2_MAGIC + bytes(rest)  # v1 text that starts with ETF2
        data = first
        while data:
            while _utf8_incomplete_tail(data) and len(data) < RECV_MAX:
                # a stalled continuation read must not wedge the
                # connection: after a short wait, decode what we have
                # (errors="replace" covers the truncated tail)
                try:
                    more = await asyncio.wait_for(
                        reader.read(RECV_MAX - len(data)), timeout=0.25)
                except asyncio.TimeoutError:
                    break
                if not more:
                    break
                data += more
            text = data.decode("utf-8", errors="replace")
            emb = await service.embed(text)
            writer.write(np.asarray(emb, np.float32).tobytes())
            await writer.drain()
            data = await reader.read(RECV_MAX)
    except (ConnectionResetError, asyncio.IncompleteReadError):
        pass
    finally:
        writer.close()
        log.info("client disconnected: %s", peer)


_V2_MAX = 16 * 1024 * 1024  # sanity cap per framed message


async def _serve_v2(service: BatchingService, reader: asyncio.StreamReader,
                    writer: asyncio.StreamWriter, leftover: bytes) -> None:
    """Length-prefixed request loop. ``leftover`` is any bytes that arrived
    in the same read as the magic (start of the first frame)."""
    buf = bytearray(leftover)

    async def need(n: int) -> bool:
        while len(buf) < n:
            chunk = await reader.read(RECV_MAX)
            if not chunk:
                return False
            buf.extend(chunk)
        return True

    while await need(4):
        (length,) = struct.unpack("<I", buf[:4])
        if length > _V2_MAX:
            log.warning("v2 frame too large (%d bytes); closing", length)
            return
        if not await need(4 + length):
            return
        text = bytes(buf[4:4 + length]).decode("utf-8", errors="replace")
        del buf[:4 + length]
        emb = await service.embed(text)
        writer.write(np.asarray(emb, np.float32).tobytes())
        await writer.drain()


async def serve_tcp(engine_or_service, host: str = "0.0.0.0",
                    port: int = 8080):
    """Start the reference-protocol TCP server; returns (server, service)."""
    service = (engine_or_service if isinstance(engine_or_service, BatchingService)
               else BatchingService(engine_or_service))
    await service.start()
    server = await asyncio.start_server(
        lambda r, w: _handle_tcp(service, r, w), host, port)
    log.info("TCP server on %s:%d (n_embd=%d)", host, port,
             service.engine.n_embd)
    return server, service


# ---------------------------------------------------------------------------
# HTTP front-end
# ---------------------------------------------------------------------------

def make_http_app(service: BatchingService):
    """aiohttp app: POST /embed {"texts": [...]} -> {"embeddings": [...]},
    GET /healthz, GET /stats."""
    from aiohttp import web

    async def embed(request: web.Request) -> web.Response:
        from ..utils.embedding_quant import PRECISIONS, quantize_embeddings
        try:
            body = await request.json()
            if not isinstance(body, dict):
                raise ValueError("body must be a JSON object")
            texts = body["texts"] if "texts" in body else [body["text"]]
            if not isinstance(texts, list) or not all(
                    isinstance(t, str) for t in texts):
                raise ValueError("texts must be a list of strings")
            precision = body.get("precision", "float32")
            if precision not in PRECISIONS:
                raise ValueError(f"precision must be one of {PRECISIONS}")
        except (json.JSONDecodeError, KeyError, ValueError, TypeError) as e:
            return web.json_response({"error": str(e) or "bad request"},
                                     status=400)
        try:
            embs = await service.embed_many(texts)
        except TimeoutError as e:
            return web.json_response({"error": str(e)}, status=504)
        except Exception as e:
            # keep the JSON error contract for engine failures too (OOM,
            # bad checkpoint state, service stopped) — not aiohttp's
            # default HTML 500
            log.exception("embed failed")
            return web.json_response(
                {"error": f"{type(e).__name__}: {e}"}, status=500)
        if precision != "float32" and len(embs):
            # vector-DB storage precisions (int8/uint8/binary/ubinary);
            # int8 ranges are per-batch calibrated — persist your own
            # ranges for incremental indexing (utils/embedding_quant)
            embs = quantize_embeddings(embs, precision)
        return web.json_response({
            "embeddings": [e.tolist() for e in embs],
            "n_embd": service.engine.n_embd,
            **({"precision": precision} if precision != "float32" else {}),
        })

    async def healthz(request):
        return web.json_response({"status": "ok",
                                  "n_embd": service.engine.n_embd})

    async def stats(request):
        return web.json_response(service.stats.as_dict())

    async def openai_embeddings(request: web.Request) -> web.Response:
        """OpenAI-compatible POST /v1/embeddings: {"input": str|[str]}
        -> {"object":"list","data":[{"embedding":[...],"index":i}],
        "usage":{...}} — lets OpenAI-SDK clients point at this server
        unchanged. Supports "encoding_format": "base64" (the OpenAI
        python SDK's default request — base64 of little-endian f32) and
        "dimensions" (Matryoshka-style truncate + renormalize). The
        usage token counts ride along with the batch results (no second
        tokenizer pass)."""
        try:
            body = await request.json()
            if not isinstance(body, dict):
                raise ValueError("body must be a JSON object")
            inp = body["input"]
            texts = [inp] if isinstance(inp, str) else list(inp)
            if not all(isinstance(t, str) for t in texts):
                raise ValueError("input must be a string or list of strings")
            enc_fmt = body.get("encoding_format", "float")
            if enc_fmt not in ("float", "base64"):
                raise ValueError(
                    "encoding_format must be 'float' or 'base64'")
            dims = body.get("dimensions")
            if dims is not None:
                dims = int(dims)
                if not 0 < dims <= service.engine.n_embd:
                    raise ValueError(
                        f"dimensions must be in [1, "
                        f"{service.engine.n_embd}]")
        except (json.JSONDecodeError, KeyError, ValueError, TypeError) as e:
            return web.json_response(
                {"error": {"message": str(e) or "bad request",
                           "type": "invalid_request_error"}}, status=400)
        try:
            embs, n_tokens = await service.embed_many_with_usage(texts)
        except TimeoutError as e:
            return web.json_response(
                {"error": {"message": str(e), "type": "timeout"}},
                status=504)
        except Exception as e:
            log.exception("v1/embeddings failed")
            return web.json_response(
                {"error": {"message": f"{type(e).__name__}: {e}",
                           "type": "server_error"}}, status=500)
        if dims is not None and dims < embs.shape[-1]:
            # Matryoshka-style: truncate then re-L2-normalize (the
            # OpenAI "dimensions" semantics)
            embs = embs[:, :dims]
            norms = np.linalg.norm(embs, axis=-1, keepdims=True)
            embs = embs / np.maximum(norms, 1e-12)
        if enc_fmt == "base64":
            import base64
            payload = [base64.b64encode(
                np.asarray(e, "<f4").tobytes()).decode("ascii")
                for e in embs]
        else:
            payload = [e.tolist() for e in embs]
        return web.json_response({
            "object": "list",
            "data": [{"object": "embedding", "embedding": e,
                      "index": i} for i, e in enumerate(payload)],
            "model": str(body.get("model", "embeddings-tpu")),
            "usage": {"prompt_tokens": n_tokens,
                      "total_tokens": n_tokens},
        })

    async def rerank(request: web.Request) -> web.Response:
        """Cross-encoder reranking, Jina/Cohere-style API:
        POST /rerank {"query": str, "documents": [str], "top_n"?: int,
        "return_documents"?: bool} -> {"results": [{"index",
        "relevance_score"(, "document")}]} sorted by score descending.
        Needs a reranker checkpoint (classification head)."""
        import asyncio
        try:
            body = await request.json()
            if not isinstance(body, dict):
                raise ValueError("body must be a JSON object")
            query = body["query"]
            docs = body["documents"]
            if not isinstance(query, str) or not isinstance(docs, list) \
                    or not all(isinstance(d, str) for d in docs):
                raise ValueError("query must be a string and documents "
                                 "a list of strings")
            top_n = body.get("top_n")
            top_n = len(docs) if top_n is None else int(top_n)
            return_docs = bool(body.get("return_documents", False))
        except (json.JSONDecodeError, KeyError, ValueError,
                TypeError) as e:
            return web.json_response({"error": str(e) or "bad request"},
                                     status=400)
        if "cls_head" not in service.engine.params:
            return web.json_response(
                {"error": "this model has no classification head — load "
                          "a cross-encoder/reranker checkpoint"},
                status=400)
        try:
            scores = await asyncio.to_thread(service.engine.rerank,
                                             query, docs)
        except Exception as e:
            log.exception("rerank failed")
            return web.json_response(
                {"error": f"{type(e).__name__}: {e}"}, status=500)
        order = sorted(range(len(docs)), key=lambda i: -scores[i])[:top_n]
        return web.json_response({"results": [
            {"index": i, "relevance_score": float(scores[i]),
             **({"document": docs[i]} if return_docs else {})}
            for i in order]})

    app = web.Application()
    app.router.add_post("/embed", embed)
    app.router.add_post("/v1/embeddings", openai_embeddings)
    app.router.add_post("/rerank", rerank)
    app.router.add_get("/healthz", healthz)
    app.router.add_get("/stats", stats)
    return app


async def serve_http(engine_or_service, host: str = "0.0.0.0",
                     port: int = 8081):
    from aiohttp import web
    service = (engine_or_service if isinstance(engine_or_service, BatchingService)
               else BatchingService(engine_or_service))
    await service.start()
    app = make_http_app(service)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    log.info("HTTP server on %s:%d", host, port)
    return runner, service


async def serve_forever(engine: Engine, *, host: str = "0.0.0.0",
                        tcp_port: int | None = 8080,
                        http_port: int | None = 8081,
                        max_batch: int | None = None,
                        max_wait_ms: float = 2.0,
                        request_timeout_s: float | None = None,
                        packed: bool = False) -> None:
    """Run TCP and/or HTTP front-ends over one shared batching service."""
    service = BatchingService(engine, max_batch=max_batch,
                              max_wait_ms=max_wait_ms,
                              request_timeout_s=request_timeout_s,
                              packed=packed)
    await service.start()
    if tcp_port is not None:
        await serve_tcp(service, host, tcp_port)
    if http_port is not None:
        await serve_http(service, host, http_port)
    await asyncio.Event().wait()  # run until cancelled
