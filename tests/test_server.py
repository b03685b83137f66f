"""Serving layer: continuous batching, reference-protocol TCP, HTTP JSON."""

import asyncio
import struct
import threading

import numpy as np
import pytest

from embeddings_tpu.config import BertConfig, EngineConfig
from embeddings_tpu.models import params as P
from embeddings_tpu.runtime.engine import Engine
from embeddings_tpu.runtime.server import (BatchingService, serve_http,
                                           serve_tcp)
from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab


@pytest.fixture(scope="module")
def engine(small_vocab):
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    params = P.init_params(cfg, rng=0)
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=8,
                      batch_buckets=(1, 2, 4, 8))
    return Engine(params, cfg, tok, ec)


def run_async(coro):
    return asyncio.run(coro)


def test_batching_service_single(engine):
    async def go():
        svc = BatchingService(engine)
        await svc.start()
        emb = await svc.embed("hello world")
        await svc.stop()
        return emb
    emb = run_async(go())
    np.testing.assert_allclose(emb, engine.encode("hello world"), atol=1e-5)


def test_batching_service_batches_concurrent_requests(engine):
    async def go():
        svc = BatchingService(engine, max_batch=8, max_wait_ms=50)
        await svc.start()
        texts = [f"hello world {'a ' * (i % 4)}" for i in range(16)]
        outs = await svc.embed_many(texts)
        await svc.stop()
        return outs, svc.stats
    outs, stats = run_async(go())
    assert outs.shape == (16, engine.n_embd)
    # 16 concurrent requests must coalesce into far fewer device batches
    assert stats.batches <= 4, stats.as_dict()
    assert stats.requests == 16
    ref = engine.encode_batch([f"hello world {'a ' * (i % 4)}"
                               for i in range(16)])
    np.testing.assert_allclose(outs, ref, atol=1e-4)


def test_batching_service_error_propagates(engine):
    async def go():
        svc = BatchingService(engine)
        await svc.start()
        try:
            # engine.tokenize raises on non-strings inside the worker
            await svc.embed(12345)  # type: ignore[arg-type]
            return None
        except Exception as e:
            return e
        finally:
            await svc.stop()
    err = run_async(go())
    assert err is not None
    assert run_async(_svc_ok(engine))  # service still usable after error


async def _svc_ok(engine):
    svc = BatchingService(engine)
    await svc.start()
    emb = await svc.embed("hello")
    await svc.stop()
    return emb.shape == (engine.n_embd,)


def test_latency_metrics_recorded(engine):
    async def go():
        svc = BatchingService(engine, max_batch=4, max_wait_ms=10)
        await svc.start()
        await svc.embed_many(["hello world"] * 6)
        await svc.stop()
        return svc.stats.as_dict()
    stats = run_async(go())
    lat = stats["latency_ms"]
    assert lat and lat["p50"] > 0 and lat["p99"] >= lat["p50"]
    assert lat["max"] >= lat["p99"]
    assert stats["timeouts"] == 0


def test_request_timeout(engine):
    async def go():
        # scheduler never started -> requests can only time out
        svc = BatchingService(engine, request_timeout_s=0.05)
        try:
            await svc.embed("hello")
            return None
        except TimeoutError as e:
            return e, svc.stats.timeouts
    err, timeouts = run_async(go())
    assert err is not None and "timed out" in str(err)
    assert timeouts == 1


def test_tcp_protocol_reference_compat(engine):
    """Drive the TCP server with the reference sample_client.py protocol."""
    from embeddings_tpu.runtime.client import TcpClient

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            with TcpClient("127.0.0.1", port) as c:
                results["n_embd"] = c.n_embd
                results["emb1"] = c.embed("hello world")
                results["emb2"] = c.embed("the quick brown fox")

        await asyncio.to_thread(client)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    assert r["n_embd"] == engine.n_embd
    np.testing.assert_allclose(r["emb1"], engine.encode("hello world"),
                               atol=1e-5)
    np.testing.assert_allclose(r["emb2"],
                               engine.encode("the quick brown fox"),
                               atol=1e-5)


def test_http_endpoints(engine):
    pytest.importorskip("aiohttp")
    from embeddings_tpu.runtime.client import HttpClient

    async def go():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            c = HttpClient(f"http://127.0.0.1:{port}")
            results["health"] = c.healthz()
            results["one"] = c.embed("hello world")
            results["many"] = c.embed(["hello world", "test"])
            import urllib.request, urllib.error, json as j
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/embed", data=b"not json",
                    headers={"Content-Type": "application/json"})
                urllib.request.urlopen(req)
                results["bad"] = None
            except urllib.error.HTTPError as e:
                results["bad"] = e.code

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    assert r["health"]["status"] == "ok"
    assert r["one"].shape == (engine.n_embd,)
    assert r["many"].shape == (2, engine.n_embd)
    assert r["bad"] == 400
    np.testing.assert_allclose(r["one"], engine.encode("hello world"),
                               atol=1e-5)


def test_encode_more_texts_than_batch_bucket(engine):
    """encode() with a list larger than the biggest batch bucket must not
    crash (it used to raise 'value N exceeds largest bucket')."""
    texts = ["hello world"] * 40  # engine fixture max bucket = 8
    out = engine.encode(texts)
    assert out.shape == (40, engine.n_embd)


def test_utf8_incomplete_tail():
    from embeddings_tpu.runtime.server import _utf8_incomplete_tail
    full = "héllo 世界".encode("utf-8")
    assert not _utf8_incomplete_tail(full)
    assert _utf8_incomplete_tail(full[:-1])   # mid 3-byte CJK char
    assert not _utf8_incomplete_tail(b"ascii")
    assert _utf8_incomplete_tail("é".encode()[:1])
    assert not _utf8_incomplete_tail(b"")


def test_stop_waits_for_inflight_batches(engine):
    """A request already being processed when stop() is called still
    resolves with its embedding (stop awaits in-flight device batches)."""
    async def go():
        svc = BatchingService(engine, max_wait_ms=1)
        await svc.start()
        task = asyncio.create_task(svc.embed("hello world"))
        await asyncio.sleep(0.2)   # scheduler picks it up + device runs
        await svc.stop()
        return await asyncio.wait_for(task, timeout=5)
    emb = run_async(go())
    np.testing.assert_allclose(emb, engine.encode("hello world"), atol=1e-5)


def test_v1_text_starting_with_magic_not_hijacked(engine):
    """A reference-protocol client whose first TEXT happens to start with
    'ETF2' must still get a v1 embedding (frame-plausibility check)."""
    import socket as socket_mod

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            s = socket_mod.create_connection(("127.0.0.1", port), timeout=10)
            s.recv(4)
            s.sendall(b"ETF2000 report hello world")
            buf = b""
            while len(buf) < engine.n_embd * 4:
                chunk = s.recv(engine.n_embd * 4 - len(buf))
                if not chunk:
                    break
                buf += chunk
            results["emb"] = np.frombuffer(buf, np.float32).copy()
            s.close()

        await asyncio.wait_for(asyncio.to_thread(client), timeout=15)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    np.testing.assert_allclose(
        r["emb"], engine.encode("ETF2000 report hello world"), atol=1e-5)


def test_http_empty_and_bad_bodies(engine):
    pytest.importorskip("aiohttp")

    async def go():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            import urllib.request, urllib.error, json as j
            def post(data):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/embed", data=data,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=10) as resp:
                        return resp.status, j.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, None
            results["empty"] = post(b'{"texts": []}')
            results["int"] = post(b"42")
            results["list"] = post(b'["a"]')
            results["ints_in_texts"] = post(b'{"texts": [1, 2]}')

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    status, body = r["empty"]
    assert status == 200 and body["embeddings"] == []
    assert r["int"][0] == 400
    assert r["list"][0] == 400
    assert r["ints_in_texts"][0] == 400


def test_stop_fails_pending_requests(engine):
    """Requests still queued when the service stops must resolve with an
    error, not hang their clients forever."""
    async def go():
        svc = BatchingService(engine)  # scheduler never started
        task = asyncio.create_task(svc.embed("hello"))
        await asyncio.sleep(0.05)      # let it enqueue
        await svc.stop()
        try:
            await asyncio.wait_for(task, timeout=2)
            return None
        except ConnectionAbortedError as e:
            return e
    err = run_async(go())
    assert err is not None and "stopped" in str(err)


def test_tcp_v2_framing(engine):
    """Length-prefixed v2 mode: large messages (> one recv) and several
    frames coalesced into one TCP segment both work."""
    from embeddings_tpu.runtime.client import TcpClient

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            with TcpClient("127.0.0.1", port, framing="v2") as c:
                results["emb1"] = c.embed("hello world")
                # > RECV_MAX: impossible to send intact under v1 framing
                results["big"] = c.embed("hello world " * 4000)
                # two frames in one send: must yield two distinct replies
                a, b = "hello world".encode(), "test".encode()
                c.sock.sendall(struct.pack("<I", len(a)) + a +
                               struct.pack("<I", len(b)) + b)
                results["r1"] = np.frombuffer(
                    c._recv_exact(c.n_embd * 4), np.float32).copy()
                results["r2"] = np.frombuffer(
                    c._recv_exact(c.n_embd * 4), np.float32).copy()

        await asyncio.to_thread(client)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    np.testing.assert_allclose(r["emb1"], engine.encode("hello world"),
                               atol=1e-5)
    assert r["big"].shape == (engine.n_embd,)
    np.testing.assert_allclose(r["r1"], engine.encode("hello world"),
                               atol=1e-5)
    np.testing.assert_allclose(r["r2"], engine.encode("test"), atol=1e-5)


def test_tcp_v2_magic_fragmented_across_segments(engine):
    """The 4-byte ETF2 magic split across TCP reads must still select v2
    framing (and a v1 text that is a proper prefix of the magic must get
    a v1 reply after the short classification timeout)."""
    import socket as socket_mod

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            s = socket_mod.create_connection(("127.0.0.1", port), timeout=10)
            s.recv(4)  # greeting
            s.sendall(b"ET")
            import time as _t
            _t.sleep(0.05)
            payload = "hello world".encode()
            s.sendall(b"F2" + struct.pack("<I", len(payload)) + payload)
            buf = b""
            while len(buf) < engine.n_embd * 4:
                chunk = s.recv(engine.n_embd * 4 - len(buf))
                if not chunk:
                    break
                buf += chunk
            results["v2"] = np.frombuffer(buf, np.float32).copy()
            s.close()
            # v1 text "ET" alone: classified v1 after the timeout
            s = socket_mod.create_connection(("127.0.0.1", port), timeout=10)
            s.recv(4)
            s.sendall(b"ET")
            buf = b""
            while len(buf) < engine.n_embd * 4:
                chunk = s.recv(engine.n_embd * 4 - len(buf))
                if not chunk:
                    break
                buf += chunk
            results["v1_prefix"] = len(buf)
            s.close()

        await asyncio.wait_for(asyncio.to_thread(client), timeout=20)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    np.testing.assert_allclose(r["v2"], engine.encode("hello world"),
                               atol=1e-5)
    assert r["v1_prefix"] == engine.n_embd * 4


def test_tcp_truncated_utf8_tail_does_not_deadlock(engine):
    """A v1 message ending mid-multibyte-sequence with no continuation must
    get a (replacement-decoded) reply after the short reassembly timeout,
    not hang the connection."""
    import socket as socket_mod

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            s = socket_mod.create_connection(("127.0.0.1", port), timeout=10)
            s.recv(4)  # greeting
            s.sendall("hello é".encode("utf-8")[:-1])  # truncated tail
            buf = b""
            while len(buf) < engine.n_embd * 4:
                chunk = s.recv(engine.n_embd * 4 - len(buf))
                if not chunk:
                    break
                buf += chunk
            results["n"] = len(buf)
            s.close()

        await asyncio.wait_for(asyncio.to_thread(client), timeout=15)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    assert r["n"] == engine.n_embd * 4


def test_packed_requires_mean_or_cls_pooling(engine):
    import dataclasses
    bad = Engine(P.init_params(engine.config, rng=0),
                 dataclasses.replace(engine.config, pooling="max"),
                 engine.tokenizer, engine.engine_config)
    with pytest.raises(ValueError, match="packed"):
        BatchingService(bad, packed=True)


def test_batching_service_packed(engine):
    async def go():
        svc = BatchingService(engine, max_batch=8, max_wait_ms=50,
                              packed=True)
        await svc.start()
        texts = [f"hello world {'a ' * (i % 4)}" for i in range(12)]
        outs = await svc.embed_many(texts)
        # micro-batch (light load): routed to the bucketed path
        single = await svc.embed("hello world")
        await svc.stop()
        return outs, single
    outs, single = run_async(go())
    ref = engine.encode_batch([f"hello world {'a ' * (i % 4)}"
                               for i in range(12)])
    cos = (outs * ref).sum(-1)
    assert cos.min() > 0.9999, cos.min()
    np.testing.assert_allclose(single, engine.encode("hello world"),
                               atol=1e-5)


def test_bare_etf2_idle_commits_to_v2(engine):
    """A connection whose first message is exactly the bare 'ETF2' magic
    followed by idle time must still be v2: older v2 clients send the
    magic at connect and may idle before their first frame — classifying
    them as v1 would silently desync their stream (wrong embeddings).
    The literal v1 text 'ETF2' is reserved. A late length-prefixed frame
    must round-trip correctly."""
    import socket

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]
        results = {}

        def client():
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=15) as s:
                n_embd = struct.unpack("<i", s.recv(4))[0]
                s.sendall(b"ETF2")          # bare magic at connect
                import time
                time.sleep(1.5)             # idle past handshake window
                payload = "hello world".encode()
                s.sendall(struct.pack("<I", len(payload)) + payload)
                buf = b""
                while len(buf) < n_embd * 4:
                    chunk = s.recv(n_embd * 4 - len(buf))
                    if not chunk:
                        break
                    buf += chunk
                results["emb"] = np.frombuffer(buf, np.float32).copy()

        await asyncio.to_thread(client)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return results

    r = run_async(go())
    np.testing.assert_allclose(r["emb"], engine.encode("hello world"),
                               atol=1e-5)


def test_http_engine_failure_returns_json_500(engine):
    """Non-timeout engine failures keep the JSON error contract (not
    aiohttp's default HTML 500)."""
    pytest.importorskip("aiohttp")

    async def go():
        svc = BatchingService(engine)
        svc._encode_batch_counted = lambda texts: (_ for _ in ()).throw(
            RuntimeError("device exploded"))
        from embeddings_tpu.runtime.server import serve_http
        runner, svc2 = await serve_http(svc, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            import urllib.request, urllib.error, json as j
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/embed",
                data=b'{"texts": ["boom"]}',
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    results["status"] = resp.status
            except urllib.error.HTTPError as e:
                results["status"] = e.code
                results["body"] = j.loads(e.read())

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    assert r["status"] == 500
    assert "device exploded" in r["body"]["error"]


def test_stats_tokens_counted_without_retokenizing(engine, monkeypatch):
    """The tokens stat must come from the batch's own tokenization — one
    tokenize() call per text total, not a second pass for stats."""
    calls = []
    orig = engine.tokenize
    monkeypatch.setattr(engine, "tokenize",
                        lambda t: (calls.append(t), orig(t))[1])

    async def go():
        svc = BatchingService(engine, max_batch=8, max_wait_ms=20)
        await svc.start()
        await svc.embed_many(["hello world"] * 6)
        await svc.stop()
        return svc.stats

    stats = run_async(go())
    assert len(calls) == 6
    assert stats.tokens == sum(len(engine.tokenize(t))
                               for t in ["hello world"] * 6)


def test_openai_compatible_embeddings_endpoint(engine):
    """POST /v1/embeddings speaks the OpenAI embeddings contract
    (object/data/index/usage), for both str and list inputs, with the
    OpenAI error envelope on bad requests."""
    pytest.importorskip("aiohttp")
    from embeddings_tpu.runtime.server import serve_http

    async def go():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            import urllib.request, urllib.error, json as j
            def post(data):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/embeddings", data=data,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=10) as resp:
                        return resp.status, j.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, j.loads(e.read())
            results["single"] = post(j.dumps(
                {"input": "hello world", "model": "m"}).encode())
            results["batch"] = post(j.dumps(
                {"input": ["hello world", "hello"]}).encode())
            results["bad"] = post(b'{"no_input": 1}')

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    status, body = r["single"]
    assert status == 200 and body["object"] == "list"
    assert len(body["data"]) == 1
    assert body["data"][0]["object"] == "embedding"
    np.testing.assert_allclose(np.asarray(body["data"][0]["embedding"]),
                               engine.encode("hello world"), atol=1e-5)
    assert body["usage"]["prompt_tokens"] == len(
        engine.tokenize("hello world"))
    status, body = r["batch"]
    assert status == 200 and [d["index"] for d in body["data"]] == [0, 1]
    status, body = r["bad"]
    assert status == 400 and body["error"]["type"] == "invalid_request_error"


def test_tcp_adversarial_first_bytes_never_wedge(engine):
    """Arbitrary/hostile first messages (binary garbage, magic prefixes,
    insane v2 length prefixes, immediate close) must leave the server
    alive and responsive to a fresh well-formed v1 client."""
    import socket

    adversarial = [
        b"\x00\x01\x02\x03binary\xff\xfe",
        b"E",                               # prefix of the magic, then EOF
        b"ETF",
        b"ETF2" + struct.pack("<I", 0xFFFFFFFF),  # insane v2 length
        b"ETF2zz",                          # magic + <4 junk bytes
        b"",                                # connect then close
    ]

    async def go():
        server, svc = await serve_tcp(engine, host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]

        def hostile(payload):
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=10) as s:
                s.recv(4)
                if payload:
                    s.sendall(payload)
                s.settimeout(3.0)
                try:
                    while s.recv(4096):
                        pass            # drain whatever comes back
                except socket.timeout:
                    pass                # server may keep waiting: fine

        def wellformed():
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=10) as s:
                n = struct.unpack("<i", s.recv(4))[0]
                s.sendall("hello world".encode())
                buf = b""
                while len(buf) < n * 4:
                    chunk = s.recv(n * 4 - len(buf))
                    if not chunk:
                        break
                    buf += chunk
                return np.frombuffer(buf, np.float32).copy()

        for payload in adversarial:
            await asyncio.to_thread(hostile, payload)
        emb = await asyncio.to_thread(wellformed)
        server.close()
        await server.wait_closed()
        await svc.stop()
        return emb

    emb = run_async(go())
    np.testing.assert_allclose(emb, engine.encode("hello world"),
                               atol=1e-5)


def test_openai_base64_and_dimensions(engine):
    """encoding_format=base64 (the OpenAI python SDK's default request)
    returns base64 little-endian f32; dimensions truncates and
    re-normalizes (Matryoshka semantics)."""
    pytest.importorskip("aiohttp")
    import base64
    from embeddings_tpu.runtime.server import serve_http

    async def go():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            import urllib.request, urllib.error, json as j
            def post(data):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/embeddings", data=data,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=10) as resp:
                        return resp.status, j.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, j.loads(e.read())
            results["b64"] = post(j.dumps(
                {"input": "hello world",
                 "encoding_format": "base64"}).encode())
            results["dims"] = post(j.dumps(
                {"input": "hello world", "dimensions": 16}).encode())
            results["bad_dims"] = post(j.dumps(
                {"input": "x", "dimensions": 10**6}).encode())
            results["bad_fmt"] = post(j.dumps(
                {"input": "x", "encoding_format": "hex"}).encode())

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    ref = engine.encode("hello world")
    status, body = r["b64"]
    assert status == 200
    raw = base64.b64decode(body["data"][0]["embedding"])
    np.testing.assert_allclose(np.frombuffer(raw, "<f4"), ref, atol=1e-5)
    status, body = r["dims"]
    assert status == 200
    got = np.asarray(body["data"][0]["embedding"], np.float32)
    assert got.shape == (16,)
    want = ref[:16] / np.linalg.norm(ref[:16])
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert r["bad_dims"][0] == 400 and r["bad_fmt"][0] == 400


@pytest.fixture(scope="module")
def reranker_engine(small_vocab):
    """Engine with a random classification head (rerank surface)."""
    import jax.numpy as jnp
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    params = P.init_params(cfg, rng=0)
    rng = np.random.default_rng(0)
    params["cls_head"] = {
        "pooler": {"w": jnp.asarray(rng.standard_normal((64, 64)) * 0.05,
                                    jnp.float32),
                   "b": jnp.zeros(64, jnp.float32)},
        "out": {"w": jnp.asarray(rng.standard_normal((64, 1)) * 0.05,
                                 jnp.float32),
                "b": jnp.zeros(1, jnp.float32)},
    }
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=8,
                      batch_buckets=(1, 2, 4, 8))
    return Engine(params, cfg, tok, ec)


def test_http_rerank(reranker_engine, engine):
    pytest.importorskip("aiohttp")
    import urllib.request
    import urllib.error
    import json as j

    def post(port, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rerank",
            data=j.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, j.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, j.loads(e.read())

    async def go():
        runner, svc = await serve_http(reranker_engine, host="127.0.0.1",
                                       port=0)
        port = runner.addresses[0][1]
        results = {}

        def client():
            results["ok"] = post(port, {
                "query": "hello world",
                "documents": ["hello world", "water fire", "hello"],
                "return_documents": True})
            results["topn"] = post(port, {
                "query": "hello", "documents": ["a", "b", "c"],
                "top_n": 2})
            results["bad"] = post(port, {"query": "x"})

        await asyncio.to_thread(client)
        await runner.cleanup()
        await svc.stop()
        return results

    r = run_async(go())
    code, body = r["ok"]
    assert code == 200 and len(body["results"]) == 3
    scores = [x["relevance_score"] for x in body["results"]]
    assert scores == sorted(scores, reverse=True)
    assert body["results"][0]["document"] in ("hello world", "water fire",
                                              "hello")
    ref = reranker_engine.rerank("hello world",
                                 ["hello world", "water fire", "hello"])
    by_index = {x["index"]: x["relevance_score"] for x in body["results"]}
    for i, s in enumerate(ref):
        assert abs(by_index[i] - float(s)) < 1e-4
    code2, body2 = r["topn"]
    assert code2 == 200 and len(body2["results"]) == 2
    assert "document" not in body2["results"][0]
    assert r["bad"][0] == 400

    # an embedding-only engine refuses politely
    async def go2():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        out = await asyncio.to_thread(
            post, port, {"query": "x", "documents": ["y"]})
        await runner.cleanup()
        await svc.stop()
        return out
    code3, body3 = run_async(go2())
    assert code3 == 400 and "classification head" in body3["error"]
