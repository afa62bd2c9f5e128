"""HTTP/2 TLS listener (api/h2.py) driven by a REAL h2 client: the
system curl (nghttp2-backed), which huffman-encodes headers and runs the
full preface/SETTINGS/flow-control handshake — an authoritative
interoperability check for the hand-rolled framing + ctypes HPACK."""
import asyncio
import json
import socket
import subprocess
import threading

import pytest

from vectorsearch_tpu.api.h2 import hpack_available
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.store import Store

from test_engine import WordHashAI

pytestmark = pytest.mark.skipif(
    not hpack_available(), reason="libnghttp2 not present"
)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def h2_server():
    from aiohttp import web

    from vectorsearch_tpu.api import TLSManager, build_app
    from vectorsearch_tpu.api.h2 import serve_tls_mux
    from vectorsearch_tpu.config import TLSConfig

    store = Store(":memory:")
    engine = Engine(store, WordHashAI(), cache=EngineCache(ttl=60.0))
    engine.upload(
        "o", "c",
        [{"name": "a", "document": {"text": "alpha particle physics"}},
         {"name": "b", "document": {"text": "bravo marching band"}}],
    )
    http_port, tls_port = _free_port(), _free_port()
    loop = asyncio.new_event_loop()
    ready = threading.Event()
    state = {}

    async def boot():
        app = build_app(engine)
        runner = web.AppRunner(app, auto_decompress=False)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", http_port)
        await site.start()
        tls = TLSManager(TLSConfig())
        server = await serve_tls_mux(
            "127.0.0.1", tls_port, tls.context(), ("127.0.0.1", http_port)
        )
        state.update(runner=runner, server=server, tls=tls)
        ready.set()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(boot())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(30)
    yield f"https://127.0.0.1:{tls_port}"

    async def shutdown():
        state["server"].close()
        await state["server"].wait_closed()
        await state["server"]._vstpu_session.close()
        await state["runner"].cleanup()

    asyncio.run_coroutine_threadsafe(shutdown(), loop).result(timeout=10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)
    engine.close()
    store.close()


def _curl(url, *args, timeout=30):
    out = subprocess.run(
        ["curl", "-sk", "-w", "\n%{http_version} %{http_code}", *args, url],
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr
    body, _, tail = out.stdout.rpartition("\n")
    version, code = tail.split()
    return body, version, int(code)


def test_h2_search_roundtrip(h2_server):
    body, version, code = _curl(
        h2_server + "/api/search", "--http2",
        "-X", "POST",
        "-d", '{"owner":"o","category":"c","text":"alpha particle","count":1,"centroids":-1}',
    )
    assert version == "2" and code == 200
    docs = json.loads(body)["documents"]
    assert docs and docs[0]["name"] == "a"


def test_h2_upload_then_search(h2_server):
    body, version, code = _curl(
        h2_server + "/api/upload", "--http2",
        "-X", "POST",
        "-d", '{"owner":"o","category":"c","documents":[{"name":"h2doc","document":{"text":"zulu quantum leap"}}]}',
    )
    assert version == "2" and code == 200
    assert json.loads(body)["document_ids"]
    body, version, code = _curl(
        h2_server + "/api/search", "--http2",
        "-X", "POST",
        "-d", '{"owner":"o","category":"c","text":"zulu quantum leap","count":1,"centroids":-1}',
    )
    assert version == "2"
    assert json.loads(body)["documents"][0]["name"] == "h2doc"


def test_h2_wasm_headers_and_static(h2_server):
    out = subprocess.run(
        ["curl", "-sk", "--http2", "-D-", "-o", "/dev/null", h2_server + "/"],
        capture_output=True, text=True, timeout=30,
    )
    head = out.stdout.lower()
    assert "http/2 200" in head
    assert "cross-origin-opener-policy: same-origin" in head


def test_h2_chat_stream(h2_server):
    body, version, code = _curl(
        h2_server + "/api/chat", "--http2",
        "-X", "POST", "-d", '{"text":"hello"}',
    )
    assert version == "2" and code == 200
    assert body  # WordHashAI streams a reply


def test_http11_pipe_still_serves(h2_server):
    body, version, code = _curl(
        h2_server + "/api/categories", "--http1.1",
        "-X", "POST", "-d", '{"owner":"o"}',
    )
    assert version == "1.1" and code == 200
    assert json.loads(body) == {"category_names": ["c"]}


# ---- unit-level framing tests (no TLS server; drive _frame directly) ----


class _StubWriter:
    def __init__(self):
        self.sent = bytearray()

    def write(self, data):
        self.sent.extend(data)

    async def drain(self):
        pass

    def close(self):
        pass


def _conn_and_codec():
    from vectorsearch_tpu.api.h2 import H2Connection, HpackCodec

    conn = H2Connection(None, _StubWriter(), ("127.0.0.1", 1), session=None)
    dispatched = []
    conn._dispatch = lambda st: dispatched.append(st)
    return conn, HpackCodec(), dispatched


def _req_block(codec, extra=()):
    return codec.encode(
        [(b":method", b"POST"), (b":path", b"/api/search"),
         (b":scheme", b"https"), (b":authority", b"t"), *extra]
    )


def test_h2_trailers_end_stream_dispatches():
    """END_STREAM riding the trailer HEADERS must dispatch the request
    (previously the stream hung forever)."""
    from vectorsearch_tpu.api import h2 as h2mod

    async def run():
        conn, codec, dispatched = _conn_and_codec()
        await conn._frame(
            h2mod.HEADERS, h2mod.FLAG_END_HEADERS, 1, _req_block(codec)
        )
        await conn._frame(h2mod.DATA, 0, 1, b'{"x":1}')
        trailer = codec.encode([(b"x-checksum", b"abc")])
        await conn._frame(
            h2mod.HEADERS,
            h2mod.FLAG_END_HEADERS | h2mod.FLAG_END_STREAM, 1, trailer,
        )
        assert len(dispatched) == 1
        assert bytes(dispatched[0].body) == b'{"x":1}'
        assert dispatched[0].end_stream

    asyncio.run(run())


def test_h2_oversize_body_reset_not_dispatched(monkeypatch):
    """A body over MAX_BODY draws RST_STREAM and must NOT dispatch."""
    from vectorsearch_tpu.api import h2 as h2mod

    monkeypatch.setattr(h2mod, "MAX_BODY", 8)

    async def run():
        conn, codec, dispatched = _conn_and_codec()
        await conn._frame(
            h2mod.HEADERS, h2mod.FLAG_END_HEADERS, 1, _req_block(codec)
        )
        await conn._frame(
            h2mod.DATA, h2mod.FLAG_END_STREAM, 1, b"0123456789abcdef"
        )
        assert dispatched == []
        assert 1 not in conn.streams

    asyncio.run(run())


def test_h2_oversize_reset_replenishes_connection_window(monkeypatch):
    """The reset path must still replenish the CONNECTION window (else it
    leaks and eventually wedges every stream), and a trailer arriving for
    the reset stream must not create a ghost stream or dispatch."""
    from vectorsearch_tpu.api import h2 as h2mod

    monkeypatch.setattr(h2mod, "MAX_BODY", 8)

    async def run():
        conn, codec, dispatched = _conn_and_codec()
        sent = []
        orig_send = conn._send

        async def record(ftype, flags, sid, payload=b""):
            sent.append((ftype, sid))
            await orig_send(ftype, flags, sid, payload)

        conn._send = record
        await conn._frame(
            h2mod.HEADERS, h2mod.FLAG_END_HEADERS, 1, _req_block(codec)
        )
        await conn._frame(h2mod.DATA, 0, 1, b"0123456789abcdef")
        assert (h2mod.RST_STREAM, 1) in sent
        assert (h2mod.WINDOW_UPDATE, 0) in sent  # connection replenished
        assert (h2mod.WINDOW_UPDATE, 1) not in sent  # stream is dead
        # trailers for the reset stream: HPACK consumed, nothing revived
        trailer = codec.encode([(b"x-sum", b"1")])
        await conn._frame(
            h2mod.HEADERS,
            h2mod.FLAG_END_HEADERS | h2mod.FLAG_END_STREAM, 1, trailer,
        )
        assert 1 not in conn.streams
        assert dispatched == []

    asyncio.run(run())


def test_h2_cookie_crumbs_rejoined():
    """Split cookie fields (RFC 7540 8.1.2.5) rejoin with '; ' for h1."""
    from vectorsearch_tpu.api import h2 as h2mod

    captured = {}

    class _FakeResp:
        status = 200
        headers = {}

        class content:
            @staticmethod
            async def iter_any():
                return
                yield  # pragma: no cover

    class _FakeCtx:
        async def __aenter__(self):
            return _FakeResp()

        async def __aexit__(self, *a):
            return False

    class _FakeSession:
        def request(self, method, url, **kw):
            captured.update(kw)
            return _FakeCtx()

    async def run():
        conn, codec, _ = _conn_and_codec()
        conn.session = _FakeSession()
        block = _req_block(
            codec, extra=[(b"cookie", b"a=1"), (b"cookie", b"b=2")]
        )
        await conn._frame(
            h2mod.HEADERS,
            h2mod.FLAG_END_HEADERS | h2mod.FLAG_END_STREAM, 1, block,
        )
        # _conn_and_codec stubs _dispatch; run the handler directly
        st = conn.streams[1]
        await conn._handle(st)
        assert captured["headers"]["cookie"] == "a=1; b=2"

    asyncio.run(run())


def test_h2_concurrent_streams(h2_server):
    import concurrent.futures as cf

    def one(i):
        body, version, code = _curl(
            h2_server + "/api/search", "--http2",
            "-X", "POST",
            "-d", '{"owner":"o","category":"c","text":"bravo marching","count":1,"centroids":-1}',
        )
        return version == "2" and code == 200 and json.loads(body)["documents"][0]["name"] == "b"

    with cf.ThreadPoolExecutor(8) as ex:
        assert all(ex.map(one, range(16)))
