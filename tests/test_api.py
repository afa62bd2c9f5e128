"""HTTP API tests: route/payload parity, zstd middleware, chat streaming,
error semantics. Runs the real aiohttp app against the engine with the
word-hash embedder."""
import asyncio
import json

import aiohttp
import pytest
from aiohttp import web

from vectorsearch_tpu import constants
from vectorsearch_tpu.api import build_app
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.store import Store
from vectorsearch_tpu.store.db import compress, decompress

from test_engine import FRUIT_DOCS, WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


@pytest.fixture
def engine():
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    yield eng
    eng.close()
    store.close()


class Client:
    """Thin client against the production-configured AppRunner."""

    def __init__(self, session: aiohttp.ClientSession, base: str):
        self.session = session
        self.base = base

    def make_url(self, path: str) -> str:
        return self.base + path

    def request(self, method, path, **kw):
        return self.session.request(method, self.make_url(path), **kw)

    def post(self, path, **kw):
        return self.session.post(self.make_url(path), **kw)

    def get(self, path, **kw):
        return self.session.get(self.make_url(path), **kw)

    def put(self, path, **kw):
        return self.session.put(self.make_url(path), **kw)


def run(engine, coro_fn):
    async def runner():
        app = build_app(engine)
        # production config: zstd handled by app middleware, not the parser
        app_runner = web.AppRunner(
            app, auto_decompress=False, handler_cancellation=True
        )
        await app_runner.setup()
        site = web.TCPSite(app_runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        async with aiohttp.ClientSession() as session:
            client = Client(session, f"http://127.0.0.1:{port}")
            try:
                return await coro_fn(client)
            finally:
                await app_runner.cleanup()

    return asyncio.run(runner())


def test_upload_then_search(engine):
    async def flow(client):
        r = await client.post(
            "/api/upload",
            json={"owner": "a", "category": "c", "documents": FRUIT_DOCS},
        )
        assert r.status == 200
        up = await r.json()
        assert len(up["document_ids"]) == 3

        r = await client.post(
            "/api/search",
            json={"owner": "a", "category": "c", "text": "banana tropical", "count": 2},
        )
        assert r.status == 200
        res = await r.json()
        assert res["documents"][0]["name"] == "bananas"
        assert res["documents"][0]["document_id"] == up["document_ids"][1]
        assert 0 < res["documents"][0]["document_similarity"] <= 1.01
        return None

    run(engine, flow)


def test_method_not_allowed(engine):
    async def flow(client):
        r = await client.put("/api/upload", json={})
        assert r.status == 405
        assert r.headers["Allow"] == "POST"
        body = await r.json()
        assert "error" in body

    run(engine, flow)


def test_bad_json(engine):
    async def flow(client):
        r = await client.post("/api/search", data=b"{not json")
        assert r.status == 400

    run(engine, flow)


def test_upload_empty_documents_is_400(engine):
    async def flow(client):
        r = await client.post(
            "/api/upload", json={"owner": "a", "category": "c", "documents": []}
        )
        assert r.status == 400

    run(engine, flow)


def test_zstd_request_and_response(engine):
    async def flow(client):
        import aiohttp

        payload = compress(
            json.dumps(
                {"owner": "a", "category": "c", "documents": FRUIT_DOCS}
            ).encode()
        )
        # raw session: aiohttp's default client auto-decompresses and has no
        # zstd codec, so read the wire bytes ourselves
        url = client.make_url("/api/upload")
        async with aiohttp.ClientSession(auto_decompress=False) as sess:
            async with sess.post(
                url,
                data=payload,
                headers={"Content-Encoding": "zstd", "Accept-Encoding": "zstd"},
            ) as r:
                assert r.status == 200
                raw = await r.read()
                # small responses skip compression; decode accordingly
                if r.headers.get("Content-Encoding") == "zstd":
                    raw = decompress(raw)
            assert len(json.loads(raw)["document_ids"]) == 3

            # a search response is large enough to come back compressed
            async with sess.post(
                client.make_url("/api/search"),
                json={"owner": "a", "category": "c", "text": "banana", "count": 3},
                headers={"Accept-Encoding": "zstd"},
            ) as r:
                assert r.status == 200
                assert r.headers.get("Content-Encoding") == "zstd"
                res = json.loads(decompress(await r.read()))
        assert res["documents"]

    run(engine, flow)


def test_categories_and_deletes(engine):
    async def flow(client):
        await client.post(
            "/api/upload",
            json={"owner": "a", "category": "c1", "documents": FRUIT_DOCS[:1]},
        )
        await client.post(
            "/api/upload",
            json={"owner": "a", "category": "c2", "documents": FRUIT_DOCS[1:2]},
        )
        r = await client.post("/api/categories", json={"owner": "a"})
        assert (await r.json())["category_names"] == ["c1", "c2"]

        r = await client.post(
            "/api/delete/category", json={"owner": "a", "category": "c1"}
        )
        assert r.status == 200 and (await r.json()) == {}
        r = await client.post("/api/categories", json={"owner": "a"})
        assert (await r.json())["category_names"] == ["c2"]

        r = await client.post("/api/delete/owner", json={"owner": "a"})
        assert r.status == 200
        r = await client.post("/api/categories", json={"owner": "a"})
        assert (await r.json())["category_names"] == []

    run(engine, flow)


def test_delete_document_route(engine):
    async def flow(client):
        r = await client.post(
            "/api/upload",
            json={"owner": "a", "category": "c", "documents": FRUIT_DOCS},
        )
        ids = (await r.json())["document_ids"]
        r = await client.post(
            "/api/delete/document",
            json={"owner": "a", "category": "c", "document_id": ids[0]},
        )
        assert r.status == 200
        r = await client.post(
            "/api/search",
            json={"owner": "a", "category": "c", "text": "apple orchard", "count": 3},
        )
        docs = (await r.json())["documents"]
        assert all(d["document_id"] != ids[0] for d in docs)

    run(engine, flow)


def test_chat_stream(engine):
    async def flow(client):
        r = await client.post("/api/chat", json={"text": "hello"})
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = await r.text()
        assert body == "chat reply"

    run(engine, flow)


def test_static_pages(engine):
    async def flow(client):
        for path in ("/", "/api", "/api/openapi.yml"):
            r = await client.get(path)
            assert r.status == 200, path

    run(engine, flow)


def test_api_console_covers_every_openapi_path(engine):
    """The /api page is an interactive console (reference embeds Swagger
    UI, static/static.go:5): every path documented in openapi.yml must be
    present in its ENDPOINTS table with an Execute wiring (no JS runtime
    in this image — structural check, same strategy as test_doctools)."""
    import re

    async def flow(client):
        html = await (await client.get("/api")).text()
        yml = await (await client.get("/api/openapi.yml")).text()
        spec_paths = re.findall(r"^  (/api/\S+):", yml, re.M)
        assert spec_paths, "openapi.yml paths parse"
        for p in spec_paths:
            assert f'path: "{p}"' in html, f"{p} missing from console"
        # executable wiring: fetch(ep.path), Execute button, JSON editor,
        # and a streaming reader for /api/chat
        for needle in (
            "fetch(ep.path", "Execute", "textarea", "getReader()",
            "stream: true",
        ):
            assert needle in html, needle
        # console endpoint count matches the spec exactly (a new route
        # must be added to BOTH)
        assert len(re.findall(r'path: "/api/', html)) == len(spec_paths)

    run(engine, flow)


def test_wasm_headers_on_every_route(engine):
    """COOP/COEP on all responses (reference main.go:117-125) — required
    for the UI's WASM/SharedArrayBuffer document parsing."""

    async def flow(client):
        for path in ("/", "/api/stats", "/api/openapi.yml"):
            r = await client.get(path)
            assert r.headers["Cross-Origin-Opener-Policy"] == "same-origin"
            assert r.headers["Cross-Origin-Embedder-Policy"] == "require-corp"
        r = await client.post("/api/search", json={"owner": "a", "category": "c", "text": "x"})
        assert r.headers["Cross-Origin-Opener-Policy"] == "same-origin"

    run(engine, flow)


def test_static_zstd_compression(engine):
    """The static route compresses like the reference's '/' FileServer
    wrap (main.go:178)."""
    import zstandard

    async def flow(client):
        r = await client.get(
            "/", headers={"Accept-Encoding": "zstd"}, auto_decompress=False
        )
        assert r.headers.get("Content-Encoding") == "zstd"
        raw = await r.read()
        html = zstandard.ZstdDecompressor().decompress(raw)
        assert b"<html" in html or b"<!doctype" in html.lower()

    run(engine, flow)


def test_search_via_get(engine):
    async def flow(client):
        # reference allows GET on /api/search (server/search.go:52)
        r = await client.request(
            "GET",
            "/api/search",
            json={"owner": "a", "category": "c", "text": "x"},
        )
        assert r.status == 200
        assert (await r.json()) == {"documents": []}

    run(engine, flow)


def test_delete_rejects_get(engine):
    async def flow(client):
        r = await client.get("/api/delete/owner")
        assert r.status == 405

    run(engine, flow)


def test_chat_with_inline_documents(engine):
    async def flow(client):
        r = await client.post(
            "/api/chat",
            json={"text": "q", "documents": [{"inline": "doc"}]},
        )
        assert r.status == 200
        assert (await r.text()) == "chat reply"
        # engine received the flattened inline doc in the prompt
        final = engine.ai.chat_calls[-1][-1]["content"]
        assert "inline: doc." in final

    run(engine, flow)


def test_client_disconnect_cancels_engine(engine):
    """A client that disconnects mid-request must make the engine abort
    between stages instead of finishing work for nobody (reference checks
    ctx.Err() at every stage, server/search.go:86-91)."""
    import threading

    engine.upload("alice", "docs", FRUIT_DOCS)
    d0 = engine._batcher.stats()["dispatches"]

    embed_entered = threading.Event()
    release_embed = threading.Event()
    aborted = {}

    class SlowEmbedAI(WordHashAI):
        def embed(self, inputs, model=None):
            out = super().embed(inputs, model)
            if any("search_query" in s for s in inputs):
                embed_entered.set()
                release_embed.wait(5)  # hold until the client disconnects
            return out

    real_search = type(engine).search

    engine.ai = SlowEmbedAI()

    async def scenario(client):
        loop = asyncio.get_running_loop()
        task = asyncio.ensure_future(
            client.post("/api/search", json={
                "owner": "alice", "category": "docs", "text": "banana",
            })
        )
        await loop.run_in_executor(None, embed_entered.wait, 5)
        task.cancel()  # client goes away mid-embed
        try:
            await task
        except (asyncio.CancelledError, aiohttp.ClientError):
            pass
        # let the connection teardown reach the handler task (which sets
        # the engine's cancel token) BEFORE the embed returns
        await asyncio.sleep(0.3)
        release_embed.set()
        # give the executor thread a moment to hit the cancel check
        await asyncio.sleep(0.5)
        return None

    try:
        run(engine, scenario)
    finally:
        engine.ai = WordHashAI()
        release_embed.set()
    # the engine never dispatched to the device for the dead client
    assert engine._batcher.stats()["dispatches"] == d0


def test_batch_search_route(engine):
    async def flow(client):
        r = await client.post(
            "/api/upload",
            json={"owner": "a", "category": "c", "documents": FRUIT_DOCS},
        )
        up = await r.json()

        r = await client.post(
            "/api/search",
            json={
                "owner": "a", "category": "c",
                "texts": ["banana tropical", "gearbox road"], "count": 2,
            },
        )
        assert r.status == 200
        res = await r.json()
        assert len(res["results"]) == 2
        assert res["results"][0]["documents"][0]["name"] == "bananas"
        assert (
            res["results"][0]["documents"][0]["document_id"]
            == up["document_ids"][1]
        )
        assert res["results"][1]["documents"][0]["name"] == "cars"
        # full document payloads by default
        assert res["results"][0]["documents"][0]["document"] == {
            "text": "banana plantation tropical fruit"
        }

        # ids-only variant skips document payloads
        r = await client.post(
            "/api/search",
            json={
                "owner": "a", "category": "c",
                "texts": ["banana tropical"], "count": 2,
                "include_documents": False,
            },
        )
        res = await r.json()
        doc = res["results"][0]["documents"][0]
        assert doc["document"] is None
        assert doc["name"] == ""
        assert doc["document_id"] == up["document_ids"][1]
        assert 0 < doc["document_similarity"] <= 1.01

        # empty texts list -> empty results, not an error
        r = await client.post(
            "/api/search",
            json={"owner": "a", "category": "c", "texts": []},
        )
        assert r.status == 200
        assert (await r.json())["results"] == []

    run(engine, flow)
