"""Client SDK against a live server (the full stack in one process)."""
import threading

import pytest
from aiohttp import web

from vectorsearch_tpu import constants
from vectorsearch_tpu.api import build_app
from vectorsearch_tpu.client import Client, ClientError
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.store import Store

from test_engine import FRUIT_DOCS, WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


@pytest.fixture
def server():
    import asyncio

    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    app = build_app(eng)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    state = {}

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            runner = web.AppRunner(app, auto_decompress=False)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = site._server.sockets[0].getsockname()[1]
            state["runner"] = runner
            started.set()

        loop.run_until_complete(main())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(10)
    yield f"http://127.0.0.1:{state['port']}"
    asyncio.run_coroutine_threadsafe(state["runner"].cleanup(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)
    eng.close()
    store.close()


def test_client_full_flow(server):
    c = Client(server)
    ids = c.upload("o", "c", FRUIT_DOCS)
    assert len(ids) == 3

    hits = c.search("o", "c", "banana tropical", count=2)
    assert hits[0]["name"] == "bananas"
    assert hits[0]["document_id"] == ids[1]

    assert c.category_names("o") == ["c"]

    reply = "".join(c.chat("what?", document_ids=[ids[0]]))
    assert reply == "chat reply"

    c.delete_document("o", "c", ids[0])
    hits = c.search("o", "c", "apple orchard", count=3, centroids=-1)
    assert all(h["document_id"] != ids[0] for h in hits)

    stats = c.stats()
    assert "categories" in stats

    c.delete_owner("o")
    assert c.category_names("o") == []


def test_client_zstd_roundtrip(server):
    c = Client(server, use_zstd=True)
    ids = c.upload("z", "c", FRUIT_DOCS)
    hits = c.search("z", "c", "gearbox road", count=1)
    assert hits[0]["name"] == "cars"


def test_client_error_surface(server):
    c = Client(server)
    with pytest.raises(ClientError) as e:
        c.upload("o", "c", [])
    assert e.value.status == 400
