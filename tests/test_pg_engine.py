"""Two Engine instances sharing one (mock) Postgres store.

VERDICT r3 next-step #8: the cross-host coordination that
tests/test_remote_store.py proves over the RemoteStore HTTP path must
also hold over the pgwire path — the reference's actual production
topology (database/database.go:86-103 + server/centroids.go:33-52:
several app instances, one Postgres, SHARE-NOWAIT-style build locks).

MockPg answers from a REAL shared sqlite database (pg_mock.SqliteBackend)
so both engines see genuine SQL semantics: RETURNING ids, ON CONFLICT
build-lock contention, cascading deletes, cross-connection visibility.
"""
import threading

import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.store.pg import PgStore

from pg_mock import MockPg, SqliteBackend
from test_engine import FRUIT_DOCS, WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


@pytest.fixture()
def shared_pg():
    """One mock Postgres with a real-SQL backend; callers connect N
    PgStores to it (one per 'application host')."""
    mock = MockPg(backend=SqliteBackend())
    yield mock
    mock.close()


def test_pgstore_real_sql_roundtrip(shared_pg):
    """The sqlite-backed mock supports the full Store surface end-to-end
    (same assertions as the RemoteStore API roundtrip)."""
    store = PgStore([shared_pg.dsn])
    owner = store.get_or_create_owner("alice")
    assert store.get_or_create_owner("alice").id == owner.id  # idempotent
    cat = store.get_or_create_category(owner.id, "docs")
    cent_id = store.create_centroid(cat.id, b"\x01\x02\x03")
    doc_ids, emb_ids = store.insert_documents_with_embeddings(
        cat.id,
        [("doc-a", "ext-1", {"text": "hello", "n": 3})],
        [[(b"\x09" * 16, cent_id)]],
    )
    assert doc_ids and emb_ids
    docs = store.fetch_documents(doc_ids)
    assert docs[0].document == {"text": "hello", "n": 3}
    assert docs[0].external_id == "ext-1"
    assert store.centroids(cat.id)[0].vector == b"\x01\x02\x03"
    assert store.count_embeddings(cat.id) == 1
    assert store.max_embedding_id(cat.id) == emb_ids[0]
    assert store.embedding_doc_map(cat.id) == {emb_ids[0]: doc_ids[0]}
    pages = list(store.iter_embeddings(cat.id, batch=10))
    assert pages == [[(emb_ids[0], b"\x09" * 16, doc_ids[0], cent_id)]]
    # replace_centroids exercises the VALUES-join UPDATE translation
    new_ids = store.replace_centroids(
        cat.id, [b"\x05\x06"], {emb_ids[0]: 0}
    )
    assert len(new_ids) == 1
    cents = store.centroids(cat.id)
    assert [c.id for c in cents] == new_ids
    assert store.embedding_doc_map(cat.id) == {emb_ids[0]: doc_ids[0]}
    # cascading delete: document -> embeddings
    store.delete_document(cat.id, doc_ids[0])
    assert store.count_embeddings(cat.id) == 0
    store.close()


def test_build_lock_contention_across_stores(shared_pg):
    """Two stores (two app hosts) contend on the SQL build lock: exactly
    one wins; stale locks expire."""
    a = PgStore([shared_pg.dsn])
    b = PgStore([shared_pg.dsn], migrate=False)
    assert a.try_acquire_build_lock(7, "host-a") is True
    assert b.try_acquire_build_lock(7, "host-b") is False
    a.release_build_lock(7, "host-a")
    assert b.try_acquire_build_lock(7, "host-b") is True
    b.release_build_lock(7, "host-b")
    a.close()
    b.close()


def test_two_engines_share_pgstore(shared_pg, monkeypatch):
    """Engine A uploads; engine B (separate PgStore connection — a
    different 'host') syncs and serves the rows. A's rebuild holds the
    SQL lock: B's concurrent rebuild is lock-skipped; B's mid-build
    upload through the shared store survives the swap."""
    from vectorsearch_tpu.engine import engine as engine_mod

    a = Engine(PgStore([shared_pg.dsn]), WordHashAI(),
               cache=EngineCache(ttl=0.0))
    b = Engine(PgStore([shared_pg.dsn], migrate=False), WordHashAI(),
               cache=EngineCache(ttl=0.0))

    a.upload(
        "alice", "docs",
        [{"name": f"d{i}", "document": {"text": f"w{i % 3} base {i}"}}
         for i in range(30)],
    )
    owner = a.store.get_owner("alice")
    cat = a.store.get_category(owner.id, "docs")
    # B discovers the category + rows through the shared postgres
    assert b.sync_with_store() == [cat.id]
    hits = b.search("alice", "docs", "w1 base 1", count=3, centroids=-1)
    assert hits

    build_started = threading.Event()
    mid_done = threading.Event()
    real_build = engine_mod.build_centroids

    def slow_build(*args, **kw):
        build_started.set()
        assert mid_done.wait(30)
        return real_build(*args, **kw)

    monkeypatch.setattr(engine_mod, "build_centroids", slow_build)
    t = threading.Thread(
        target=lambda: a.refresh_category(
            cat.id, target_cluster_size=10, chunk=64
        )
    )
    t.start()
    assert build_started.wait(30)
    # exactly one rebuild wins: B is lock-skipped while A builds
    assert b.refresh_category(cat.id, target_cluster_size=10, chunk=64) \
        is False
    # B uploads through the shared store mid-build
    mid = b.upload(
        "alice", "docs",
        [{"name": "bmid", "document": {"text": "remote zebra row"}}],
    )
    mid_done.set()
    t.join(timeout=120)

    assert a.store.count_embeddings(cat.id) == 31
    a.sync_with_store()
    hits = a.search("alice", "docs", "remote zebra row", count=1,
                    centroids=-1)
    assert hits and hits[0].document_id == mid[0]
    b.sync_with_store()
    hits = b.search("alice", "docs", "w1 base 1", count=3, centroids=-1)
    assert hits
    # lock is free again
    assert b.refresh_category(cat.id, target_cluster_size=10, chunk=64) \
        is True
    a.close()
    b.close()
