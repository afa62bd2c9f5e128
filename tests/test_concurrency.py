"""Race-safety tests (SURVEY.md §5 notes the reference never wires -race):
concurrent uploads/searches/deletes against one engine, cross-process-style
build-lock contention, and singleflight under parallel misses."""
import threading
import time

import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.engine.cache import TTLCache
from vectorsearch_tpu.store import Store

from test_engine import WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


def test_concurrent_upload_and_search():
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    errors = []

    def uploader(tag):
        try:
            for i in range(5):
                eng.upload(
                    "alice",
                    "docs",
                    [
                        {
                            "name": f"{tag}-{i}",
                            "document": {"text": f"topic{tag} item {i}"},
                        }
                    ],
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            for _ in range(10):
                eng.search("alice", "docs", "topic1 item", count=3)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=uploader, args=(t,)) for t in range(3)]
    threads += [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    hits = eng.search("alice", "docs", "topic2 item", count=5)
    assert hits
    # every uploaded doc is present exactly once in the DB
    owner = store.get_owner("alice")
    cat = store.get_category(owner.id, "docs")
    assert len(store.document_ids_for_category(cat.id)) == 15
    assert store.count_embeddings(cat.id) == 15
    eng.close()
    store.close()


def test_build_lock_contention(tmp_path):
    db = str(tmp_path / "db.sqlite")
    store = Store(db)
    eng = Engine(store, WordHashAI())
    eng.upload(
        "alice",
        "docs",
        [{"name": f"d{i}", "document": {"text": f"w{i % 3} x {i}"}} for i in range(30)],
    )
    owner = store.get_owner("alice")
    cat = store.get_category(owner.id, "docs")
    # another instance holds the DB lock -> refresh skips (not retried)
    assert store.try_acquire_build_lock(cat.id, "other-instance")
    assert eng.refresh_category(cat.id, target_cluster_size=10, chunk=64) is False
    store.release_build_lock(cat.id, "other-instance")
    assert eng.refresh_category(cat.id, target_cluster_size=10, chunk=64) is True
    eng.close()
    store.close()


def test_build_lock_stale_expiry(tmp_path):
    from vectorsearch_tpu.store import db as dbmod

    store = Store(str(tmp_path / "db.sqlite"))
    assert store.try_acquire_build_lock(1, "a")
    assert not store.try_acquire_build_lock(1, "b")
    # simulate a crashed holder by aging the lock past the stale window
    with store._lock, store._conn:
        store._conn.execute(
            "UPDATE build_locks SET acquired_at=?",
            (time.time() - dbmod.BUILD_LOCK_STALE_S - 1,),
        )
    assert store.try_acquire_build_lock(1, "b")
    store.close()


def test_singleflight_one_loader_call():
    cache = TTLCache(ttl=60)
    calls = []
    gate = threading.Event()

    def loader():
        calls.append(1)
        gate.wait(1)
        return "value"

    results = []

    def worker():
        results.append(cache.get_or_load("k", loader))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    time.sleep(0.2)
    gate.set()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert results == ["value"] * 8


def test_singleflight_error_propagates_then_recovers():
    cache = TTLCache(ttl=60)
    state = {"fail": True}

    def loader():
        if state["fail"]:
            raise RuntimeError("boom")
        return 42

    with pytest.raises(RuntimeError):
        cache.get_or_load("k", loader)
    state["fail"] = False
    assert cache.get_or_load("k", loader) == 42


def test_upload_during_rebuild_survives(monkeypatch):
    """Regression for the rebuild race: a document uploaded WHILE the
    k-means build is running must survive the centroid swap in both SQL
    and the HBM index (previously the NOT-IN centroid delete cascade-wiped
    its embeddings and the ivf swap dropped its vectors)."""
    from vectorsearch_tpu.engine import engine as engine_mod

    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    eng.upload(
        "alice",
        "docs",
        [{"name": f"d{i}", "document": {"text": f"w{i % 3} base {i}"}} for i in range(30)],
    )
    cat = store.get_category(store.get_owner("alice").id, "docs")

    build_started = threading.Event()
    upload_done = threading.Event()
    real_build = engine_mod.build_centroids

    def slow_build(*a, **kw):
        build_started.set()
        assert upload_done.wait(30)
        return real_build(*a, **kw)

    monkeypatch.setattr(engine_mod, "build_centroids", slow_build)

    result = {}

    def rebuild():
        result["ok"] = eng.refresh_category(cat.id, target_cluster_size=10, chunk=64)

    t = threading.Thread(target=rebuild)
    t.start()
    assert build_started.wait(30)
    mid_ids = eng.upload(
        "alice", "docs", [{"name": "mid", "document": {"text": "midbuild zebra unique"}}]
    )
    upload_done.set()
    t.join(timeout=60)
    assert result.get("ok") is True

    # SQL survived (the embedding row still exists and maps to a live centroid)
    assert store.embeddings_for_documents(mid_ids) != []
    assert store.count_embeddings(cat.id) == 31
    # HBM index survived
    hits = eng.search("alice", "docs", "midbuild zebra unique", count=1, centroids=-1)
    assert hits and hits[0].document_id == mid_ids[0]
    # and a delete during... (bonus) normal delete still works post-rebuild
    eng.delete_document("alice", "docs", mid_ids[0])
    hits = eng.search("alice", "docs", "midbuild zebra unique", count=1, centroids=-1)
    assert not hits or hits[0].document_id != mid_ids[0]
    eng.close()
    store.close()


def test_delete_during_rebuild_stays_deleted(monkeypatch):
    """A document deleted while the build runs must stay deleted after the
    swap (the rebuilt index was packed from the pre-delete snapshot)."""
    from vectorsearch_tpu.engine import engine as engine_mod

    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    ids = eng.upload(
        "alice",
        "docs",
        [{"name": f"d{i}", "document": {"text": f"w{i % 3} base {i}"}} for i in range(30)],
    )
    cat = store.get_category(store.get_owner("alice").id, "docs")

    build_started = threading.Event()
    delete_done = threading.Event()
    real_build = engine_mod.build_centroids

    def slow_build(*a, **kw):
        build_started.set()
        assert delete_done.wait(30)
        return real_build(*a, **kw)

    monkeypatch.setattr(engine_mod, "build_centroids", slow_build)
    t = threading.Thread(
        target=lambda: eng.refresh_category(cat.id, target_cluster_size=10, chunk=64)
    )
    t.start()
    assert build_started.wait(30)
    eng.delete_document("alice", "docs", ids[0])
    delete_done.set()
    t.join(timeout=60)

    hits = eng.search("alice", "docs", "w0 base 0", count=5, centroids=-1)
    assert all(h.document_id != ids[0] for h in hits)
    assert store.count_embeddings(cat.id) == 29
    eng.close()
    store.close()


def test_cross_instance_upload_during_rebuild(monkeypatch, tmp_path):
    """Instance B uploads to the shared store while instance A's rebuild
    is running: B's embeddings must survive A's centroid swap (the NOT-IN
    delete must never cascade rows whose centroid is still referenced)."""
    from vectorsearch_tpu.engine import engine as engine_mod

    db = str(tmp_path / "shared.sqlite")
    store_a, store_b = Store(db), Store(db)
    a = Engine(store_a, WordHashAI(), cache=EngineCache(ttl=0.0))
    b = Engine(store_b, WordHashAI(), cache=EngineCache(ttl=0.0))
    a.upload(
        "alice", "docs",
        [{"name": f"d{i}", "document": {"text": f"w{i % 3} base {i}"}} for i in range(30)],
    )
    cat = store_a.get_category(store_a.get_owner("alice").id, "docs")
    b.sync_with_store()

    build_started = threading.Event()
    upload_done = threading.Event()
    real_build = engine_mod.build_centroids

    def slow_build(*args, **kw):
        build_started.set()
        assert upload_done.wait(30)
        return real_build(*args, **kw)

    monkeypatch.setattr(engine_mod, "build_centroids", slow_build)
    t = threading.Thread(
        target=lambda: a.refresh_category(cat.id, target_cluster_size=10, chunk=64)
    )
    t.start()
    assert build_started.wait(30)
    # B writes through the shared store mid-build (A cannot see these rows)
    mid = b.upload(
        "alice", "docs", [{"name": "bmid", "document": {"text": "remote zebra row"}}]
    )
    upload_done.set()
    t.join(timeout=60)

    # B's embedding rows survived A's centroid swap in SQL
    assert store_a.embeddings_for_documents(mid) != []
    assert store_a.count_embeddings(cat.id) == 31
    # and a fresh boot (or sync) can still serve them
    a.sync_with_store()
    hits = a.search("alice", "docs", "remote zebra row", count=1, centroids=-1)
    assert hits and hits[0].document_id == mid[0]
    for e, s in ((a, store_a), (b, store_b)):
        e.close(); s.close()


def test_query_batcher_coalesces_and_is_correct():
    """Concurrent searches over one snapshot must coalesce into fewer
    device dispatches (engine/batcher.py) and return the same hits as a
    serial search (VERDICT r1 weak#2: one dispatch per request)."""
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=60.0))
    docs = [
        {"name": f"d{i}", "document": {"text": f"topic{i % 7} word {i}"}}
        for i in range(40)
    ]
    eng.upload("alice", "docs", docs)

    # serial ground truth per topic
    expected = {
        t: [h.document_id for h in eng.search("alice", "docs", f"topic{t} word", count=3)]
        for t in range(7)
    }
    base = eng._batcher.stats()

    results = {}
    errors = []
    start = threading.Barrier(28)

    def worker(i):
        t = i % 7
        try:
            start.wait(5)
            hits = eng.search("alice", "docs", f"topic{t} word", count=3)
            results[i] = (t, [h.document_id for h in hits])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(28)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    for t, got in results.values():
        assert got == expected[t]
    after = eng._batcher.stats()
    rows = after["rows_served"] - base["rows_served"]
    dispatches = after["dispatches"] - base["dispatches"]
    assert rows == 28
    # coalescing must have batched at least some requests
    assert dispatches < rows
    eng.close()
    store.close()


def test_query_batcher_error_propagates():
    from vectorsearch_tpu.engine.batcher import QueryBatcher

    b = QueryBatcher()

    def boom(q):
        raise RuntimeError("kernel failed")

    with pytest.raises(RuntimeError):
        b.submit(("k",), object(), np.zeros(4, np.float32), boom)
    # the batcher must recover for the next dispatch
    s, i = b.submit(
        ("k2",), object(), np.zeros(4, np.float32),
        lambda q: (np.ones((len(q), 2)), np.zeros((len(q), 2), np.int64)),
    )
    assert s.shape == (2,)


def test_upload_coalescing_deterministic():
    """Concurrent uploads to one category share one assign dispatch and
    one index insert: hold state.lock so the first arrival (leader)
    blocks, let N requests queue, release — all N land in ONE batch."""
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    # create the category + state up front
    first = eng.upload("o", "c", [{"name": "seed", "document": {"text": "seed row"}}])
    assert first
    cat = store.get_category(store.get_owner("o").id, "c")
    state = eng._state_for(cat.id, create=False)
    base_batches = eng._upload_batches

    n = 6
    results = {}
    errors = []

    def one(i):
        try:
            results[i] = eng.upload(
                "o", "c", [{"name": f"t{i}", "document": {"text": f"coal tok{i}"}}]
            )
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    state.lock.acquire()
    try:
        threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while len(state.upload_queue) < n and time.time() < deadline:
            time.sleep(0.01)
        assert len(state.upload_queue) == n
    finally:
        state.lock.release()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    assert len(results) == n
    ids = [i for r in results.values() for i in r]
    assert len(set(ids)) == n  # distinct doc ids per request
    assert eng._upload_batches == base_batches + 1  # ONE coalesced batch
    # every doc searchable afterwards
    for i in range(n):
        hits = eng.search("o", "c", f"coal tok{i}", count=1, centroids=-1)
        assert hits and hits[0].document_id == results[i][0]
    eng.close()
    store.close()


def test_upload_batch_failure_isolated():
    """A request whose SQL transaction fails must not fail its batch
    siblings (per-request transactions inside the coalesced batch)."""
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    eng.upload("o", "c", [{"name": "seed", "document": {"text": "seed row"}}])
    cat = store.get_category(store.get_owner("o").id, "c")
    state = eng._state_for(cat.id, create=False)

    real_insert = store.insert_documents_with_embeddings

    def poisoned(category_id, doc_rows, embeddings_per_doc):
        if any(name == "bad" for name, _, _ in doc_rows):
            raise RuntimeError("injected SQL failure")
        return real_insert(category_id, doc_rows, embeddings_per_doc)

    store.insert_documents_with_embeddings = poisoned
    results = {}
    errors = {}

    def one(name):
        try:
            results[name] = eng.upload(
                "o", "c", [{"name": name, "document": {"text": f"tok {name}"}}]
            )
        except BaseException as e:
            errors[name] = e

    state.lock.acquire()
    try:
        threads = [
            threading.Thread(target=one, args=(nm,))
            for nm in ("good1", "bad", "good2")
        ]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while len(state.upload_queue) < 3 and time.time() < deadline:
            time.sleep(0.01)
    finally:
        state.lock.release()
    for t in threads:
        t.join(timeout=30)
    store.insert_documents_with_embeddings = real_insert

    assert set(errors) == {"bad"} and "injected" in str(errors["bad"])
    assert set(results) == {"good1", "good2"}
    for nm in ("good1", "good2"):
        hits = eng.search("o", "c", f"tok {nm}", count=1, centroids=-1)
        assert hits and hits[0].document_id == results[nm][0]
    # the failed request left nothing behind
    assert store.count_embeddings(cat.id) == 3  # seed + good1 + good2
    eng.close()
    store.close()


def test_upload_batch_insert_failure_fails_all():
    """If the shared device insert throws AFTER per-request SQL commits,
    every batch member must see the error AND the committed SQL rows must
    be rolled back — otherwise a client that retries after the error would
    end up with duplicate documents once sync_with_store heals the orphans
    (ADVICE r2: the failure path is exactly-zero, not at-least-once)."""
    from vectorsearch_tpu.index import IVFIndex

    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    eng.upload("o", "c", [{"name": "seed", "document": {"text": "seed row"}}])
    cat = store.get_category(store.get_owner("o").id, "c")
    state = eng._state_for(cat.id, create=False)
    n_before = state.ivf.n_live

    real_insert = IVFIndex.insert
    def exploding(self, *a, **kw):
        raise RuntimeError("injected insert failure")
    IVFIndex.insert = exploding
    try:
        with pytest.raises(RuntimeError, match="injected insert"):
            eng.upload("o", "c", [{"name": "x", "document": {"text": "boom row"}}])
    finally:
        IVFIndex.insert = real_insert

    assert state.ivf.n_live == n_before  # nothing reached HBM
    # the committed SQL rows were rolled back: a retry cannot duplicate
    assert store.count_embeddings(cat.id) == n_before
    assert eng.sync_with_store() == []  # nothing diverged, nothing to heal
    # retry succeeds cleanly with exactly one copy
    eng.upload("o", "c", [{"name": "x", "document": {"text": "boom row"}}])
    hits = eng.search("o", "c", "boom row", count=5, centroids=-1)
    assert [h.name for h in hits].count("x") == 1
    eng.close()
    store.close()


def test_upload_batch_failure_raises_fresh_exception_per_waiter():
    """Every waiter of a failed batch must get its OWN exception instance
    (concurrent re-raise of one shared instance interleaves __traceback__
    mutation across threads), chained to the one underlying cause."""
    from vectorsearch_tpu.engine.engine import UploadError
    from vectorsearch_tpu.index import IVFIndex

    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    eng.upload("o", "c", [{"name": "seed", "document": {"text": "seed row"}}])
    cat = store.get_category(store.get_owner("o").id, "c")
    state = eng._state_for(cat.id, create=False)

    real_insert = IVFIndex.insert
    start = threading.Barrier(3)
    def exploding(self, *a, **kw):
        raise RuntimeError("injected insert failure")
    def slow_batch(orig):
        def wrapped(self2, st, cid, jobs):
            time.sleep(0.2)  # let followers queue behind the leader
            return orig(self2, st, cid, jobs)
        return wrapped

    errors = {}
    def worker(name):
        start.wait()
        try:
            eng.upload("o", "c", [{"name": name, "document": {"text": name}}])
        except Exception as e:
            errors[name] = e

    IVFIndex.insert = exploding
    # serialize arrivals through the leader's sleep so they coalesce
    real_process = Engine._process_upload_batch
    Engine._process_upload_batch = slow_batch(real_process)
    try:
        threads = [
            threading.Thread(target=worker, args=(f"w{i}",)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        IVFIndex.insert = real_insert
        Engine._process_upload_batch = real_process

    assert len(errors) == 3
    insts = list(errors.values())
    assert all(isinstance(e, UploadError) for e in insts)
    assert len({id(e) for e in insts}) == 3  # distinct instances
    assert all(isinstance(e.__cause__, RuntimeError) for e in insts)
    eng.close()
    store.close()
