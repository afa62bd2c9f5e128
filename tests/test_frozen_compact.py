"""Frozen (HBM-limit) store spill drain — VERDICT r3 next-step #5.

At 10M scale the bucket store freezes (two copies exceed the device
budget), every streaming insert lands in the spill FlatIndex, and the
functional compact() is impossible. The sequenced re-pack
(engine._compact_frozen) stages live rows host-side, closes the search
gate, FREES the old device buckets, and uploads the new layout into the
freed budget — so long-running streaming never degrades monotonically
(the reference never degrades this way because SQL is its store,
/root/reference/server/upload.go:240-246).
"""
import threading
import time

import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.engine import engine as engine_mod
from vectorsearch_tpu.index import IVFIndex
from vectorsearch_tpu.store import Store

from test_engine import WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)
    monkeypatch.setattr(engine_mod, "COMPACT_MIN_SPILL", 8)


def _docs(lo, hi):
    return [
        {"name": f"d{i}", "document": {"text": f"w{i % 5} base row{i}"}}
        for i in range(lo, hi)
    ]


def _frozen_engine():
    """Engine whose one category serves a FROZEN index (budget fits one
    copy of the bucket store, not two)."""
    store = Store(":memory:")
    eng = Engine(store, WordHashAI(), cache=EngineCache(ttl=0.0))
    eng.upload("alice", "docs", _docs(0, 120))
    owner = store.get_owner("alice")
    cat = store.get_category(owner.id, "docs")
    assert eng.refresh_category(cat.id, target_cluster_size=30, chunk=64)
    st = eng._states[cat.id]
    eng._hbm_budget = st.ivf.hbm_bytes + st.ivf.hbm_bytes // 2
    assert eng.refresh_category(cat.id, target_cluster_size=30, chunk=64)
    assert st.ivf.frozen, "budget should freeze the rebuilt store"
    return eng, store, cat, st


def test_frozen_spill_drains_without_restart():
    eng, store, cat, st = _frozen_engine()
    old = st.ivf
    n0 = old.n_live
    # streaming inserts on a frozen store all land in the spill tail;
    # crossing the trigger re-packs in-process
    eng.upload("alice", "docs", _docs(1000, 1040))
    assert st.ivf is not old, "sequenced re-pack must have swapped"
    assert st.ivf.spill.live == 0, "spill must drain to zero"
    assert st.ivf.n_live == n0 + 40
    # the old device buffers were actually freed (the whole point: the
    # budget cannot hold two copies)
    assert old.buckets.codes.is_deleted()
    # both pre-existing and streamed rows serve correctly
    hits = eng.search("alice", "docs", "w0 base row1005", count=3, centroids=-1)
    assert hits and hits[0].name == "d1005"
    hits = eng.search("alice", "docs", "w2 base row7", count=3, centroids=-1)
    assert hits and hits[0].name == "d7"
    eng.close()
    store.close()


def test_searches_stay_correct_through_the_gap(monkeypatch):
    """Concurrent searches during the re-pack block on the gate (never
    crash on freed buffers) and return correct results throughout."""
    eng, store, cat, st = _frozen_engine()

    real_build = IVFIndex.build

    def slow_build(*args, **kwargs):
        time.sleep(0.3)  # widen the gap so the hammer lands inside it
        return real_build(*args, **kwargs)

    monkeypatch.setattr(IVFIndex, "build", staticmethod(slow_build))

    stop = threading.Event()
    errors: list[BaseException] = []
    served = [0]

    def hammer():
        while not stop.is_set():
            try:
                hits = eng.search(
                    "alice", "docs", "w2 base row7", count=3, centroids=-1
                )
                assert hits and hits[0].name == "d7"
                served[0] += 1
            except BaseException as e:  # noqa: BLE001 - collected for assert
                errors.append(e)
                return

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    eng.upload("alice", "docs", _docs(1000, 1040))
    time.sleep(0.2)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors
    assert served[0] > 0
    assert st.ivf.spill.live == 0
    assert st.gate.is_set() and st.inflight == 0
    eng.close()
    store.close()


def test_failed_repack_degrades_not_poisons(monkeypatch):
    """If the rebuild fails AFTER the old buffers are freed, the category
    must degrade to no index (reload from SQL) — never keep serving an
    index whose device buffers are deleted."""
    eng, store, cat, st = _frozen_engine()

    def boom(*args, **kwargs):
        raise RuntimeError("injected build failure")

    monkeypatch.setattr(IVFIndex, "build", staticmethod(boom))
    # the upload itself succeeds (rows are in SQL + spill before the
    # maintenance step); the compaction failure is contained
    ids = eng.upload("alice", "docs", _docs(1000, 1040))
    assert len(ids) == 40
    assert st.ivf is None
    assert st.gate.is_set()
    monkeypatch.undo()
    # a sync/reload path rebuilds from SQL and serves everything again
    eng.sync_with_store(cat.id)
    assert st.ivf is not None and st.ivf.n_live == 160
    hits = eng.search("alice", "docs", "w0 base row1005", count=3, centroids=-1)
    assert hits and hits[0].name == "d1005"
    eng.close()
    store.close()
