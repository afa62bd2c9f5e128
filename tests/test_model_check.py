"""Randomized engine model check: a seeded sequence of upload / delete /
rebuild / sync operations is verified against a trivial oracle after
every phase — live documents are findable by their own (unique-token)
text, deleted documents never surface, and the SQL store agrees with the
in-HBM index row count. This is the property analogue of the reference's
append-without-rebuild + RefreshCentroids repair contract
(server/upload.go:240-246, server/centroids.go:17).
"""
import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.engine import Engine, EngineCache
from vectorsearch_tpu.store import Store

from test_engine import WordHashAI


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


def _doc(i: int) -> dict:
    # unique token set per doc -> near-orthogonal WordHashAI embeddings
    return {
        "name": f"d{i}",
        "document": {"text": f"tok{i}alpha tok{i}beta tok{i}gamma"},
    }


@pytest.mark.parametrize("with_mesh", [False, True], ids=["1dev", "mesh8"])
def test_engine_model_check(tmp_path, with_mesh):
    mesh = None
    if with_mesh:
        from vectorsearch_tpu.parallel import default_mesh

        mesh = default_mesh(8)
    rng = np.random.default_rng(7)
    store = Store(str(tmp_path / "store.db"))
    engine = Engine(
        store, WordHashAI(), cache=EngineCache(ttl=0.0),
        snapshot_dir=str(tmp_path / "snaps"), mesh=mesh,
    )

    live: dict[int, int] = {}  # doc index -> document_id
    dead: set[int] = set()
    next_i = 0

    deleted_ids: set[int] = set()

    def check(sample=6):
        # row-count agreement: every live doc is 1 section here
        cat = store.get_category(store.get_owner("o").id, "c")
        if cat is None:
            assert not live
            return
        state = engine._state_for(cat.id)
        assert store.count_embeddings(cat.id) == len(live)
        assert state.ivf is None or state.ivf.n_live == len(live)
        idxs = list(live)
        rng.shuffle(idxs)
        for i in idxs[:sample]:
            hits = engine.search(
                "o", "c", f"tok{i}alpha tok{i}beta tok{i}gamma",
                count=3, centroids=-1,
            )
            assert hits, f"doc {i} unfindable"
            assert hits[0].document_id == live[i], f"doc {i} not ranked first"
            assert deleted_ids.isdisjoint(h.document_id for h in hits)
        # deleted documents never resurface, even searched by their own text
        for i in list(dead)[:sample]:
            hits = engine.search(
                "o", "c", f"tok{i}alpha tok{i}beta tok{i}gamma",
                count=3, centroids=-1,
            )
            assert deleted_ids.isdisjoint(h.document_id for h in hits)
    for step in range(40):
        op = rng.choice(["upload", "upload", "upload", "delete", "rebuild"])
        if op == "upload" or not live:
            batch = [_doc(next_i + j) for j in range(int(rng.integers(1, 4)))]
            ids = engine.upload("o", "c", batch)
            for j, did in enumerate(ids):
                live[next_i + j] = did
            next_i += len(ids)
        elif op == "delete":
            i = int(rng.choice(list(live)))
            engine.delete_document("o", "c", live[i])
            deleted_ids.add(live.pop(i))
            dead.add(i)
        else:  # rebuild
            cat = store.get_category(store.get_owner("o").id, "c")
            engine.refresh_category(cat.id, target_cluster_size=8, chunk=64)
        if step % 8 == 7:
            check()

    check(sample=10)
    # a final rebuild must preserve everything exactly
    cat = store.get_category(store.get_owner("o").id, "c")
    engine.refresh_category(cat.id, target_cluster_size=8, chunk=64)
    check(sample=10)
    engine.close()
    store.close()
