"""Persistence: schema cascades, zstd JSON roundtrip, embedding streaming,
centroid swap transaction, and versioned snapshots."""
import numpy as np
import pytest

from vectorsearch_tpu.store import Store, snapshots
from vectorsearch_tpu.store.db import compress, decompress


@pytest.fixture
def store():
    s = Store(":memory:")
    yield s
    s.close()


def seed(store):
    o = store.get_or_create_owner("alice")
    c = store.get_or_create_category(o.id, "docs")
    cent = store.create_centroid(c.id, b"\x00" * 16)
    doc_ids = store.insert_documents(
        c.id, [("d1", "x1", {"title": "hello"}), ("d2", "x2", [1, 2, 3])]
    )
    emb_ids = store.insert_embeddings(
        [(b"\x01" * 16, doc_ids[0], cent), (b"\x02" * 16, doc_ids[1], cent)]
    )
    return o, c, cent, doc_ids, emb_ids


def test_zstd_roundtrip():
    raw = b'{"a": 1, "b": [1,2,3]}' * 100
    assert decompress(compress(raw)) == raw
    assert len(compress(raw)) < len(raw)


def test_owner_category_idempotent(store):
    a = store.get_or_create_owner("alice")
    b = store.get_or_create_owner("alice")
    assert a.id == b.id
    c1 = store.get_or_create_category(a.id, "docs")
    c2 = store.get_or_create_category(a.id, "docs")
    assert c1.id == c2.id
    # same category name under a different owner is distinct
    o2 = store.get_or_create_owner("bob")
    c3 = store.get_or_create_category(o2.id, "docs")
    assert c3.id != c1.id


def test_document_json_roundtrip(store):
    _, c, cent, doc_ids, _ = seed(store)
    docs = store.fetch_documents(doc_ids)
    by_id = {d.id: d for d in docs}
    assert by_id[doc_ids[0]].document == {"title": "hello"}
    assert by_id[doc_ids[1]].document == [1, 2, 3]
    assert by_id[doc_ids[0]].external_id == "x1"


def test_cascade_owner_delete(store):
    o, c, cent, doc_ids, emb_ids = seed(store)
    store.delete_owner("alice")
    assert store.get_owner("alice") is None
    assert store.fetch_documents(doc_ids) == []
    assert store.centroids(c.id) == []
    assert store.count_embeddings(c.id) == 0


def test_cascade_document_delete(store):
    o, c, cent, doc_ids, emb_ids = seed(store)
    store.delete_document(c.id, doc_ids[0])
    assert store.count_embeddings(c.id) == 1
    assert store.embeddings_for_documents(doc_ids) == [emb_ids[1]]


def test_iter_embeddings_batches(store):
    o = store.get_or_create_owner("o")
    c = store.get_or_create_category(o.id, "c")
    cent = store.create_centroid(c.id, b"\x00")
    doc = store.insert_documents(c.id, [("d", "", {})])[0]
    store.insert_embeddings([(bytes([i]), doc, cent) for i in range(25)])
    batches = list(store.iter_embeddings(c.id, batch=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    seen = [row[0] for b in batches for row in b]
    assert seen == sorted(seen)


def test_replace_centroids_transaction(store):
    o, c, cent_old, doc_ids, emb_ids = seed(store)
    new_ids = store.replace_centroids(
        c.id,
        [b"\x10" * 16, b"\x20" * 16],
        {emb_ids[0]: 0, emb_ids[1]: 1},
    )
    rows = store.centroids(c.id)
    assert [r.id for r in rows] == new_ids
    assert rows[0].vector == b"\x10" * 16
    # embeddings were remapped, old centroid is gone
    batches = list(store.iter_embeddings(c.id))
    assert len(batches[0]) == 2


def test_snapshots_roundtrip(tmp_path):
    root = str(tmp_path)
    arrays = {"codes": np.arange(12, dtype=np.int8).reshape(3, 4)}
    v1 = snapshots.save(root, "cat-1", arrays, {"n": 3})
    assert v1 == 1
    v2 = snapshots.save(root, "cat-1", arrays, {"n": 4})
    assert v2 == 2
    meta, loaded = snapshots.load(root, "cat-1")
    assert meta == {"n": 4}
    np.testing.assert_array_equal(loaded["codes"], arrays["codes"])
    # old version still loadable explicitly
    meta1, _ = snapshots.load(root, "cat-1", version=1)
    assert meta1 == {"n": 3}
    snapshots.prune(root, "cat-1", keep=1)
    assert snapshots.load(root, "cat-1", version=1) is None
    assert snapshots.load(root, "cat-1")[0] == {"n": 4}
    snapshots.purge(root, "cat-1")
    assert snapshots.load(root, "cat-1") is None


def test_snapshot_missing_returns_none(tmp_path):
    assert snapshots.load(str(tmp_path), "nope") is None
