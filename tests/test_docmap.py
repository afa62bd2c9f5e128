"""DocMap: the array-backed emb->doc mapping (engine/docmap.py) that
replaces the per-embedding python dict (GBs of host RAM at 10M entries)."""
import numpy as np
import pytest

from vectorsearch_tpu.engine import docmap
from vectorsearch_tpu.engine.docmap import DocMap


def test_basic_get_update_pop():
    m = DocMap([1, 5, 9], [10, 50, 90])
    assert len(m) == 3
    assert m.get(5) == 50
    assert m.get(2) is None
    assert m.get(2, -1) == -1
    assert 5 in m and 2 not in m

    m.update([(2, 20), (11, 110)])
    assert len(m) == 5 and m.get(2) == 20 and m.get(11) == 110

    assert m.pop(5) == 50
    assert m.get(5) is None and len(m) == 4
    assert m.pop(5) is None  # idempotent
    assert len(m) == 4

    # overwrite keeps the count
    m.update([(1, 111)])
    assert m.get(1) == 111 and len(m) == 4


def test_unsorted_init_and_max_key():
    m = DocMap([9, 1, 5], [90, 10, 50])
    assert m.get(1) == 10 and m.get(9) == 90
    assert m.max_key() == 9
    m.pop(9)
    assert m.max_key() == 5
    m.update([(30, 300)])
    assert m.max_key() == 30
    assert DocMap().max_key() == 0


def test_get_many_vectorized():
    m = DocMap([1, 5, 9], [10, 50, 90])
    m.update([(2, 20)])
    m.pop(5)
    out = m.get_many(np.array([1, 2, 5, 9, 100]))
    assert out.tolist() == [10, 20, -1, 90, -1]


def test_merge_threshold(monkeypatch):
    monkeypatch.setattr(docmap, "MERGE_THRESHOLD", 8)
    m = DocMap([1, 2, 3], [10, 20, 30])
    m.update([(k, k * 10) for k in range(100, 110)])  # crosses threshold
    assert m._overlay == {} and len(m) == 13
    assert m.get(105) == 1050 and m.get(2) == 20
    for k in range(100, 108):
        m.pop(k)  # 8th pop crosses the threshold and merges
    assert m._deleted == set() and len(m) == 5
    assert m.get(105) is None and m.get(109) == 1090
    keys, vals = m.arrays()
    assert keys.tolist() == [1, 2, 3, 108, 109]
    assert vals.tolist() == [10, 20, 30, 1080, 1090]


def test_items_materialized():
    m = DocMap([1, 2], [10, 20])
    m.update([(3, 30), (1, 11)])
    m.pop(2)
    assert sorted(m.items()) == [(1, 11), (3, 30)]


def test_from_dict():
    m = DocMap.from_dict({7: 70, 3: 30})
    assert m.get(7) == 70 and m.get(3) == 30 and len(m) == 2


def test_concurrent_read_write():
    import threading

    m = DocMap(np.arange(10_000), np.arange(10_000) * 2)
    stop = threading.Event()
    errors = []

    def reader():
        try:
            while not stop.is_set():
                out = m.get_many(np.arange(0, 10_000, 97))
                assert ((out == -1) | (out % 2 == 0)).all()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for k in range(20_000, 80_000):
            m.update([(k, k * 2)])
            if k % 3 == 0:
                m.pop(k - 15_000)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors
