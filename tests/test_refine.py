"""Refine (exact f32 re-rank) stage: improves over the int8-query coarse
scan and never worsens the candidate set."""
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.index import FlatIndex
from vectorsearch_tpu.kernels import cosine
from vectorsearch_tpu.quant import layout


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


def oracle(queries, corpus_deq):
    def norm(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return np.where(n == 0, x, x / np.where(n == 0, 1, n))
    return norm(queries.astype(np.float64)) @ norm(corpus_deq.astype(np.float64)).T


def test_rescore_matches_oracle_scores():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(500, 128)).astype(np.float32)
    packed = layout.pack_float(corpus)
    deq = layout.unpack(packed)
    q = rng.normal(size=(4, 128)).astype(np.float32)

    coarse_s, coarse_i = cosine.scan_topk(
        jnp.asarray(q), layout.PackedVectors(*[jnp.asarray(a) for a in packed]),
        jnp.int32(500), k=20, chunk=512,
    )
    s, i = cosine.rescore_topk(
        jnp.asarray(q),
        layout.PackedVectors(*[jnp.asarray(a) for a in packed]),
        coarse_s, coarse_i, k=5,
    )
    s, i = np.asarray(s), np.asarray(i)
    want = oracle(q, deq)
    # refined scores are the exact f32 scores of the returned rows
    np.testing.assert_allclose(
        s, np.take_along_axis(want, i, axis=-1), atol=1e-4
    )
    # refined ordering is descending
    assert (np.diff(s, axis=-1) <= 1e-6).all()


def test_flat_search_refine_improves_recall():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(2000, 96)).astype(np.float32)
    packed = layout.pack_float(corpus)
    deq = layout.unpack(packed)
    ids = np.arange(1, 2001, dtype=np.int64)
    idx = FlatIndex.from_packed(packed, ids)
    q = rng.normal(size=(16, 96)).astype(np.float32)

    truth = np.argsort(-oracle(q, deq), axis=-1)[:, :10] + 1

    def recall(got):
        return np.mean(
            [len(set(got[r]) & set(truth[r])) / 10 for r in range(len(q))]
        )

    _, base = idx.search(q, k=10)
    _, refined = idx.search(q, k=10, refine=50)
    assert recall(refined) >= recall(base)
    assert recall(refined) >= 0.98


def test_refine_handles_neginf_candidates():
    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(3, 64)).astype(np.float32)
    packed = layout.pack_float(corpus)
    idx = FlatIndex.from_packed(packed, np.arange(1, 4, dtype=np.int64))
    s, i = idx.search(np.ones((1, 64), np.float32), k=8, refine=8)
    assert (i[0, :3] != -1).all()
    assert (i[0, 3:] == -1).all()
