"""Kernel correctness: packed scoring vs f32 oracle, chunked scan top-k,
masking, and centroid assignment parity with the reference's semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu.kernels import cosine
from vectorsearch_tpu.quant import layout


def numpy_cosine_oracle(queries, corpus):
    """Reference scoring: normalize both sides, dot (compute/cosine.go:13-57)."""
    def norm(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return np.where(n == 0, x, x / np.where(n == 0, 1, n))
    return norm(queries.astype(np.float64)) @ norm(corpus.astype(np.float64)).T


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    corpus = rng.normal(size=(3000, 256)).astype(np.float32)
    queries = rng.normal(size=(8, 256)).astype(np.float32)
    packed = layout.pack_float(corpus)
    deq = layout.unpack(packed)  # what the quantized corpus actually encodes
    return corpus, queries, packed, deq


def test_scores_packed_matches_oracle_on_dequantized(data):
    _, queries, packed, deq = data
    got = np.asarray(cosine.scores_packed(jnp.asarray(queries), packed))
    want = numpy_cosine_oracle(queries, deq)
    # only query int8 quantization separates these paths
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_scores_f32_exact(data):
    corpus, queries, _, _ = data
    got = np.asarray(cosine.scores_f32(jnp.asarray(queries), jnp.asarray(corpus)))
    want = numpy_cosine_oracle(queries, corpus)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_recall_at_10_vs_f32(data):
    corpus, queries, packed, _ = data
    exact = numpy_cosine_oracle(queries, corpus)
    truth = np.argsort(-exact, axis=-1)[:, :10]
    scores = np.asarray(cosine.scores_packed(jnp.asarray(queries), packed))
    approx = np.argsort(-scores, axis=-1)[:, :10]
    recall = np.mean(
        [len(set(t) & set(a)) / 10 for t, a in zip(truth, approx)]
    )
    assert recall >= 0.9, recall


def test_scan_topk_matches_full_topk(data):
    _, queries, packed, _ = data
    n = packed.n
    full = np.asarray(cosine.scores_packed(jnp.asarray(queries), packed))
    want_s = -np.sort(-full, axis=-1)[:, :10]
    s, i = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(n), k=10, chunk=512
    )
    s, i = np.asarray(s), np.asarray(i)
    np.testing.assert_allclose(s, want_s, atol=1e-5)
    # returned indices actually produce those scores
    np.testing.assert_allclose(
        np.take_along_axis(full, i, axis=-1), s, atol=1e-5
    )


def test_scan_topk_single_chunk_path(data):
    _, queries, packed, _ = data
    s_big, i_big = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(packed.n), k=5, chunk=100_000
    )
    s_small, i_small = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(packed.n), k=5, chunk=512
    )
    np.testing.assert_allclose(np.asarray(s_big), np.asarray(s_small), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_big), np.asarray(i_small))


def test_scan_topk_streamed_matches_scan_topk(data):
    # n=3000, chunk=512: a non-multiple tail (clamped overlap window)
    _, queries, packed, _ = data
    s_ref, i_ref = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(packed.n), k=10, chunk=512
    )
    s, i = cosine.scan_topk_streamed(
        jnp.asarray(queries), packed, jnp.int32(packed.n), k=10, chunk=512
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    # no row may appear twice (the tail tile overlaps the previous one;
    # the window mask must exclude the overlap)
    for row in np.asarray(i):
        assert len(set(row.tolist())) == len(row)


def test_scan_topk_streamed_valid_mask_and_nvalid(data):
    _, queries, packed, _ = data
    mask = np.ones(packed.n, bool)
    mask[50:2950] = False  # only rows [0,50) and [2950, 3000) live
    s, i = cosine.scan_topk_streamed(
        jnp.asarray(queries), packed, jnp.int32(packed.n), k=10, chunk=512,
        valid_mask=jnp.asarray(mask),
    )
    i = np.asarray(i)
    assert mask[i].all()
    s2, i2 = cosine.scan_topk_streamed(
        jnp.asarray(queries), packed, jnp.int32(100), k=10, chunk=512
    )
    assert (np.asarray(i2) < 100).all()


def test_scan_topk_streamed_small_n_and_k_gt_n():
    packed = layout.pack_float(np.random.default_rng(0).normal(size=(3, 64)))
    q = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64)), jnp.float32)
    s, i = cosine.scan_topk_streamed(q, packed, jnp.int32(3), k=8, chunk=512)
    assert s.shape == (2, 8)
    assert np.isneginf(np.asarray(s)[:, 3:]).all()


def test_mask_invalid_blocks_padding(data):
    _, queries, packed, _ = data
    n_valid = 100
    s, i = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(n_valid), k=10, chunk=512
    )
    assert (np.asarray(i) < n_valid).all()


def test_topk_k_larger_than_n():
    packed = layout.pack_float(np.random.default_rng(0).normal(size=(3, 64)))
    q = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64)), jnp.float32)
    s, i = cosine.scan_topk(q, packed, jnp.int32(3), k=8, chunk=512)
    assert s.shape == (2, 8)
    assert np.isneginf(np.asarray(s)[:, 3:]).all()


def test_zero_query_scores_zero(data):
    _, _, packed, _ = data
    q = jnp.zeros((1, 256), jnp.float32)
    got = np.asarray(cosine.scores_packed(q, packed))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_zero_corpus_vector_scores_zero():
    corpus = np.zeros((4, 64), np.float32)
    corpus[0] = 1.0
    packed = layout.pack_float(corpus)
    q = jnp.asarray(np.ones((1, 64), np.float32))
    got = np.asarray(cosine.scores_packed(q, packed))
    np.testing.assert_allclose(got[0, 1:], 0.0, atol=1e-6)


def test_nearest_centroid_matches_numpy(data):
    _, _, packed, deq = data
    rng = np.random.default_rng(9)
    centroids = rng.normal(size=(16, 256)).astype(np.float32)
    sims, idx = cosine.nearest_centroid(packed, jnp.asarray(centroids))
    want = numpy_cosine_oracle(deq, centroids)
    want_idx = np.argmax(want, axis=-1)
    # bf16 contraction: tiny fraction of near-tie flips allowed
    agree = np.mean(np.asarray(idx) == want_idx)
    assert agree >= 0.99, agree
    np.testing.assert_allclose(
        np.asarray(sims), want.max(axis=-1), atol=5e-3
    )


def test_merge_topk():
    sa = jnp.asarray([[5.0, 3.0]])
    ia = jnp.asarray([[10, 11]], dtype=jnp.int32)
    sb = jnp.asarray([[4.0, 1.0]])
    ib = jnp.asarray([[20, 21]], dtype=jnp.int32)
    s, i = cosine.merge_topk(sa, ia, sb, ib, 3)
    np.testing.assert_allclose(np.asarray(s), [[5.0, 4.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(i), [[10, 20, 11]])
