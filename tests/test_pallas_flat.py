"""Band-max flat Pallas kernel (interpret mode) vs exact scan."""
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu.kernels import cosine
from vectorsearch_tpu.kernels.pallas_flat import flat_search_pallas
from vectorsearch_tpu.quant import layout


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(5000, 128)).astype(np.float32)
    packed = layout.PackedVectors(
        *[jnp.asarray(a) for a in layout.pack_float(corpus)]
    )
    queries = rng.normal(size=(8, 128)).astype(np.float32)
    return corpus, packed, queries


def test_matches_exact_scan(data):
    corpus, packed, queries = data
    s_ref, i_ref = cosine.scan_topk(
        jnp.asarray(queries), packed, jnp.int32(5000), k=10, chunk=100_000
    )
    s_pal, i_pal = flat_search_pallas(
        jnp.asarray(queries), packed, jnp.int32(5000), k=10, k_bands=64,
        interpret=True,
    )
    i_ref, i_pal = np.asarray(i_ref), np.asarray(i_pal)
    overlap = np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(i_ref, i_pal)]
    )
    assert overlap >= 0.9, overlap
    # rescored scores are exact f32 cosine of the returned rows
    deq = np.asarray(layout.unpack(layout.pack_float(corpus)))
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    exact = norm(queries) @ norm(deq).T
    np.testing.assert_allclose(
        np.asarray(s_pal),
        np.take_along_axis(exact, i_pal, axis=-1),
        atol=1e-4,
    )


def test_respects_n_valid(data):
    corpus, packed, queries = data
    s, i = flat_search_pallas(
        jnp.asarray(queries), packed, jnp.int32(100), k=5, k_bands=32,
        interpret=True,
    )
    assert (np.asarray(i) < 100).all()


def test_valid_mask(data):
    corpus, packed, queries = data
    # tombstone the true best row of query 0 and make sure it's excluded
    s0, i0 = flat_search_pallas(
        jnp.asarray(queries[:1]), packed, jnp.int32(5000), k=1, k_bands=32,
        interpret=True,
    )
    dead = int(np.asarray(i0)[0, 0])
    mask = jnp.ones((5000,), bool).at[dead].set(False)
    s1, i1 = flat_search_pallas(
        jnp.asarray(queries[:1]), packed, jnp.int32(5000), k=5, k_bands=32,
        valid_mask=mask, interpret=True,
    )
    assert dead not in np.asarray(i1)[0]


def test_small_corpus_fewer_than_k():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(5, 64)).astype(np.float32)
    packed = layout.PackedVectors(
        *[jnp.asarray(a) for a in layout.pack_float(corpus)]
    )
    s, i = flat_search_pallas(
        jnp.asarray(corpus[:1]), packed, jnp.int32(5), k=10, k_bands=16,
        interpret=True,
    )
    s = np.asarray(s)
    assert np.isfinite(s[0, :5]).all()
    assert np.isneginf(s[0, 5:]).all()
