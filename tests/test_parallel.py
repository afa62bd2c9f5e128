"""Sharded serving on an 8-device virtual CPU mesh: per-shard top-k +
all_gather merge must agree with single-device search."""
import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.index import FlatIndex, IVFIndex
from vectorsearch_tpu.parallel import ShardedFlat, ShardedIVF, default_mesh
from vectorsearch_tpu.quant import layout


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


@pytest.fixture(scope="module")
def mesh():
    return default_mesh(8)


def make_clustered(n_per=40, k=8, d=64, seed=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 5
    pts = (centers[:, None, :] + rng.normal(size=(k, n_per, d))).astype(np.float32)
    return pts.reshape(-1, d), centers


def test_sharded_flat_matches_single(mesh):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 64)).astype(np.float32)
    packed = layout.pack_float(v)
    ids = np.arange(1, 501, dtype=np.int64)
    q = rng.normal(size=(4, 64)).astype(np.float32)

    single = FlatIndex.from_packed(packed, ids)
    s1, i1 = single.search(q, k=10)
    sharded = ShardedFlat.build(mesh, packed, ids)
    s8, i8 = sharded.search(q, k=10, chunk=64)

    np.testing.assert_allclose(s1, s8, atol=1e-5)
    for a, b in zip(i1, i8):
        assert len(set(a) & set(b)) >= 9  # near-tie ordering tolerance


def test_sharded_flat_small_corpus(mesh):
    # fewer rows than devices*minimum: padding shards must stay silent
    rng = np.random.default_rng(1)
    v = rng.normal(size=(5, 32)).astype(np.float32)
    packed = layout.pack_float(v)
    ids = np.arange(1, 6, dtype=np.int64)
    sharded = ShardedFlat.build(mesh, packed, ids)
    s, i = sharded.search(v[:1], k=8, chunk=64)
    assert (i[0][:5] != -1).sum() == 5
    assert (i[0][5:] == -1).all()


def test_sharded_ivf_matches_single(mesh):
    v, centers = make_clustered(n_per=30, k=8)
    packed = layout.pack_float(v)
    ids = np.arange(1, len(v) + 1, dtype=np.int64)
    q = v[:5] + 0.01

    single = IVFIndex.build(packed, ids, centers)
    s1, i1 = single.search(q, k=5, nprobe=-1)
    sharded = ShardedIVF.build(mesh, packed, ids, centers)
    s8, i8 = sharded.search(q, k=5, nprobe=-1)

    for a, b in zip(i1, i8):
        assert len(set(a) & set(b)) >= 4


def test_sharded_ivf_nprobe_split(mesh):
    v, centers = make_clustered(n_per=30, k=8)
    packed = layout.pack_float(v)
    ids = np.arange(1, len(v) + 1, dtype=np.int64)
    sharded = ShardedIVF.build(mesh, packed, ids, centers)
    # nprobe=8 over 8 devices -> 1 local probe each; self-queries must hit
    s, i = sharded.search(v[:6] + 0.001, k=1, nprobe=8)
    assert (i[:, 0] == ids[:6]).all()


def test_sharded_ivf_fewer_clusters_than_devices(mesh):
    v, centers = make_clustered(n_per=30, k=3)
    packed = layout.pack_float(v)
    ids = np.arange(1, len(v) + 1, dtype=np.int64)
    sharded = ShardedIVF.build(mesh, packed, ids, centers)
    s, i = sharded.search(v[:3] + 0.001, k=1, nprobe=-1)
    assert (i[:, 0] == ids[:3]).all()
