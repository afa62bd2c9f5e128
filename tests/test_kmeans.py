"""Builder tests: Lloyd's convergence on blobs, superset init, small-cluster
drop, and single-device vs 8-device-mesh equivalence."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from vectorsearch_tpu.build import build_centroids, kmeans, lloyd, sample_init
from vectorsearch_tpu.quant import layout


def blobs(k=6, n_per=200, d=64, seed=0, spread=6.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * spread
    pts = centers[:, None, :] + rng.normal(size=(k, n_per, d)).astype(np.float32)
    return pts.reshape(-1, d).astype(np.float32), centers


def cluster_agreement(a, b):
    """Fraction of pairs consistently co-clustered (label-permutation safe)."""
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    return (same_a == same_b).mean()


def test_lloyd_recovers_blobs():
    v, centers = blobs()
    packed = layout.pack_float(v)
    init = sample_init(packed, 6, seed=1)
    res = lloyd(packed, init, max_iters=50, chunk=256)
    assert res.counts.sum() == len(v)
    # each found centroid should be near one true center (cosine)
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    sims = norm(res.centroids) @ norm(centers).T
    assert (sims.max(axis=1) > 0.95).sum() >= 4


def test_lloyd_fused_loop_semantics():
    """The on-device while_loop (one dispatch, one sync) must keep the
    host-loop contract: converge early when assignments stop changing,
    respect max_iters, and honor tol_changes."""
    v, _ = blobs(k=3, n_per=80, d=32)
    packed = layout.pack_float(v)
    init = sample_init(packed, 3, seed=4)

    res = lloyd(packed, init, max_iters=50, chunk=128)
    assert 1 <= res.iterations < 50  # converged early, not capped
    # converged: one more pass from the result changes nothing
    res2 = lloyd(packed, res.centroids, max_iters=1, chunk=128)
    assert res2.iterations == 1
    assert np.array_equal(res2.assignments, res.assignments)

    # max_iters binds when tol can't be reached
    res3 = lloyd(packed, init, max_iters=2, chunk=128)
    assert res3.iterations <= 2

    # a huge tol stops after the first iteration
    res4 = lloyd(packed, init, max_iters=50, chunk=128, tol_changes=10**9)
    assert res4.iterations == 1


def test_kmeans_superset_balance():
    v, centers = blobs(k=4, n_per=100)
    packed = layout.pack_float(v)
    res = kmeans(packed, 4, max_iters=50, chunk=256, seed=3)
    assert res.centroids.shape == (4, 64)
    # superset init should find all 4 blobs -> near-equal counts
    assert res.counts.min() >= 50


def test_kmeans_k_clamped_to_n():
    v, _ = blobs(k=1, n_per=3)
    packed = layout.pack_float(v)
    res = kmeans(packed, 10, max_iters=5, chunk=256)
    assert res.centroids.shape[0] <= 3


def test_build_centroids_drops_small():
    rng = np.random.default_rng(7)
    # one big blob + a handful of outliers
    big = rng.normal(size=(500, 32)).astype(np.float32) + 10
    tiny = rng.normal(size=(3, 32)).astype(np.float32) - 10
    v = np.concatenate([big, tiny])
    packed = layout.pack_float(v)
    res = build_centroids(
        packed, target_cluster_size=100, min_cluster_size=10, chunk=256, seed=0
    )
    # clusters smaller than min size were merged into survivors
    assert (res.counts[res.counts > 0] >= 10).all()
    assert res.counts.sum() == len(v)


def test_sharded_matches_single_device():
    v, _ = blobs(k=4, n_per=128, d=32, seed=5)
    packed = layout.pack_float(v)
    init = sample_init(packed, 4, seed=2)
    res1 = lloyd(packed, init, max_iters=20, chunk=64)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    res8 = lloyd(packed, init, max_iters=20, chunk=64, mesh=mesh)
    np.testing.assert_allclose(res1.centroids, res8.centroids, atol=2e-2)
    assert cluster_agreement(res1.assignments, res8.assignments) > 0.99
    np.testing.assert_array_equal(np.sort(res1.counts), np.sort(res8.counts))


def test_build_on_mesh_runs():
    v, _ = blobs(k=3, n_per=100, d=32, seed=9)
    packed = layout.pack_float(v)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    res = build_centroids(
        packed, target_cluster_size=100, chunk=64, mesh=mesh, seed=1
    )
    assert res.counts.sum() == len(v)
    assert res.centroids.shape[0] >= 1


def test_balance_splits_oversized():
    rng = np.random.default_rng(11)
    # heavily skewed: one giant blob + two small
    big = rng.normal(size=(600, 32)).astype(np.float32) + 8
    s1 = rng.normal(size=(60, 32)).astype(np.float32) - 8
    s2 = rng.normal(size=(60, 32)).astype(np.float32) * 0.5
    v = np.concatenate([big, s1, s2])
    packed = layout.pack_float(v)
    res = build_centroids(
        packed, target_cluster_size=120, min_cluster_size=10, chunk=256,
        seed=0, balance_rounds=2,
    )
    mean = res.counts.sum() / max(1, len(res.counts))
    assert res.counts.max() <= 3 * mean  # giant blob was split
    assert res.counts.sum() == len(v)
