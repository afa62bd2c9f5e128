"""Fused Pallas k-means pass vs the XLA Lloyd's body (interpret mode on
CPU; the compiled kernel is exercised on real TPU by bench_build.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu.build.kmeans import (
    _assign_and_accumulate,
    _k_pad_class,
    sample_init,
)
from vectorsearch_tpu.kernels.pallas_kmeans import (
    TILE_ROWS,
    assign_accumulate_pallas,
)
from vectorsearch_tpu.quant import layout
from vectorsearch_tpu.quant.layout import PackedVectors


def make_data(n=2048, k=12, d=128, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 4
    v = centers[rng.integers(0, k, size=n)] + rng.normal(
        size=(n, d)
    ).astype(np.float32)
    return layout.pack_float(v.astype(np.float32)), centers


@pytest.mark.parametrize("k_real,n", [(12, 2048), (5, 1024), (200, 4096)])
def test_fused_pass_matches_xla(k_real, n):
    packed, centers = make_data(n=n, k=max(k_real, 12))
    d = centers.shape[1]
    rng = np.random.default_rng(0)
    init = rng.normal(size=(k_real, d)).astype(np.float32) * 4
    k_pad = _k_pad_class(k_real)
    cents = np.pad(init, ((0, k_pad - k_real), (0, 0)))
    kmask = np.where(np.arange(k_pad) < k_real, 0.0, -np.inf).astype(
        np.float32
    )
    valid = np.ones(n, bool)
    valid[-5:] = False  # padded tail rows must not count

    flat = PackedVectors(*[jnp.asarray(a) for a in packed])
    sums_p, counts_p, cid_p = assign_accumulate_pallas(
        flat, jnp.asarray(valid), jnp.asarray(cents), jnp.asarray(kmask),
        interpret=True,
    )

    # XLA reference path: same data as one [1, n, ...] tile
    tiles = PackedVectors(
        *[jnp.asarray(a).reshape((1,) + np.shape(a)) for a in packed]
    )
    sums_x, counts_x, cid_x = _assign_and_accumulate(
        tiles, jnp.asarray(valid).reshape(1, n), jnp.asarray(cents),
        jnp.int32(k_real), None, use_pallas=False,
    )

    cid_p, cid_x = np.asarray(cid_p), np.asarray(cid_x).reshape(-1)
    # assignments agree everywhere except possible float near-ties
    agree = (cid_p == cid_x) | ~valid
    assert agree.mean() > 0.995
    # sums/counts agree where the assignments agree (compare on the
    # agreeing subset by recomputing the oracle from pallas assignments)
    v = np.asarray(packed.offset)[:, None] + np.asarray(packed.scale)[
        :, None
    ] * np.asarray(packed.codes, np.float32)
    oracle = np.zeros((k_pad, d), np.float64)
    oracle_counts = np.zeros(k_pad)
    for i in range(n):
        if valid[i]:
            oracle[cid_p[i]] += v[i]
            oracle_counts[cid_p[i]] += 1
    np.testing.assert_allclose(
        np.asarray(counts_p), oracle_counts, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(sums_p), oracle, rtol=2e-3, atol=2e-2
    )
    # every real assignment in range
    assert (cid_p[valid] < k_real).all() and (cid_p[valid] >= 0).all()


def test_fused_pass_quantized_centroid_parity():
    """Means from the fused pass vs an EXACT f64 accumulation over the
    same assignments: f32 within ~1e-5 (the hi+lo bf16 split keeps
    products exact) and every quantized wire byte within +-1 step.
    Bit-exact wire bytes are unattainable for ANY two f32 summation
    orders — the codec truncates, so a 4e-6 difference sitting on a
    truncation boundary flips the byte; the XLA path differs from its own
    chunk-order variant the same way."""
    from vectorsearch_tpu.quant import codec

    packed, centers = make_data(n=TILE_ROWS * 4, k=8)
    d = centers.shape[1]
    k_pad = _k_pad_class(8)
    cents = np.pad(
        centers.astype(np.float32), ((0, k_pad - 8), (0, 0))
    )
    kmask = np.where(np.arange(k_pad) < 8, 0.0, -np.inf).astype(np.float32)
    n = TILE_ROWS * 4
    valid = np.ones(n, bool)

    flat = PackedVectors(*[jnp.asarray(a) for a in packed])
    sums_p, counts_p, cid_p = assign_accumulate_pallas(
        flat, jnp.asarray(valid), jnp.asarray(cents), jnp.asarray(kmask),
        interpret=True,
    )
    cid_p = np.asarray(cid_p)
    v = np.asarray(packed.offset)[:, None] + np.asarray(packed.scale)[
        :, None
    ] * np.asarray(packed.codes, np.float64)
    oracle = np.zeros((k_pad, d), np.float64)
    counts = np.zeros(k_pad)
    np.add.at(oracle, cid_p, v)
    np.add.at(counts, cid_p, 1)
    mean_p = np.asarray(sums_p[:8]) / np.maximum(np.asarray(counts_p[:8]), 1)[:, None]
    mean_o = (oracle[:8] / np.maximum(counts[:8], 1)[:, None]).astype(np.float32)
    np.testing.assert_allclose(mean_p, mean_o, atol=2e-5, rtol=1e-4)
    qa = codec.quantize(mean_p)[:, 8:].astype(np.int16)
    qb = codec.quantize(mean_o)[:, 8:].astype(np.int16)
    assert np.abs(qa - qb).max() <= 1  # truncation-edge flips only
    assert (qa != qb).mean() < 0.02
