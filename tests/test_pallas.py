"""Fused Pallas IVF scan vs the XLA reference path (interpret mode on CPU;
the compiled kernel is exercised on real TPU by bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu import constants
from vectorsearch_tpu.index import IVFIndex
from vectorsearch_tpu.index.ivf import _ivf_scan
from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas
from vectorsearch_tpu.quant import layout


@pytest.fixture(autouse=True)
def small_buckets(monkeypatch):
    monkeypatch.setattr(constants, "BUCKET_ROUND", 64)


def make_ivf(n_per=40, k=8, d=128, seed=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 5
    pts = (centers[:, None, :] + rng.normal(size=(k, n_per, d))).astype(np.float32)
    v = pts.reshape(-1, d)
    packed = layout.pack_float(v)
    ids = np.arange(1, len(v) + 1, dtype=np.int64)
    return IVFIndex.build(packed, ids, centers), v


@pytest.mark.parametrize("nprobe", [1, 3, 8])
def test_pallas_matches_xla_scan(nprobe):
    ivf, v = make_ivf()
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=5,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=5, interpret=True,
    )
    s_ref, i_ref = np.asarray(s_ref), np.asarray(i_ref)
    s_pal, i_pal = np.asarray(s_pal), np.asarray(i_pal)
    # same candidates modulo float-order near-ties
    np.testing.assert_allclose(s_pal, s_ref, atol=2e-3)
    for a, b in zip(i_pal, i_ref):
        assert len(set(a) & set(b)) >= 4


@pytest.mark.parametrize("nprobe", [16, 64, 96])
def test_pallas_high_nprobe_exact(nprobe):
    """High-nprobe regression for the two-stage per-pair top-k epilogue:
    a flat reduction over [B, nprobe*cap] dropped true candidates at
    nprobe=64 on the 10M corpus (probe-major layout packs every winner
    into the first cluster's contiguous positions — recall 0.9408 vs
    0.9617 at nprobe=8). The per-pair reduction must match XLA exactly."""
    ivf, v = make_ivf(n_per=40, k=96, d=128)
    q = jnp.asarray(v[:17] + 0.01, jnp.float32)
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-3)
    assert np.array_equal(np.asarray(i_pal), np.asarray(i_ref))


@pytest.mark.parametrize("b,nprobe", [(33, 2), (5, 6), (64, 1), (1, 3)])
def test_grouped_kernel_batch_shapes(b, nprobe):
    """Cluster grouping must agree with the XLA path across batch shapes
    that stress the group packer: many queries per cluster (multi-tile
    groups), partial tiles, single-query batches."""
    ivf, v = make_ivf(n_per=24, k=6)
    rng = np.random.default_rng(7)
    q = jnp.asarray(
        v[rng.integers(0, len(v), size=b)] + 0.01, jnp.float32
    )
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=4,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=2e-3)
    for a, bb in zip(np.asarray(i_pal), np.asarray(i_ref)):
        assert len(set(a) & set(bb)) >= 3


def test_pallas_masks_tombstones():
    ivf, v = make_ivf(n_per=10, k=2)
    # tombstone the first data row
    ivf = ivf.remove_ids(np.array([1]))
    q = jnp.asarray(v[:1] + 0.001, jnp.float32)
    s, gslot = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=2, k=3, interpret=True,
    )
    flat_ids = ivf.ids.reshape(-1)
    got = flat_ids[np.clip(np.asarray(gslot), 0, flat_ids.size - 1)]
    assert 1 not in got[0]


def test_pallas_k_larger_than_valid():
    ivf, v = make_ivf(n_per=3, k=2)
    q = jnp.asarray(v[:1], jnp.float32)
    s, i = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=1, k=8, interpret=True,
    )
    s = np.asarray(s)
    assert np.isfinite(s[0][:3]).all()
    assert np.isneginf(s[0][3:]).all()


# --------------------------------------------------------- epilogue variants


@pytest.mark.parametrize(
    "epilogue", ["pair", "rowfirst", "flat", "blockexact", "flatwide", "ileave"]
)
@pytest.mark.parametrize("nprobe", [1, 3, 8])
def test_epilogue_variants_match_xla(epilogue, nprobe):
    """Every epilogue must agree with the XLA reference path when exact
    reductions are used (approx=False): rowfirst is pair computed before
    the gather; flat is the single reduction (safe when exact)."""
    ivf, v = make_ivf()
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=5,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=5, interpret=True, epilogue=epilogue,
    )
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=2e-3)
    for a, b in zip(np.asarray(i_pal), np.asarray(i_ref)):
        assert len(set(a) & set(b)) >= 4


@pytest.mark.parametrize("epilogue", ["pair", "rowfirst"])
def test_rowfirst_identical_to_pair(epilogue):
    """rowfirst reduces the same rows as pair (just before the gather):
    bit-identical outputs, exact or approx."""
    ivf, v = make_ivf(n_per=70, k=6)
    q = jnp.asarray(v[:7] + 0.01, jnp.float32)
    outs = {}
    for epi in ("pair", "rowfirst"):
        outs[epi] = ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
            nprobe=4, k=8, interpret=True, epilogue=epi,
        )
    np.testing.assert_array_equal(
        np.asarray(outs["pair"][0]), np.asarray(outs["rowfirst"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs["pair"][1]), np.asarray(outs["rowfirst"][1])
    )


@pytest.mark.parametrize("nprobe", [16, 64, 96])
def test_ileave_exact_matches_xla_high_nprobe(nprobe):
    """The interleaved layout permutes the flat axis but the exact top-k
    candidate SET is layout-invariant: ileave/exact must match the XLA
    reference at the nprobe shapes where probe-major flat/approx was
    measured dropping winners (the 10M bin collision)."""
    ivf, v = make_ivf(n_per=40, k=96, d=128)
    q = jnp.asarray(v[:17] + 0.01, jnp.float32)
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10, interpret=True, epilogue="ileave",
        approx=False,
    )
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-3)
    assert np.array_equal(np.asarray(i_pal), np.asarray(i_ref))


@pytest.mark.parametrize("nprobe", [16, 64, 96])
def test_blockexact_matches_xla_high_nprobe(nprobe):
    """blockexact is an EXACT epilogue: the top-k_eff blocks ranked by
    block max contain every top-k_eff element, so the result must be
    identical to the XLA reference at the high-nprobe shapes where it is
    the intended replacement for flat/exact. With cap=64 here, nprobe=16
    falls below the prefilter-pays gate (k_eff*bs*2 > nprobe*cap) and
    exercises the internal flat fallback; 64/96 take the block path."""
    ivf, v = make_ivf(n_per=40, k=96, d=128)
    q = jnp.asarray(v[:17] + 0.01, jnp.float32)
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10,
    )
    s_pal, i_pal = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=nprobe, k=10, interpret=True, epilogue="blockexact",
    )
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-3)
    assert np.array_equal(np.asarray(i_pal), np.asarray(i_ref))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_blockexact_equals_flat_random(seed):
    """Property pin: blockexact and flat/exact are the same reduction
    (identical scores AND slots) across random geometries — batch sizes,
    nprobe, k — on both sides of the prefilter-pays gate."""
    rng = np.random.default_rng(seed)
    k_clusters = int(rng.integers(8, 40))
    ivf, v = make_ivf(n_per=int(rng.integers(10, 60)), k=k_clusters)
    b = int(rng.integers(1, 9))
    nprobe = int(rng.integers(1, k_clusters + 1))
    kq = int(rng.integers(1, 17))
    q = jnp.asarray(v[rng.integers(0, len(v), size=b)] + 0.01, jnp.float32)
    outs = [
        ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=nprobe, k=kq, interpret=True,
            epilogue=epi, approx=False,
        )
        for epi in ("flat", "blockexact")
    ]
    np.testing.assert_array_equal(
        np.asarray(outs[0][0]), np.asarray(outs[1][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0][1]), np.asarray(outs[1][1])
    )


def test_blockexact_bmax_xla_fallback(monkeypatch):
    """The prefilter maxima computed in-kernel (VSTPU_BMAX_XLA=0) and via
    XLA reduce_window (=1) are the same reduction: identical results."""
    ivf, v = make_ivf(n_per=40, k=32)
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("VSTPU_BMAX_XLA", flag)
        outs[flag] = ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=32, k=8, interpret=True,
            epilogue="blockexact",
        )
    np.testing.assert_array_equal(
        np.asarray(outs["0"][0]), np.asarray(outs["1"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs["0"][1]), np.asarray(outs["1"][1])
    )


def test_blockexact_probe_valid_masking():
    """Sharded path: probe entries masked via probe_valid must never
    surface — neither through the block-max ranking nor through the
    candidate gather (the gathered block values are real scores, so the
    mask must be re-applied at candidate level)."""
    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas_probed

    # 32 clusters x cap 64: k_eff=8, bs=64 -> the prefilter gate
    # (k_eff*bs*2 <= nprobe*cap) passes, so the BLOCK path runs (a
    # smaller kk would silently route to the internal flat fallback)
    ivf, v = make_ivf(n_per=40, k=32)
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    # probe every cluster, then mark half the probes invalid
    kk = ivf.k_clusters
    probed = jnp.tile(jnp.arange(kk, dtype=jnp.int32), (5, 1))
    probe_valid = jnp.tile(
        jnp.arange(kk, dtype=jnp.int32) % 2 == 0, (5, 1)
    )
    outs = {}
    for epi in ("flat", "blockexact"):
        s, gslot = ivf_scan_pallas_probed(
            q, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
            probed, probe_valid, k=8, interpret=True, epilogue=epi,
            approx=False,
        )
        outs[epi] = (np.asarray(s), np.asarray(gslot))
        finite = np.isfinite(outs[epi][0])
        clusters = outs[epi][1][finite] // ivf.cap
        assert (clusters % 2 == 0).all(), epi  # masked probes never returned
    np.testing.assert_array_equal(outs["flat"][0], outs["blockexact"][0])
    np.testing.assert_array_equal(outs["flat"][1], outs["blockexact"][1])


def test_ileave_approx_valid_slots():
    """ileave/approx decodes (cluster, slot) from the interleaved flat
    position: every returned global slot must name a LIVE row and scores
    must match a recompute from the returned coordinates."""
    ivf, v = make_ivf(n_per=40, k=12)
    q = jnp.asarray(v[:9] + 0.01, jnp.float32)
    s, gslot = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=6, k=8, interpret=True, epilogue="ileave", approx=True,
    )
    s, gslot = np.asarray(s), np.asarray(gslot)
    finite = np.isfinite(s)
    assert finite.any()
    cap = ivf.cap
    cid, slot = gslot[finite] // cap, gslot[finite] % cap
    assert (ivf.mask_host[cid, slot]).all()  # live rows only
    # the top-1 must agree with the exact scan (approx binning cannot
    # lose the global maximum: it survives its bin's max)
    _, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=6, k=1,
    )
    assert np.array_equal(gslot[:, :1], np.asarray(i_ref))


@pytest.mark.parametrize("wide", [1, 4])
def test_approx_wide_env_and_param(monkeypatch, wide):
    """VSTPU_APPROX_WIDE widens the flat approx epilogue (approx_wide*k
    approx candidates, exact-reduced); the top-1 and score decode must
    stay consistent with the exact scan."""
    ivf, v = make_ivf(n_per=40, k=12)
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    monkeypatch.setenv("VSTPU_APPROX_WIDE", str(wide))
    s, gslot = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=6, k=8, interpret=True, epilogue="flat", approx=True,
    )
    s_ref, i_ref = _ivf_scan(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=6, k=1,
    )
    assert np.array_equal(np.asarray(gslot)[:, :1], np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(s)[:, :1], np.asarray(s_ref), atol=2e-3
    )


def test_exact_epilogue_env(monkeypatch):
    """VSTPU_EXACT_EPILOGUE=1 routes the refined search through exact
    per-pair reductions (the recall-floor config)."""
    ivf, v = make_ivf()
    monkeypatch.setenv("VSTPU_EXACT_EPILOGUE", "1")
    s, i = ivf.search(jnp.asarray(v[:3] + 0.01), k=3, nprobe=3, refine=8)
    assert (i[:, 0] == np.arange(1, 4)).all()


def test_epilogue_env_selects(monkeypatch):
    ivf, v = make_ivf()
    q = jnp.asarray(v[:3] + 0.01, jnp.float32)
    base_s, base_i = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=3, k=5, interpret=True,
    )
    monkeypatch.setenv("VSTPU_EPILOGUE", "rowfirst")
    env_s, env_i = ivf_scan_pallas(
        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev, ivf.bucket_mask,
        nprobe=3, k=5, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(base_i), np.asarray(env_i))


def test_auto_epilogue_policy():
    """The measured r5 crossover (ROUND5.md §2): flat below 32k score
    columns, blockexact above; nprobe=1 keeps the caller's approx."""
    from vectorsearch_tpu.kernels.pallas_scan import resolve_auto_epilogue

    # nprobe=1: flat, approx passes through
    assert resolve_auto_epilogue(1, 3072, True) == ("flat", True)
    assert resolve_auto_epilogue(1, 3072, False) == ("flat", False)
    # 1M geometry (cap=3072): nprobe=8 -> flat/exact, 16+ -> blockexact
    assert resolve_auto_epilogue(8, 3072, True) == ("flat", False)
    assert resolve_auto_epilogue(16, 3072, True) == ("blockexact", False)
    assert resolve_auto_epilogue(64, 3072, True) == ("blockexact", False)
    # 10M geometry (cap=5120): crossover at nprobe >= 7
    assert resolve_auto_epilogue(6, 5120, True) == ("flat", False)
    assert resolve_auto_epilogue(8, 5120, True) == ("blockexact", False)
    # blockexact requires a 128-block-aligned cap (test geometries)
    assert resolve_auto_epilogue(64, 3100, True) == ("flat", False)


def test_blockexact_tile_major_multi_tile(monkeypatch):
    """cap > TILE_CAP engages the tile-major score layout (the tile
    index becomes a MAJOR output dim so the candidate fetch row-gathers
    1-tile rows — r5). Every prior test ran cap <= 1024 (tiles=1), which
    keeps the legacy layout; this pins exact flat==blockexact equality
    with tiles=2."""
    monkeypatch.setattr(constants, "BUCKET_ROUND", 1024)
    from vectorsearch_tpu.kernels import pallas_scan

    # n_per=900 -> bucket_capacity rounds to 2048 = 2 tiles
    ivf, v = make_ivf(n_per=900, k=4, d=64)
    assert ivf.cap == 2048 and ivf.cap > pallas_scan.TILE_CAP
    q = jnp.asarray(v[:5] + 0.01, jnp.float32)
    outs = [
        ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=nprobe, k=10, interpret=True,
            epilogue=epi, approx=False,
        )
        for nprobe in (2, 4)
        for epi in ("flat", "blockexact")
    ]
    # nprobe=2: outs[0] flat vs outs[1] blockexact; nprobe=4: outs[2]/[3]
    for flat_out, bx_out in ((outs[0], outs[1]), (outs[2], outs[3])):
        np.testing.assert_array_equal(
            np.asarray(flat_out[0]), np.asarray(bx_out[0])
        )
        np.testing.assert_array_equal(
            np.asarray(flat_out[1]), np.asarray(bx_out[1])
        )
