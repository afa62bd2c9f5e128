"""IVF kernel perf probe (real TPU): grouped Pallas scan vs XLA path.

Iterating on the remote-tunnel TPU is expensive (every compile is a
30-120s HTTP round trip), so this tool caches the expensive setup — packed
1M x 768 corpus, k-means centroids, assignments, queries, f32 ground
truth — in .cache/ivfprobe-<N>.npz and only re-times the scan kernels on
repeat runs.

Usage: python tools/ivf_perf_probe.py [--xla] [--no-refine]
Env: VSTPU_PROBE_N (default 1M), VSTPU_PROBE_BATCHES ("512,128"),
     VSTPU_PROBE_NPROBES ("1,8,64")
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vectorsearch_tpu.utils import (  # noqa: E402
    enable_compile_cache,
    warm_device_transfer,
)

enable_compile_cache()
warm_device_transfer()  # absorb the tunnel's first-D2H stall during setup

N = int(os.environ.get("VSTPU_PROBE_N", 1_000_000))
DIM = 768
K_CLUSTERS = 1024
N_QUERIES = 512
TOPK = 10
CACHE = os.path.join(
    os.path.dirname(__file__), "..", ".cache", f"ivfprobe-{N}.npz"
)


def log(msg, *args):
    print(msg % args if args else msg, file=sys.stderr, flush=True)


def setup():
    if os.path.exists(CACHE):
        log("probe: loading cached setup %s", CACHE)
        z = np.load(CACHE)
        return {k: z[k] for k in z.files}

    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.build import build_centroids
    from vectorsearch_tpu.quant import layout

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import make_corpus  # reuse the clustered generator

    t0 = time.perf_counter()
    data = make_corpus(N, DIM, K_CLUSTERS)
    log("probe: corpus %.1fs", time.perf_counter() - t0)
    packed = layout.pack_float(data)

    t0 = time.perf_counter()
    result = build_centroids(
        packed,
        k=K_CLUSTERS,
        min_cluster_size=max(1, (N // K_CLUSTERS) // 10),
        max_iters=10,
        superset_iters=4,
        chunk=65_536,
    )
    log("probe: kmeans %.1fs", time.perf_counter() - t0)

    rng = np.random.default_rng(123)
    q_idx = rng.choice(N, size=N_QUERIES, replace=False)
    queries = (
        data[q_idx]
        + rng.normal(size=(N_QUERIES, DIM)).astype(np.float32) * 0.1
    ).astype(np.float32)

    t0 = time.perf_counter()
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    corpus_dev = jnp.asarray(
        data / np.linalg.norm(data, axis=-1, keepdims=True)
    )

    @jax.jit
    def exact_topk(q, corpus):
        s = jnp.dot(
            q, corpus.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.top_k(s, TOPK)[1]

    truth = np.empty((N_QUERIES, TOPK), np.int64)
    for i in range(0, N_QUERIES, 64):
        truth[i : i + 64] = np.asarray(
            exact_topk(jnp.asarray(qn[i : i + 64]), corpus_dev)
        )
    del corpus_dev
    log("probe: ground truth %.1fs", time.perf_counter() - t0)

    arrays = {
        "codes": np.asarray(packed.codes),
        "scale": np.asarray(packed.scale),
        "offset": np.asarray(packed.offset),
        "inv_norm": np.asarray(packed.inv_norm),
        "centroids": np.asarray(result.centroids),
        "assignments": np.asarray(result.assignments),
        "queries": queries,
        "truth": truth,
    }
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez(CACHE, **arrays)
    log("probe: cached setup -> %s", CACHE)
    return arrays


def phases_mode(ivf, queries, truth, ids, flat_ids):
    """VERDICT r3 next-step #3: measured breakdown of the high-nprobe scan
    (group build / kernel / epilogue variants) against the HBM roofline."""
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas

    batch = int(os.environ.get("VSTPU_PHASE_BATCH", 512))
    nprobe = int(os.environ.get("VSTPU_PHASE_NPROBE", 64))
    kc = 32
    # comma-separated substring filter over variant labels: each compile
    # is a 30-120s tunnel round trip, so measuring two new variants must
    # not re-pay for the whole catalogue
    only = [
        s for s in os.environ.get("VSTPU_PHASE_ONLY", "").split(",") if s
    ]

    def wanted(label: str) -> bool:
        return not only or any(s in label for s in only)
    q_dev = jnp.asarray(np.resize(queries, (batch, DIM)))
    kk, cap, d = ivf.buckets.codes.shape

    def timeit(label, fn, rounds=20):
        out = fn(q_dev)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn(q_dev)
        jax.block_until_ready(out)
        ms = 1000 * (time.perf_counter() - t0) / rounds
        log("phases: %-34s %8.2f ms/batch  (%.0f QPS)",
            label, ms, batch * 1000 / ms)
        return ms

    # how many distinct clusters does this batch actually probe?
    s_p, i_p = ivf.probe(queries[:batch], nprobe)
    distinct = len(np.unique(i_p))
    p = batch * nprobe
    qt = max(8, min(32, 1 << int(np.ceil(np.log2(max(1, -(-2 * p // kk)))))))
    g_max = p // qt + min(kk, p)
    codes_gb = distinct * cap * d / 1e9  # best case: every group distinct
    scores_gb = g_max * qt * cap * 4 / 1e9
    log(
        "phases: B=%d nprobe=%d K=%d cap=%d | P=%d qt~%d g_max=%d "
        "distinct-clusters=%d | codes>=%.2f GB, score-grid=%.2f GB/dispatch",
        batch, nprobe, kk, cap, p, qt, g_max, distinct, codes_gb, scores_gb,
    )

    results = {}
    for label, kwargs in [
        ("groups-only", dict(debug_phase="groups")),
        ("groups+kernel", dict(debug_phase="kernel")),
        ("full pair/approx", dict(epilogue="pair", approx=True)),
        ("full pair/exact", dict(epilogue="pair", approx=False)),
        ("full rowfirst/approx", dict(epilogue="rowfirst", approx=True)),
        ("full rowfirst/exact", dict(epilogue="rowfirst", approx=False)),
        ("full flat/approx", dict(epilogue="flat", approx=True)),
        ("full flat/exact", dict(epilogue="flat", approx=False)),
        ("full blockexact", dict(epilogue="blockexact", approx=False)),
        ("full flatwide/approx", dict(epilogue="flatwide", approx=True)),
        ("full ileave/approx", dict(epilogue="ileave", approx=True)),
        ("full ileave/exact", dict(epilogue="ileave", approx=False)),
    ]:
        if not wanted(label):
            continue
        try:
            fn = lambda q, kw=kwargs: ivf_scan_pallas(
                q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=nprobe, k=kc, **kw,
            )
            results[label] = timeit(label, fn)
        except Exception as e:
            log("phases: %s FAILED: %s", label, str(e)[:200])
    for qt_ovr in (64, 128):
        if not wanted(f"qt_max={qt_ovr}"):
            continue
        try:
            fn = lambda q, qo=qt_ovr: ivf_scan_pallas(
                q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=nprobe, k=kc, approx=True,
                qt_max=qo,
            )
            results[f"pair/approx qt_max={qt_ovr}"] = timeit(
                f"full pair/approx qt_max={qt_ovr}", fn)
        except Exception as e:
            log("phases: qt=%d FAILED: %s", qt_ovr, str(e)[:200])
    # the winning epilogue (flat) with halved codes traffic, and
    # flat/approx at tighter approx_max_k recall targets (more bins ->
    # fewer mod-L collisions) — can approx reach the exact floor?
    for label, kwargs in [
        ("flat/exact qt_max=64",
         dict(epilogue="flat", approx=False, qt_max=64)),
        ("flat/approx qt_max=64",
         dict(epilogue="flat", approx=True, qt_max=64)),
        ("flat/approx rt=0.99",
         dict(epilogue="flat", approx=True, approx_recall=0.99)),
        ("flat/approx rt=0.999",
         dict(epilogue="flat", approx=True, approx_recall=0.999)),
        ("flat/approx rt=0.999 qt64",
         dict(epilogue="flat", approx=True, approx_recall=0.999,
              qt_max=64)),
        ("flat/approx wide=4",
         dict(epilogue="flat", approx=True, approx_wide=4)),
        ("flat/approx wide=8",
         dict(epilogue="flat", approx=True, approx_wide=8)),
        ("flat/approx wide=4 rt=0.99",
         dict(epilogue="flat", approx=True, approx_wide=4,
              approx_recall=0.99)),
        ("flat/approx wide=4 rt=0.99 qt64",
         dict(epilogue="flat", approx=True, approx_wide=4,
              approx_recall=0.99, qt_max=64)),
    ]:
        if not wanted(label):
            continue
        try:
            fn = lambda q, kw=kwargs: ivf_scan_pallas(
                q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=nprobe, k=kc, **kw,
            )
            results[label] = timeit("full " + label, fn)
        except Exception as e:
            log("phases: %s FAILED: %s", label, str(e)[:200])

    if "groups+kernel" in results and "groups-only" in results:
        kern = results["groups+kernel"] - results["groups-only"]
        log(
            "phases: kernel-only ~%.2f ms -> %.0f GB/s effective over "
            "codes+scores %.2f GB (v5e HBM ~819 GB/s)",
            kern, (codes_gb + scores_gb) / (kern / 1000), codes_gb + scores_gb,
        )
    # recall sanity for each full epilogue (64 queries is plenty here)
    for label, kwargs in [
        ("pair/approx", dict(epilogue="pair", approx=True)),
        ("pair/exact", dict(epilogue="pair", approx=False)),
        ("rowfirst/approx", dict(epilogue="rowfirst", approx=True)),
        ("flat/approx", dict(epilogue="flat", approx=True)),
        ("flat/exact", dict(epilogue="flat", approx=False)),
        ("blockexact", dict(epilogue="blockexact", approx=False)),
        ("flatwide/approx", dict(epilogue="flatwide", approx=True)),
        ("ileave/approx", dict(epilogue="ileave", approx=True)),
        ("ileave/exact", dict(epilogue="ileave", approx=False)),
        ("flat/approx rt=0.99",
         dict(epilogue="flat", approx=True, approx_recall=0.99)),
        ("flat/approx rt=0.999",
         dict(epilogue="flat", approx=True, approx_recall=0.999)),
        ("flat/approx wide=4",
         dict(epilogue="flat", approx=True, approx_wide=4)),
        ("flat/approx wide=8",
         dict(epilogue="flat", approx=True, approx_wide=8)),
        ("flat/approx wide=4 rt=0.99",
         dict(epilogue="flat", approx=True, approx_wide=4,
              approx_recall=0.99)),
    ]:
        if not wanted(label):
            continue
        try:
            _, gslot = ivf_scan_pallas(
                jnp.asarray(queries[:batch]), ivf.centroids_n, ivf.buckets,
                ivf.counts_dev, ivf.bucket_mask, nprobe=nprobe, k=kc, **kwargs,
            )
            got = flat_ids[np.clip(np.asarray(gslot), 0, flat_ids.size - 1)]
            nq = min(batch, len(truth))
            recall = np.mean([
                len(set(got[i][:TOPK]) & set(ids[truth[i]])) / TOPK
                for i in range(nq)
            ])
            log("phases: recall@%d (coarse, no refine) %-16s %.4f",
                TOPK, label, recall)
        except Exception as e:
            log("phases: recall %s FAILED: %s", label, str(e)[:160])


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.index.ivf import _ivf_scan, _scan_refined
    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas
    from vectorsearch_tpu.quant.layout import PackedVectors

    use_xla = "--xla" in sys.argv
    with_refine = "--no-refine" not in sys.argv
    arrays = setup()
    log("probe: devices=%s", jax.devices())

    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    t0 = time.perf_counter()
    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    log("probe: bucket pack %.1fs (K=%d cap=%d)",
        time.perf_counter() - t0, ivf.k_clusters, ivf.cap)
    queries, truth = arrays["queries"], arrays["truth"]
    flat_ids = ivf.ids.reshape(-1)

    if "--phases" in sys.argv:
        ids = np.arange(1, N + 1, dtype=np.int64)
        return phases_mode(ivf, queries, truth, ids, flat_ids)

    scan = _ivf_scan if use_xla else ivf_scan_pallas
    batches = [int(x) for x in os.environ.get(
        "VSTPU_PROBE_BATCHES", "512,128").split(",")]
    nprobes = [int(x) for x in os.environ.get(
        "VSTPU_PROBE_NPROBES", "1,8,64").split(",")]

    for batch in batches:
        for nprobe in nprobes:
            if with_refine:
                fn = lambda q, np_=nprobe: _scan_refined(
                    q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                    ivf.bucket_mask, nprobe=np_, k_coarse=32, k=TOPK,
                    use_pallas=not use_xla,
                )
            else:
                fn = lambda q, np_=nprobe: scan(
                    q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                    ivf.bucket_mask, nprobe=np_, k=TOPK,
                )
            # recall over all 512 queries
            got = np.empty((N_QUERIES, TOPK), np.int64)
            t0 = time.perf_counter()
            for i in range(0, N_QUERIES, batch):
                s, gslot = fn(jnp.asarray(queries[i : i + batch]))
                gslot = np.asarray(gslot)[: min(batch, N_QUERIES - i)]
                got[i : i + batch] = flat_ids[
                    np.clip(gslot, 0, flat_ids.size - 1)
                ]
            compile_s = time.perf_counter() - t0
            recall = np.mean([
                len(set(got[i]) & set(ids[truth[i]])) / TOPK
                for i in range(N_QUERIES)
            ])
            # steady-state QPS
            q_dev = jnp.asarray(np.resize(queries, (batch, DIM)))
            fn(q_dev)[0].block_until_ready()
            rounds = 20
            t0 = time.perf_counter()
            last = None
            for _ in range(rounds):
                last = fn(q_dev)
            last[0].block_until_ready()
            dt = time.perf_counter() - t0
            log(
                "probe: %s%s B=%d nprobe=%d recall@10=%.4f qps=%.0f "
                "(%.2f ms/batch, first-pass %.1fs)",
                "xla" if use_xla else "pallas-grouped",
                "+refine" if with_refine else "",
                batch, nprobe, recall, batch * rounds / dt,
                1000 * dt / rounds, compile_s,
            )


if __name__ == "__main__":
    main()
