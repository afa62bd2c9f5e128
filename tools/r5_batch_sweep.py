"""Round-5 batch-size sweep (real TPU, one session).

The headline config (nprobe=1, B=512) carries ~1 ms of per-dispatch
work that is constant in B (centroid probe, group build, epilogue
launch overhead) on top of a bandwidth-bound kernel — so QPS/chip
should rise with batch until the kernel's HBM traffic saturates.
bench.py only measures B=128/512 (VSTPU_BENCH_FLAT_BATCH); this tool
sweeps B=512/1024/2048 at nprobe=1/2 with the EXACT serving program
(index/ivf._scan_refined, auto epilogue) on the cached 1M probe setup,
same-session back-to-back (CLAUDE.md: cross-session walls are noise).

Recall is batch-invariant (same program), so it is reported once per
nprobe from the canonical 512-query pass. Timing uses DISTINCT queries
for every B — tiling the 512 cached queries would alias repeats into
the same clusters, shrink the distinct-bucket read set, and overstate
QPS (the whole point of a bigger batch is amortizing bucket reads over
genuinely distinct queries). The extra queries are dequantized corpus
rows + the same noise recipe as the cached set, so their cluster
distribution matches.

    python tools/r5_batch_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectorsearch_tpu.utils import (  # noqa: E402
    enable_compile_cache,
    warm_device_transfer,
)

enable_compile_cache()
warm_device_transfer()

from ivf_perf_probe import DIM, N, TOPK, log, setup  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.index.ivf import _scan_refined
    from vectorsearch_tpu.quant.layout import PackedVectors

    arrays = setup()
    log("batchsweep: devices=%s", jax.devices())
    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    log("batchsweep: index K=%d cap=%d", ivf.k_clusters, ivf.cap)
    queries, truth = arrays["queries"], arrays["truth"]
    flat_ids = ivf.ids.reshape(-1)
    use_pallas = jax.default_backend() == "tpu"
    rounds = int(os.environ.get("VSTPU_SWEEP_ROUNDS", 20))

    def scan(nprobe):
        return lambda q: _scan_refined(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=nprobe, k_coarse=32, k=TOPK,
            use_pallas=use_pallas,
        )

    batches = tuple(int(b) for b in os.environ.get(
        "VSTPU_SWEEP_BATCHES", "512,1024,2048,4096"
    ).split(","))
    nprobes = tuple(int(p) for p in os.environ.get(
        "VSTPU_SWEEP_NPROBES", "1,2"
    ).split(","))

    # distinct timing-query pool: dequantized sampled rows + noise
    rng = np.random.default_rng(7)
    max_b = max(batches)
    pool_idx = rng.choice(N, size=max_b, replace=False)
    from vectorsearch_tpu.quant import layout

    rows = layout.unpack(PackedVectors(
        codes=packed.codes[pool_idx], scale=packed.scale[pool_idx],
        offset=packed.offset[pool_idx], inv_norm=packed.inv_norm[pool_idx],
    ))
    q_pool = (
        rows + rng.normal(size=(max_b, DIM)).astype(np.float32) * 0.1
    ).astype(np.float32)

    nq = len(queries)
    for nprobe in nprobes:
        fn = scan(nprobe)
        # recall once per nprobe (untiled queries)
        _, idx = fn(jnp.asarray(queries))
        got = flat_ids[np.clip(np.asarray(idx), 0, flat_ids.size - 1)]
        recall = float(np.mean([
            len(set(got[i][:TOPK]) & set(ids[truth[i]])) / TOPK
            for i in range(nq)
        ]))
        log("batchsweep: nprobe=%d recall@10=%.4f", nprobe, recall)
        for batch in batches:
            q_dev = jnp.asarray(q_pool[:batch])
            out = fn(q_dev)
            jax.block_until_ready(out)  # compile + warm
            t0 = time.perf_counter()
            last = None
            for _ in range(rounds):
                last = fn(q_dev)
            jax.block_until_ready(last)
            ms = 1000 * (time.perf_counter() - t0) / rounds
            log(
                "batchsweep: nprobe=%d B=%-5d %8.2f ms/batch  %8.0f QPS",
                nprobe, batch, ms, batch * 1000 / ms,
            )
    log("batchsweep: done")


if __name__ == "__main__":
    main()
