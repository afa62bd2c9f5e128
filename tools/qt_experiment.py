"""Group-size (QT) sweep for the grouped Pallas scan at high nprobe.

At nprobe=64 the scan is bound by codes-read amplification: with QT=32
and mean pairs/cluster ~32+, each probed cluster's codes tile is fetched
for 2+ groups. Doubling QT halves the group count (and the padded-group
compute tail). This tool reuses bench_10m_serving's caches and times
ivf_scan_pallas at several qt_max values in ONE process (qt_max is a jit
static arg, so no re-pack between points).

    python tools/qt_experiment.py          # nprobe=64, qt 32/64/128
    VSTPU_QT_NPROBES=8,64 VSTPU_QT_VALUES=32,64 python tools/qt_experiment.py
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
warm_device_transfer()

N = int(os.environ.get("VSTPU_SERVE10M_N", 10_000_000))
DIM = 768
CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".cache")
NPROBES = [int(x) for x in os.environ.get("VSTPU_QT_NPROBES", "64").split(",")]
QTS = [int(x) for x in os.environ.get("VSTPU_QT_VALUES", "32,64,128").split(",")]
BATCH = int(os.environ.get("VSTPU_QT_BATCH", 128))


def log(msg, *args):
    print(msg % args if args else msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas
    from vectorsearch_tpu.quant.layout import PackedVectors
    from vectorsearch_tpu.utils import wait_device_warm

    corpus = os.path.join(CACHE_DIR, f"build-corpus-{N}.npz")
    cents = os.path.join(CACHE_DIR, f"serve{N}-cents.npz")
    if not (os.path.exists(corpus) and os.path.exists(cents)):
        log("qt: need bench_build + bench_10m_serving caches first")
        return 1
    z = np.load(corpus)
    packed = PackedVectors(
        codes=z["codes"], scale=z["scale"], offset=z["offset"],
        inv_norm=z["inv_norm"],
    )
    cz = np.load(cents)
    wait_device_warm()
    t0 = time.perf_counter()
    ivf = IVFIndex.build(
        packed, np.arange(1, N + 1, dtype=np.int64), cz["centroids"],
        assignments=cz["assignments"], headroom=1.0,
    )
    log("qt: pack %.1fs (K=%d cap=%d)", time.perf_counter() - t0,
        ivf.k_clusters, ivf.cap)

    rng = np.random.default_rng(123)
    q = jnp.asarray(
        rng.standard_normal((BATCH, DIM)).astype(np.float32)
    )
    for nprobe in NPROBES:
        for qt in QTS:
            fn = lambda: ivf_scan_pallas(
                q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=nprobe, k=32, approx=True,
                qt_max=qt,
            )
            fn()[0].block_until_ready()
            t0 = time.perf_counter()
            rounds = 10
            last = None
            for _ in range(rounds):
                last = fn()
            last[0].block_until_ready()
            dt = time.perf_counter() - t0
            log(
                "qt: nprobe=%d qt_max=%d -> %.1f qps (%.2f ms/batch of %d)",
                nprobe, qt, BATCH * rounds / dt, dt / rounds * 1e3, BATCH,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
