"""Isolate the blockexact epilogue's hidden ~20 ms (real TPU, one session).

r4 found full blockexact ~27.5 ms/batch at nprobe=8 while groups+kernel
is only ~6.6 ms, yet per-stage back-of-envelope (pbm row gather 6 MB,
top-k [512, 3072], 8 MB slice gather, top-k [512, 4096]) says the
epilogue should cost ~2 ms — and the cost is IDENTICAL for kernel-side
and reduce_window maxima, so it lives in a shared stage. This times the
cumulative debug phases: groups -> kernel -> prefilter (pbm gather +
block top-k) -> candgather (candidate slice fetch + masks) -> full.
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

from ivf_perf_probe import DIM, N, log, setup  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas
    from vectorsearch_tpu.quant.layout import PackedVectors

    arrays = setup()
    log("bxphase: devices=%s", jax.devices())
    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    queries = arrays["queries"]
    batch = int(os.environ.get("VSTPU_R4_BATCH", 512))
    nprobe = int(os.environ.get("VSTPU_R4_NPROBE", 8))
    q_dev = jnp.asarray(np.resize(queries, (batch, DIM)))
    rounds = int(os.environ.get("VSTPU_R4_ROUNDS", 30))

    def timed(phase):
        # index arrays MUST be jit arguments, not closure captures: a
        # closed-over bucket store is lowered as a 2.39 GB module
        # constant, and every phase's compile ships it through the
        # tunnel (observed: the r5 first attempt printed the captured-
        # constants warning after phase 1 and never came back)
        def run(q, cn, buckets, counts, mask):
            return ivf_scan_pallas(
                q, cn, buckets, counts, mask, nprobe=nprobe, k=32,
                epilogue="blockexact", bmax_xla=False, approx=False,
                debug_phase=phase,
            )

        fn = jax.jit(run)
        args = (
            q_dev, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask,
        )
        fn(*args)[0].block_until_ready()  # compile
        t0 = time.perf_counter()
        out = None
        for _ in range(rounds):
            out = fn(*args)
        out[0].block_until_ready()
        ms = 1000 * (time.perf_counter() - t0) / rounds
        log("bxphase: nprobe=%d %-12s %8.2f ms/batch", nprobe, phase, ms)

    phases = os.environ.get(
        "VSTPU_BX_PHASES",
        "groups,kernel,prefilter,candgather,full",
    ).split(",")
    for phase in phases:
        timed(phase)
    log("bxphase: done")


if __name__ == "__main__":
    main()
