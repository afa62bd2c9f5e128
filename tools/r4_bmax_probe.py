"""Round-4 blockexact decision probe (real TPU, one session).

Same-session back-to-back (CLAUDE.md: cross-session wall times are
environment noise): the lane-padded in-kernel block maxima (bmax_xla=0,
fixed in r4 after Mosaic rejected the (1,qt,8) output block) vs the XLA
reduce_window fallback (=1) vs the monolithic flat/exact reduction and
the r2 pair epilogue, at nprobe=8/64, B=512, on the cached 1M setup.
Output decides the auto-policy defaults in kernels/pallas_scan.py.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

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
    from vectorsearch_tpu.kernels.pallas_scan import ivf_scan_pallas
    from vectorsearch_tpu.quant.layout import PackedVectors

    arrays = setup()
    log("bmaxprobe: devices=%s", jax.devices())
    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    log("bmaxprobe: index K=%d cap=%d", ivf.k_clusters, ivf.cap)
    queries, truth = arrays["queries"], arrays["truth"]
    flat_ids = ivf.ids.reshape(-1)
    batch = int(os.environ.get("VSTPU_R4_BATCH", 512))
    q_dev = jnp.asarray(np.resize(queries, (batch, DIM)))
    kc = 32
    interp = os.environ.get("VSTPU_R4_INTERPRET") == "1"

    def scan(nprobe, **kw):
        return lambda q: ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=nprobe, k=kc, interpret=interp, **kw,
        )

    def timeit(label, fn, rounds=2 if interp else 20):
        out = fn(q_dev)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn(q_dev)
        jax.block_until_ready(out)
        ms = 1000 * (time.perf_counter() - t0) / rounds
        log("bmaxprobe: %-46s %8.2f ms/batch (%6.0f QPS)",
            label, ms, batch * 1000 / ms)
        return ms

    def recall_of(gslot):
        got = flat_ids[np.clip(np.asarray(gslot), 0, flat_ids.size - 1)]
        nq = min(batch, len(truth))
        return float(np.mean([
            len(set(got[i][:TOPK]) & set(ids[truth[i]])) / TOPK
            for i in range(nq)
        ]))

    for nprobe in (8, 64):
        res = {}
        variants = [
            ("blockexact bmax=kernel",
             dict(epilogue="blockexact", approx=False, bmax_xla=False)),
            ("blockexact bmax=xla",
             dict(epilogue="blockexact", approx=False, bmax_xla=True)),
            ("flat/exact", dict(epilogue="flat", approx=False)),
            ("pair/exact", dict(epilogue="pair", approx=False)),
        ]
        for name, kw in variants:
            label = f"nprobe={nprobe} {name}"
            try:
                s, g = scan(nprobe, **kw)(jnp.asarray(queries[:batch]))
                res[name] = (np.asarray(s), np.asarray(g))
                log("bmaxprobe: %s recall(coarse)=%.4f", label,
                    recall_of(g))
                timeit(label, scan(nprobe, **kw))
            except Exception as e:
                log("bmaxprobe: %s FAILED: %s", label, str(e)[:400])
                traceback.print_exc(file=sys.stderr)
        # exactness cross-checks: every exact variant must agree
        base = res.get("flat/exact")
        for name in ("blockexact bmax=kernel", "blockexact bmax=xla",
                     "pair/exact"):
            if base is None or name not in res:
                continue
            s1, g1 = res[name]
            same = np.array_equal(g1, base[1]) and np.allclose(
                s1, base[0], atol=1e-5
            )
            log("bmaxprobe: nprobe=%d %s vs flat/exact: %s", nprobe, name,
                "IDENTICAL" if same else "MISMATCH!")
    log("bmaxprobe: done")


if __name__ == "__main__":
    main()
