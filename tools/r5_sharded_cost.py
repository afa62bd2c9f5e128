"""Sharded-path dispatch overhead vs the single-device path (VERDICT r4
weak#3 / next-steps #3).

r4 proved ShardedIVF.search is CORRECT on a real-TPU mesh (top-k overlap
1.0000 with the compiled Pallas kernel under shard_map) but never
measured what shard_map dispatch costs relative to the plain path. On a
1-device mesh both programs do identical work (one shard = the whole
index; the all_gather(k) merge degenerates to a copy), so the wall-time
delta IS the sharding machinery's overhead: shard_map tracing/dispatch,
the probe broadcast, and the k-merge epilogue.

Back-to-back in one session (CLAUDE.md: cross-session walls are noise):

  single : IVFIndex.search        x ROUNDS (includes D2H, like serving)
  sharded: ShardedIVF.search      x ROUNDS (includes D2H)

Prints overhead %% — the "DB replicas -> sharded reads" story claims
<10%%. Reference for what this replaces: replica read round-robin,
database/database.go:86-103.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("VSTPU_CPU") == "1":
    # CPU smoke of the script's control flow: must run OFF the chip so
    # it can execute beside a TPU job (JAX_PLATFORMS env alone is
    # ignored — the axon plugin sets jax.config at import, CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

from vectorsearch_tpu.utils import (  # noqa: E402
    enable_compile_cache,
    warm_device_transfer,
)

enable_compile_cache()
warm_device_transfer()

from ivf_perf_probe import DIM, N, TOPK, log, setup  # noqa: E402


def main():
    import jax

    from jax.sharding import Mesh

    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.parallel.sharded import ShardedIVF, _pallas_mode
    from vectorsearch_tpu.quant.layout import PackedVectors

    arrays = setup()
    log("shcost: devices=%s", jax.devices())
    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    queries = arrays["queries"]
    batch = int(os.environ.get("VSTPU_R4_BATCH", 512))
    rounds = int(os.environ.get("VSTPU_R4_ROUNDS", 20))
    interp = os.environ.get("VSTPU_R4_INTERPRET") == "1"
    if interp:
        rounds = 2
    q = np.resize(queries, (batch, DIM)).astype(np.float32)

    use_pallas, interpret = _pallas_mode()
    log("shcost: sharded mode use_pallas=%s interpret=%s", use_pallas,
        interpret)

    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sivf = ShardedIVF.build(
        mesh, packed, ids, arrays["centroids"],
        assignments=arrays["assignments"],
    )
    log("shcost: K=%d cap=%d batch=%d rounds=%d", ivf.k_clusters, ivf.cap,
        batch, rounds)

    import jax.numpy as jnp

    from vectorsearch_tpu.index.ivf import _scan_refined
    from vectorsearch_tpu.kernels.pallas_scan import (
        _approx_wide,
        _default_epilogue,
        _qt_max,
    )
    from vectorsearch_tpu.parallel.sharded import _ivf_scan_factory

    q_dev = jnp.asarray(q)
    results = {}
    for nprobe in (8, 64):
        # ---- DEVICE-time comparison: submit all rounds async, ONE
        # block at the end. Through the tunnel every synchronous D2H is
        # a 200-800 ms round trip that swamps device time — the first
        # r5 run of this tool timed .search() end-to-end and measured
        # tunnel noise (+61%/-3% at nprobe=8/64, impossible
        # structurally).
        if use_pallas:
            qt, epi, aw = _qt_max(), _default_epilogue(), _approx_wide()
        else:
            qt = epi = aw = None
        shfn = _ivf_scan_factory(
            mesh, TOPK, nprobe, sivf.clusters_per_shard, sivf.cap,
            sivf.k_clusters, 32, use_pallas, interpret, qt, epi, aw,
        )

        def single_dev():
            return _scan_refined(
                q_dev, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=nprobe, k_coarse=32, k=TOPK,
                use_pallas=use_pallas,
            )

        def sharded_dev():
            return shfn(
                q_dev, sivf.centroids_n, sivf.buckets, sivf.counts,
                sivf.bucket_mask,
            )

        for label, fn in (
            ("single", single_dev), ("sharded", sharded_dev)
        ):
            jax.block_until_ready(fn())  # compile + warm
            t0 = time.perf_counter()
            out = None
            for _ in range(rounds):
                out = fn()
            jax.block_until_ready(out)
            ms = 1000 * (time.perf_counter() - t0) / rounds
            results[(nprobe, label)] = ms
            log("shcost: nprobe=%-3d %-8s %8.2f ms/batch (%6.0f QPS, "
                "device-time, one final sync)", nprobe, label, ms,
                batch * 1000 / ms)
        a, b = results[(nprobe, "single")], results[(nprobe, "sharded")]
        log("shcost: nprobe=%-3d sharded overhead %+.1f%%", nprobe,
            100 * (b - a) / a)
        # sanity: identical candidates on the 1-device mesh (full
        # .search() e2e paths, including the id mapping)
        s1, i1 = ivf.search(q, k=TOPK, nprobe=nprobe, refine=32)
        s2, i2 = sivf.search(q, k=TOPK, nprobe=nprobe, refine=32)
        ov = np.mean([
            len(set(i1[r]) & set(i2[r])) / TOPK for r in range(batch)
        ])
        log("shcost: nprobe=%-3d top-k overlap single-vs-sharded %.4f",
            nprobe, ov)
    log("shcost: done")


if __name__ == "__main__":
    main()
