"""Round-4 real-chip validation (VERDICT r3 next-steps #2, #3, #4).

One TPU session, back-to-back (same-session comparisons only — CLAUDE.md:
late-session wall times are environment noise):

  A. blockexact bmax source A/B: in-kernel reduce (bmax_xla=False — never
     yet compiled by real Mosaic) vs XLA reduce_window (=True, shipping
     default). Asserts bit-identical results, then times both at
     nprobe=8/64, B=512.
  B. qt_max sweep {32, 64, 128} under blockexact at nprobe=8/64 — the r3
     sweep ran against the pair-epilogue economics; blockexact makes the
     kernel the bound, so halved codes traffic should now show up.
  C. Sharded Mosaic compile smoke: 1-device TPU Mesh, ShardedIVF.search
     with the COMPILED (non-interpret) ivf_scan_pallas_probed, parity vs
     the single-device refined scan (VERDICT r3 weak#3: every prior
     execution of the sharded kernel was interpret-mode on CPU meshes).

Reuses tools/ivf_perf_probe.py's cached setup (.cache/ivfprobe-<N>.npz).
Results print to stderr; exit 0 even on partial failure so one Mosaic
rejection doesn't hide the rest of the session's measurements.
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
    log("r4: devices=%s", jax.devices())
    packed = PackedVectors(
        codes=arrays["codes"], scale=arrays["scale"],
        offset=arrays["offset"], inv_norm=arrays["inv_norm"],
    )
    ids = np.arange(1, N + 1, dtype=np.int64)
    ivf = IVFIndex.build(
        packed, ids, arrays["centroids"], assignments=arrays["assignments"]
    )
    log("r4: index K=%d cap=%d", ivf.k_clusters, ivf.cap)
    queries, truth = arrays["queries"], arrays["truth"]
    flat_ids = ivf.ids.reshape(-1)
    batch = int(os.environ.get("VSTPU_R4_BATCH", 512))
    q_dev = jnp.asarray(np.resize(queries, (batch, DIM)))
    kc = 32

    # VSTPU_R4_INTERPRET=1: CPU smoke of the script's control flow only
    # (interpret-mode kernels; proves nothing about Mosaic)
    interp = os.environ.get("VSTPU_R4_INTERPRET") == "1"

    def coarse(nprobe, **kw):
        return lambda q: ivf_scan_pallas(
            q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
            ivf.bucket_mask, nprobe=nprobe, k=kc,
            epilogue="blockexact", approx=False, interpret=interp, **kw,
        )

    def timeit(label, fn, rounds=2 if interp else 20):
        out = fn(q_dev)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn(q_dev)
        jax.block_until_ready(out)
        ms = 1000 * (time.perf_counter() - t0) / rounds
        log("r4: %-44s %8.2f ms/batch (%.0f QPS)", label, ms, batch * 1000 / ms)
        return ms

    def recall_of(gslot):
        got = flat_ids[np.clip(np.asarray(gslot), 0, flat_ids.size - 1)]
        nq = min(batch, len(truth))
        return float(np.mean([
            len(set(got[i][:TOPK]) & set(ids[truth[i]])) / TOPK
            for i in range(nq)
        ]))

    # ---- A: bmax in-kernel vs XLA reduce_window -------------------------
    for nprobe in (8, 64):
        res = {}
        for bx in (True, False):
            label = f"blockexact nprobe={nprobe} bmax_xla={int(bx)}"
            try:
                s, g = coarse(nprobe, bmax_xla=bx)(jnp.asarray(queries[:batch]))
                res[bx] = (np.asarray(s), np.asarray(g))
                log("r4: %s recall(coarse)=%.4f", label, recall_of(g))
                timeit(label, coarse(nprobe, bmax_xla=bx))
            except Exception as e:
                log("r4: %s FAILED: %s", label, str(e)[:400])
                traceback.print_exc(file=sys.stderr)
        if len(res) == 2:
            s1, g1 = res[True]
            s0, g0 = res[False]
            same = np.array_equal(g1, g0) and np.allclose(s1, s0, atol=1e-5)
            log("r4: bmax parity nprobe=%d: %s", nprobe,
                "IDENTICAL" if same else "MISMATCH!")

    # ---- B: qt_max sweep under blockexact -------------------------------
    for nprobe in (8, 64):
        for qt in (32, 64, 128):
            try:
                timeit(
                    f"blockexact nprobe={nprobe} qt_max={qt}",
                    coarse(nprobe, qt_max=qt),
                )
            except Exception as e:
                log("r4: qt=%d nprobe=%d FAILED: %s", qt, nprobe, str(e)[:300])

    # ---- C: sharded compiled-Mosaic smoke (1-device TPU mesh) -----------
    try:
        from jax.sharding import Mesh

        from vectorsearch_tpu.index.ivf import _scan_refined
        from vectorsearch_tpu.parallel.sharded import ShardedIVF, _pallas_mode

        use_pallas, interpret = _pallas_mode()
        log("r4: sharded mode use_pallas=%s interpret=%s (must be True/False)",
            use_pallas, interpret)
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        t0 = time.perf_counter()
        sivf = ShardedIVF.build(
            mesh, packed, ids, arrays["centroids"],
            assignments=arrays["assignments"],
        )
        log("r4: sharded build %.1fs", time.perf_counter() - t0)
        for nprobe in (8,):
            t0 = time.perf_counter()
            s_sh, id_sh = sivf.search(queries[:batch], k=TOPK, nprobe=nprobe,
                                      refine=kc)
            log("r4: sharded search (compile+run) %.1fs", time.perf_counter() - t0)
            # parity vs the single-device serving program
            s_1d, g_1d = _scan_refined(
                jnp.asarray(queries[:batch]), ivf.centroids_n, ivf.buckets,
                ivf.counts_dev, ivf.bucket_mask, nprobe=nprobe, k_coarse=kc,
                k=TOPK, use_pallas=not interp,
            )
            id_1d = flat_ids[np.clip(np.asarray(g_1d), 0, flat_ids.size - 1)]
            match = np.mean([
                len(set(id_sh[i]) & set(id_1d[i])) / TOPK for i in range(batch)
            ])
            sh_recall = float(np.mean([
                len(set(id_sh[i]) & set(ids[truth[i]])) / TOPK
                for i in range(min(batch, len(truth)))
            ]))
            log("r4: sharded-vs-single parity nprobe=%d overlap=%.4f "
                "recall=%.4f", nprobe, match, sh_recall)
            # steady-state timing of the sharded program
            def shfn(q):
                return sivf.search(np.asarray(q), k=TOPK, nprobe=nprobe,
                                   refine=kc)
            t0 = time.perf_counter()
            rounds = 2 if interp else 10
            for _ in range(rounds):
                shfn(queries[:batch])
            dt = time.perf_counter() - t0
            log("r4: sharded steady %.2f ms/batch (%.0f QPS, incl. D2H)",
                1000 * dt / rounds, batch * rounds / dt)
    except Exception as e:
        log("r4: sharded smoke FAILED: %s", str(e)[:600])
        traceback.print_exc(file=sys.stderr)

    log("r4: done")


if __name__ == "__main__":
    main()
