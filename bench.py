"""Headline benchmark: QPS/chip at recall@10 on 1M x 768 int8 IVF.

BASELINE.json north star: >= 10,000 QPS/chip at recall@10 >= the reference
uint8 IVF pipeline on 1M x 768 with 1024 centroids. The reference publishes
no numbers (BASELINE.md); vs_baseline is reported against the 10k QPS/chip
target. The reference's own always-produced analogue is prefTest's logged
startup measurements (/root/reference/main.go:247-286).

Prints the contract JSON line {"metric", "value", "unit", "vs_baseline"}
on stdout; all detail goes to stderr.

Resilience (VERDICT r3 weak#1 — r3's run hung in device init and died at
the driver timeout with zero output):
  * A daemon watchdog emits the best-so-far JSON line and exits 0 when the
    deadline (VSTPU_BENCH_DEADLINE, default 1800s) expires — even if the
    main thread is stuck inside a remote-tunnel native call.
  * SIGTERM/SIGINT emit the best-so-far line before exiting (the driver's
    `timeout` sends SIGTERM first).
  * The JSON line is (re)printed after every measurement that improves the
    headline, so even a SIGKILL leaves the latest best on stdout.
  * Setup (packed corpus + queries + f32 ground truth, ~800 MB) is cached
    in .cache/ keyed by the config, so reruns skip ~260s of recompute and
    the ground-truth device pass. The k-means build is never cached — its
    wall time is part of the reported metric.

Runs on the real TPU (default platform). Scale down for smoke runs with
VSTPU_BENCH_N / VSTPU_BENCH_K / VSTPU_BENCH_DIM. VSTPU_BENCH_FULL=1
restores the wide r2 sweep (B=128 variants, plain flat scan).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

N = int(os.environ.get("VSTPU_BENCH_N", 1_000_000))
DIM = int(os.environ.get("VSTPU_BENCH_DIM", 768))
K_CLUSTERS = int(os.environ.get("VSTPU_BENCH_K", 1024))
N_QUERIES = int(os.environ.get("VSTPU_BENCH_QUERIES", 512))
BATCH = int(os.environ.get("VSTPU_BENCH_BATCH", 128))
NPROBE = int(os.environ.get("VSTPU_BENCH_NPROBE", 8))
# 2700 s: the tunnel's late-session first-D2H stall alone reached >25 min
# in r5 (CLAUDE.md), which would have eaten a 1800 s budget whole. The
# driver's own timeout demonstrably exceeds ~25 min of runtime (BENCH_r03
# tail spans >=25 min before its rc=124), and every path here — watchdog,
# SIGTERM handler, per-measurement re-emission — leaves the best-so-far
# JSON line on stdout even if the outer timeout fires first.
DEADLINE_S = float(os.environ.get("VSTPU_BENCH_DEADLINE", 2700))
FULL = os.environ.get("VSTPU_BENCH_FULL") == "1"
TOPK = 10
CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".cache",
    f"bench-setup-{N}x{DIM}-k{K_CLUSTERS}-q{N_QUERIES}.npz",
)
_T0 = time.monotonic()


def log(msg, *args):
    print(
        "[%7.1fs] %s" % (time.monotonic() - _T0, msg % args if args else msg),
        file=sys.stderr,
        flush=True,
    )


# ---------------------------------------------------------------------------
# Best-so-far state + emission. The watchdog/signal paths must never block
# on the device, so everything here is pure host state.
_state_lock = threading.Lock()
_state = {
    "results": [],  # (label, qps, recall)
    "build_s": None,
    "phase": "init",
    "emitted": None,  # last JSON line printed (dedup)
}


def _headline_line():
    with _state_lock:
        results = list(_state["results"])
        build_s = _state["build_s"]
        phase = _state["phase"]
    if not results:
        return json.dumps({
            "metric": (
                f"QPS/chip {N}x{DIM} int8 corpus "
                f"(NO MEASUREMENT COMPLETED; died in phase '{phase}' "
                f"at {time.monotonic() - _T0:.0f}s; see stderr)"
            ),
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
        })
    eligible = [r for r in results if r[2] >= 0.90]
    met_floor = bool(eligible)
    label, qps, recall = max(eligible or results, key=lambda r: r[1])
    floor_txt = "recall@10>=0.9" if met_floor else "NO config met recall 0.9"
    build_txt = f", kmeans build={build_s:.0f}s" if build_s else ""
    partial = "" if phase == "done" else f" [partial: phase '{phase}']"
    return json.dumps({
        "metric": (
            f"QPS/chip at {floor_txt}, {N}x{DIM} int8 corpus "
            f"({label}, recall={recall:.4f}{build_txt}){partial}"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10_000.0, 3),
    })


def emit_headline(reason=""):
    line = _headline_line()
    with _state_lock:
        if line == _state["emitted"]:
            return
        _state["emitted"] = line
    if reason:
        log("bench: emitting headline (%s)", reason)
    print(line, flush=True)


def set_phase(phase):
    with _state_lock:
        _state["phase"] = phase
    log("bench: phase=%s", phase)


def _watchdog():
    remaining = DEADLINE_S - (time.monotonic() - _T0)
    if remaining > 0:
        time.sleep(remaining)
    emit_headline(f"deadline {DEADLINE_S:.0f}s expired")
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # the main thread may be stuck in a native tunnel call


def _on_term(signum, frame):
    emit_headline(f"signal {signum}")
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _install_resilience():
    """Watchdog + signal emission. Called only when run as a script —
    tools import this module for make_corpus and must not inherit a
    deadline that os._exits their process."""
    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)


from vectorsearch_tpu.utils import enable_compile_cache, warm_device_transfer


def make_corpus(n, dim, k, seed=0):
    """Clustered synthetic corpus (vectorpedia-style locality)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim), dtype=np.float32)
    assign = rng.integers(0, k, size=n)
    out = centers[assign] * np.float32(2.0)
    # chunked f32 noise: ~4x faster than normal() (no f64 intermediate)
    for start in range(0, n, 100_000):
        end = min(start + 100_000, n)
        out[start:end] += rng.standard_normal((end - start, dim), dtype=np.float32)
    return out


def setup():
    """Packed corpus + queries + exact-f32 ground truth, disk-cached.

    Ground truth is over the ORIGINAL float32 corpus (BASELINE config 2:
    "recall@10 vs float32 baseline") — this charges the quantized pipeline
    for corpus quantization error exactly like the reference's uint8
    pipeline would be charged."""
    from vectorsearch_tpu.quant import layout

    if os.path.exists(CACHE):
        set_phase("setup:load-cache")
        z = np.load(CACHE)
        arrays = {k: z[k] for k in z.files}
        log("bench: loaded cached setup %s", CACHE)
        packed = layout.PackedVectors(
            codes=arrays["codes"], scale=arrays["scale"],
            offset=arrays["offset"], inv_norm=arrays["inv_norm"],
        )
        return packed, arrays["queries"], arrays["truth"]

    import jax
    import jax.numpy as jnp

    set_phase("setup:corpus")
    t0 = time.perf_counter()
    data = make_corpus(N, DIM, K_CLUSTERS)
    log("bench: generated %dx%d corpus in %.1fs", N, DIM, time.perf_counter() - t0)

    t0 = time.perf_counter()
    packed = layout.pack_float(data)
    log("bench: quantized+packed in %.1fs", time.perf_counter() - t0)

    rng = np.random.default_rng(123)
    q_idx = rng.choice(N, size=N_QUERIES, replace=False)
    queries = (
        data[q_idx] + rng.normal(size=(N_QUERIES, DIM)).astype(np.float32) * 0.1
    ).astype(np.float32)

    set_phase("setup:ground-truth")
    t0 = time.perf_counter()
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    # Corpus passed as an ARG (a closure constant would be baked into the
    # HLO and blow up remote compilation).
    corpus_dev = jnp.asarray(data / np.linalg.norm(data, axis=-1, keepdims=True))

    @jax.jit
    def exact_topk(q, corpus):
        s = jnp.dot(
            q, corpus.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.top_k(s, TOPK)[1]

    # enqueue all chunks async, ONE device->host sync at the end (each
    # sync is a tunnel round trip; late-session syncs degrade to 100s+)
    chunks = [
        exact_topk(jnp.asarray(qn[i : i + 64]), corpus_dev)
        for i in range(0, N_QUERIES, 64)
    ]
    truth = np.asarray(jnp.concatenate(chunks, axis=0), dtype=np.int64)
    del corpus_dev, chunks
    log("bench: f32 ground truth in %.1fs", time.perf_counter() - t0)

    try:
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        np.savez(
            CACHE + ".tmp.npz",
            codes=np.asarray(packed.codes), scale=np.asarray(packed.scale),
            offset=np.asarray(packed.offset),
            inv_norm=np.asarray(packed.inv_norm),
            queries=queries, truth=truth,
        )
        os.replace(CACHE + ".tmp.npz", CACHE)
        log("bench: cached setup -> %s", CACHE)
    except Exception as e:  # cache is an optimization, never fatal
        log("bench: setup cache write failed (continuing): %s", e)
    return packed, queries, truth


def main():
    import jax

    if os.environ.get("VSTPU_BENCH_CPU") == "1":
        # hermetic smoke off the chip (JAX_PLATFORMS env alone is
        # ignored — the axon plugin sets jax.config at import)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vectorsearch_tpu.build import build_centroids
    from vectorsearch_tpu.index import IVFIndex
    from vectorsearch_tpu.kernels import cosine
    from vectorsearch_tpu.quant import layout

    set_phase("device-init")
    enable_compile_cache()
    warm_device_transfer()  # absorb the tunnel's first-D2H stall during setup
    log("bench: devices=%s", jax.devices())
    packed, queries, truth = setup()
    ids = np.arange(1, N + 1, dtype=np.int64)

    # Finish absorbing the tunnel's first-D2H stall (environment artifact)
    # before the timed build so build_s measures the build.
    from vectorsearch_tpu.utils import wait_device_warm

    set_phase("device-warm")
    t0 = time.perf_counter()
    wait_device_warm()
    log("bench: device warm wait %.1fs", time.perf_counter() - t0)

    # ---- index build (sharded Lloyd's; BASELINE config 4 analogue) ----
    # Not cached: build wall time is part of the reported metric.
    set_phase("kmeans-build")
    t0 = time.perf_counter()
    result = build_centroids(
        packed,
        k=K_CLUSTERS,
        min_cluster_size=max(1, (N // K_CLUSTERS) // 10),
        max_iters=int(os.environ.get("VSTPU_BENCH_ITERS", 10)),
        superset_iters=4,
        chunk=65_536,
    )
    build_s = time.perf_counter() - t0
    with _state_lock:
        _state["build_s"] = build_s
    log(
        "bench: k-means build %d centroids over %d vectors: %.1fs "
        "(%d iters, final churn %d rows = %.3f%%)",
        result.centroids.shape[0], N, build_s, result.iterations,
        result.final_changes, 100.0 * max(0, result.final_changes) / N,
    )
    # convergence guard (VERDICT r4 weak#7): the recall floor downstream
    # masks a silently under-converged build — flag one loudly. >2%
    # assignment churn in the final iteration means Lloyd's was still
    # moving when it hit max_iters (a converged 1M build lands <<1%).
    if result.final_changes > 0.02 * N:
        log(
            "bench: WARNING k-means NOT converged (%.1f%% churn in final "
            "iteration) — recall below may understate the index",
            100.0 * result.final_changes / N,
        )

    set_phase("bucket-pack")
    t0 = time.perf_counter()
    ivf = IVFIndex.build(packed, ids, result.centroids, assignments=result.assignments)
    log(
        "bench: bucket pack in %.1fs (K=%d cap=%d)",
        time.perf_counter() - t0, ivf.k_clusters, ivf.cap,
    )

    # ---- recall + QPS sweep over serving configs ----
    n_rounds = max(1, int(os.environ.get("VSTPU_BENCH_ROUNDS", 20)))
    flat_ids = ivf.ids.reshape(-1)
    flat_batch = int(os.environ.get("VSTPU_BENCH_FLAT_BATCH", 512))

    def measure(label, fn, batch, id_map):
        """fn(q_dev) -> (scores, idx). Measures recall on N_QUERIES then
        steady-state QPS on one batch. Updates + re-emits the headline."""
        set_phase(f"measure:{label}")
        got_ids = np.empty((N_QUERIES, TOPK), np.int64)
        for i in range(0, N_QUERIES, batch):
            _, idx = fn(jnp.asarray(queries[i : i + batch]))
            idx = np.asarray(idx)[: min(batch, N_QUERIES - i)]
            got_ids[i : i + batch] = id_map(idx)
        recall = np.mean(
            [len(set(got_ids[i]) & set(ids[truth[i]])) / TOPK for i in range(N_QUERIES)]
        )
        q_dev = jnp.asarray(np.resize(queries, (batch, DIM)).astype(np.float32))
        fn(q_dev)[0].block_until_ready()
        t0 = time.perf_counter()
        last = None
        for _ in range(n_rounds):
            last = fn(q_dev)
        last[0].block_until_ready()
        dt = time.perf_counter() - t0
        qps = batch * n_rounds / dt
        log("bench: %s recall@10=%.4f qps/chip=%.0f (batch %d)",
            label, recall, qps, batch)
        with _state_lock:
            _state["results"].append((label, qps, recall))
        emit_headline()  # keep the latest best on stdout at all times

    def ivf_ids(idx):
        return flat_ids[np.clip(idx, 0, flat_ids.size - 1)]

    def flat_ids_map(idx):
        return ids[np.clip(idx, 0, N - 1)]

    # IVF serving path: nprobe sweep 1 -> 8 -> 64 (BASELINE config 3) with
    # the fused exact-f32 refine — the exact program the engine serves with
    # (index/ivf.py _scan_refined). Headline config (nprobe=1, B=512) runs
    # FIRST so a later stall still leaves the flagship number on stdout.
    from vectorsearch_tpu.index.ivf import _scan_refined

    use_pallas = (
        jax.default_backend() == "tpu" and os.environ.get("VSTPU_NO_PALLAS") != "1"
    )
    # nprobe=2 rides the sweep (VERDICT r4 weak#6): one step past the
    # headline config — if it holds ~0.96 recall at 90k+ QPS it is the
    # better speed/recall point and the headline picker takes it
    nprobes = list(dict.fromkeys(
        min(p, ivf.k_clusters) for p in (1, 2, NPROBE, 64)
    ))
    batches = sorted({BATCH, flat_batch}, reverse=True) if FULL else [flat_batch]
    for nprobe in nprobes:
        for bsz in batches:
            try:
                measure(
                    f"ivf+refine nprobe={nprobe}",
                    lambda q, np_=nprobe: _scan_refined(
                        q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                        ivf.bucket_mask, nprobe=np_, k_coarse=32, k=TOPK,
                        use_pallas=use_pallas,
                    ),
                    bsz,
                    ivf_ids,
                )
            except Exception as e:
                log("bench: ivf nprobe=%d B=%d failed: %s", nprobe, bsz, e)

    # ---- large-batch bulk points (the search_many / batched-client
    # path). Bigger batches amortize the per-dispatch probe/epilogue
    # cost AND share bucket reads across more queries — but only when
    # the queries are DISTINCT: np.resize tiling would alias repeats
    # into the same clusters, shrink the distinct-bucket read set, and
    # overstate QPS. The pool is dequantized corpus rows + the same
    # noise recipe as setup()'s queries, so cluster density matches.
    # Recall is batch-invariant (identical program), reused from the
    # B=512 row of the same nprobe; headline picker takes the max, so
    # a losing point is recorded but harmless.
    # tools/r5_batch_sweep.py measured the scaling curve (ROUND5.md §10):
    # nprobe=1 climbs 112k -> 401k QPS from B=512 to B=65536, nprobe=2
    # 73k -> 218k at the 0.9672 floor, still ~+4%/doubling at the top.
    # Record the best measured point (65536) with 16384 as the fallback;
    # biggest-first so a deadline cut still leaves the top number on
    # stdout, and an OOM at the big point falls through to the safe one.
    # Per-nprobe batch caps: the grouped kernel's score grid grows with
    # B*nprobe*cap, so high nprobe must cap B lower (biggest-first with
    # try/except means an OOM just falls through to the safe point).
    # nprobe=64 at B>=1024 is the VERDICT r4 "done" bar (>=35k QPS at the
    # recall floor): B=512 blockexact lands ~33k, batching clears it.
    base_bulk = [
        int(b)
        for b in os.environ.get(
            "VSTPU_BENCH_BULK_BATCH", "65536,16384"
        ).split(",")
        # blank segments let "" disable the phase; the pool samples N
        # corpus rows without replacement, so b must not exceed N
        if b.strip() and 0 < int(b) <= N
    ]
    bulk_plan = {1: base_bulk, 2: base_bulk}
    if NPROBE not in bulk_plan:
        bulk_plan[NPROBE] = [b for b in (8192, 4096) if b <= N]
    bulk_plan.setdefault(64, [b for b in (2048, 1024) if b <= N])
    if base_bulk:
        set_phase("measure:bulk")
        # per-nprobe lists can be EMPTY at small N (every default filtered
        # by b <= N) — flatten before max; base_bulk being non-empty
        # guarantees at least bulk_plan[1] contributes.
        max_bulk = max(b for v in bulk_plan.values() for b in v)
        rng2 = np.random.default_rng(7)
        pool_idx = rng2.choice(N, size=max_bulk, replace=False)
        base2 = (
            np.asarray(packed.offset)[pool_idx, None]
            + np.asarray(packed.scale)[pool_idx, None]
            * np.asarray(packed.codes)[pool_idx].astype(np.float32)
        )
        q_pool = (
            base2
            + rng2.normal(size=(max_bulk, DIM)).astype(np.float32) * 0.1
        ).astype(np.float32)
        # Priority order, not sorted: nprobe=1/2 carry the headline and
        # nprobe=64's points are compile-cache-warm (measured in-session,
        # ROUND5.md §10); nprobe=8's bulk shapes are the only cold
        # compiles (30-120s each through the tunnel), so they go LAST —
        # a deadline cut mid-compile then costs nothing already measured.
        bulk_order = [p for p in (1, 2, 64) if p in bulk_plan]
        bulk_order += [p for p in bulk_plan if p not in bulk_order]
        for nprobe in bulk_order:
            nprobe_bulk = bulk_plan[nprobe]
            with _state_lock:
                prior = next(
                    (r for r in _state["results"]
                     if r[0] == f"ivf+refine nprobe={nprobe}"), None,
                )
            if prior is None or not nprobe_bulk:
                continue
            fn = lambda q, np_=nprobe: _scan_refined(  # noqa: E731
                q, ivf.centroids_n, ivf.buckets, ivf.counts_dev,
                ivf.bucket_mask, nprobe=np_, k_coarse=32, k=TOPK,
                use_pallas=use_pallas,
            )
            for bulk_batch in sorted(set(nprobe_bulk), reverse=True):
                try:
                    q_dev = jnp.asarray(q_pool[:bulk_batch])
                    fn(q_dev)[0].block_until_ready()
                    t0 = time.perf_counter()
                    last = None
                    for _ in range(n_rounds):
                        last = fn(q_dev)
                    last[0].block_until_ready()
                    qps = bulk_batch * n_rounds / (time.perf_counter() - t0)
                    log(
                        "bench: ivf+refine nprobe=%d B=%d (bulk) qps/chip=%.0f"
                        " (recall reused from B=%d: %.4f)",
                        nprobe, bulk_batch, qps, flat_batch, prior[2],
                    )
                    with _state_lock:
                        _state["results"].append((
                            f"ivf+refine nprobe={nprobe} B={bulk_batch} (bulk)",
                            qps, prior[2],
                        ))
                    emit_headline()
                except Exception as e:
                    log("bench: bulk nprobe=%d B=%d failed: %s",
                        nprobe, bulk_batch, e)

    packed_dev = layout.PackedVectors(*[jnp.asarray(a) for a in packed])

    # Flat + exact-f32 refine of the coarse top-32, fused into one jitted
    # program (one dispatch; see CLAUDE.md on tunnel round trips)
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def _flat_refined(q, corpus, n_valid):
        cs, ci = cosine.scan_topk(q, corpus, n_valid, k=32, chunk=131_072, approx=True)
        return cosine.rescore_topk(q, corpus, cs, ci, k=TOPK)

    def flat_refined(q):
        return _flat_refined(q, packed_dev, jnp.int32(N))

    try:
        measure(f"flat+refine B={flat_batch}", flat_refined, flat_batch, flat_ids_map)
    except Exception as e:
        log("bench: flat+refine failed: %s", e)

    if FULL:
        # Flat exhaustive batched scan (throughput config; approx top-k unit)
        for fb in sorted({BATCH, flat_batch}):
            try:
                measure(
                    f"flat approx B={fb}",
                    lambda q: cosine.scan_topk(
                        q, packed_dev, jnp.int32(N), k=TOPK,
                        chunk=131_072, approx=True,
                    ),
                    fb,
                    flat_ids_map,
                )
            except Exception as e:
                log("bench: flat B=%d failed: %s", fb, e)

    set_phase("done")
    with _state_lock:
        results = list(_state["results"])
    if results:
        eligible = [r for r in results if r[2] >= 0.90]
        label, qps, recall = max(eligible or results, key=lambda r: r[1])
        log("bench: HEADLINE %s qps=%.0f recall@10=%.4f build=%.1fs",
            label, qps, recall, build_s)
    emit_headline("final")


if __name__ == "__main__":
    _install_resilience()
    main()
