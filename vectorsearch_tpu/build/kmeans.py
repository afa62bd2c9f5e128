"""Sharded Lloyd's k-means centroid builder.

Replaces the reference's entire dnc/ subsystem (divide-and-conquer over temp
files with NumCPU-bounded goroutines — dnc/dnc.go:35-400, dnc/k_means.go,
dnc/dataset.go, dnc/sampling.go). On TPU no recursion or disk staging is
needed: one assignment matmul handles the full corpus, so the whole build
collapses into Lloyd's iterations on the mesh (SURVEY.md §2.8, §7 stage 6):

  assign     cosine argmax — [chunk, K] int8/bf16 matmul per tile (MXU)
  accumulate per-cluster sums — one-hot matmul H^T @ V (MXU beats scatter)
  recenter   mean of member vectors (reference: dnc/dnc.go:402-456)

Multi-device: data tiles are sharded over the mesh's 'data' axis with
shard_map; partial sums/counts/changes are combined with psum over ICI.

Initialization keeps the reference's oversample-then-truncate idea
(dnc/k_means.go:34-44,120-140) — seed a superset of k*SUPERSET_MUL random
data points, run Lloyd's, keep the k largest clusters — but ranks by the
final iteration's live counts, fixing the reference's zeroed-counts latent
bug (dnc/k_means.go:111-116, flagged in SURVEY.md §2.2).

Small-cluster handling mirrors dropSmallCentroids (dnc/dnc.go:458-574):
clusters below min_size are dropped and their members reassigned to the
survivors, which are then recentered.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants
from ..kernels import cosine
from ..quant.layout import PackedVectors


@dataclass(frozen=True)
class KMeansResult:
    centroids: np.ndarray  # f32 [K, D]
    assignments: np.ndarray  # int32 [N]
    counts: np.ndarray  # int64 [K]
    iterations: int
    # assignment churn of the FINAL Lloyd iteration (device change
    # counter) — a convergence diagnostic: a build that stopped on
    # max_iters with high churn is silently under-converged
    # (VERDICT r4 weak#7). -1 when unknown (zero-iteration paths).
    final_changes: int = -1


def _tile_data(packed: PackedVectors, chunk: int, pad_multiple: int = 1):
    """Host-side: pad N to a chunk*pad_multiple multiple and reshape into
    [n_tiles, chunk, ...] tiles plus a validity mask."""
    codes = np.asarray(packed.codes)
    n, d = codes.shape
    total = chunk * pad_multiple
    n_pad = (-n) % total
    tiles = PackedVectors(
        codes=np.pad(codes, ((0, n_pad), (0, 0))),
        scale=np.pad(np.asarray(packed.scale), (0, n_pad)),
        offset=np.pad(np.asarray(packed.offset), (0, n_pad)),
        inv_norm=np.pad(np.asarray(packed.inv_norm), (0, n_pad)),
    )
    nc = (n + n_pad) // chunk
    tiles = PackedVectors(
        *[a.reshape((nc, chunk) + a.shape[1:]) for a in tiles]
    )
    valid = (np.arange(nc * chunk) < n).reshape(nc, chunk)
    return tiles, valid, n


def _k_pad_class(k: int) -> int:
    """Round a centroid count up to a size class so every Lloyd's phase
    (superset, main, survivors, balance sub-splits) reuses a handful of
    compiled shapes. Every distinct K used to mean a fresh jit — and
    through the remote-compile tunnel each compile costs 30-120 s, which
    dominated the r1 10M build (VERDICT weak#7 ballpark: most of 744 s
    was compiles, not compute)."""
    c = 256
    while c < k:
        c *= 2
    return c


def _use_pallas_kmeans(kk: int) -> bool:
    """Opt-in (VSTPU_KMEANS_PALLAS=1): the fused Pallas pass
    (kernels/pallas_kmeans.py) was built for the accumulate-bandwidth
    theory of the r1 10M build, but measured on v5e at 1M x 768 it ties
    or slightly loses to XLA (K=1024: 58 vs 50 ms/iter; K=4096: 138 vs
    121 ms) — XLA's scan body overlaps its [chunk, K] intermediates well,
    and the kernel's exact hi+lo accumulate costs one extra MXU pass. The
    real 10M-build levers were compile-count collapse (_k_pad_class) and
    the sampled superset phase. Kept for larger-K regimes and future
    toolchains; correctness is pinned by tests/test_pallas_kmeans.py."""
    import os

    from ..kernels.pallas_kmeans import ASSIGN_K_MAX

    return (
        os.environ.get("VSTPU_KMEANS_PALLAS") == "1"
        and jax.default_backend() == "tpu"
        and kk <= ASSIGN_K_MAX
    )


def _assign_and_accumulate(
    tiles, valid, centroids, k_valid, axis: str | None, use_pallas=None
):
    """One full Lloyd's pass over local tiles.

    `centroids` may be padded past the real count; `k_valid` (device i32
    scalar) masks the padded columns out of the argmax without changing
    the compiled shape.

    Returns (sums f32[K,D], counts f32[K], assignments int32[tiles, chunk]).
    Inside shard_map (`axis` set) sums/counts are psum'ed over the mesh.
    """
    kk = centroids.shape[0]
    if use_pallas is None:
        use_pallas = _use_pallas_kmeans(kk)
    if use_pallas:
        from ..kernels.pallas_kmeans import TILE_ROWS, assign_accumulate_pallas

        n_tiles, chunk = valid.shape
        if chunk % TILE_ROWS == 0:
            flat = PackedVectors(
                codes=tiles.codes.reshape(n_tiles * chunk, -1),
                scale=tiles.scale.reshape(-1),
                offset=tiles.offset.reshape(-1),
                inv_norm=tiles.inv_norm.reshape(-1),
            )
            kmask = jnp.where(
                jnp.arange(kk) < k_valid, 0.0, -jnp.inf
            ).astype(jnp.float32)
            sums, counts, cid = assign_accumulate_pallas(
                flat, valid.reshape(-1), centroids, kmask
            )
            if axis is not None:
                sums = jax.lax.psum(sums, axis)
                counts = jax.lax.psum(counts, axis)
            return sums, counts, cid.reshape(n_tiles, chunk)
    cn = cosine.l2_normalize(centroids)
    c_sums = jnp.sum(cn, axis=-1)

    def body(carry, xs):
        sums, counts = carry
        tile, tile_valid = xs
        dots = jax.lax.dot_general(
            tile.codes.astype(jnp.bfloat16),
            cn.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, K]
        inner = tile.offset[:, None] * c_sums[None, :] + tile.scale[:, None] * dots
        sims = inner * tile.inv_norm[:, None]
        kcol = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        sims = jnp.where(kcol < k_valid, sims, -jnp.inf)
        cid = jnp.argmax(sims, axis=-1).astype(jnp.int32)

        onehot = (
            cid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)
        ) & tile_valid[:, None]
        onehot = onehot.astype(jnp.float32)  # [chunk, K]
        # Per-cluster sums via one-hot matmul over the dequantized tile.
        # NOTE: the one-hot lhs makes every product exact (0 or v) at any
        # matmul precision — a scaled-one-hot bf16 variant that avoids the
        # f32 dequantization was tried and rejected: the per-row scale in
        # the lhs makes products round in bf16 and cluster means lose up
        # to ~0.1 abs under cancellation.
        v = tile.offset[:, None] + tile.scale[:, None] * tile.codes.astype(
            jnp.float32
        )
        sums = sums + jax.lax.dot_general(
            onehot,
            v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, D]
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), cid

    init = (
        jnp.zeros((kk, centroids.shape[1]), jnp.float32),
        jnp.zeros((kk,), jnp.float32),
    )
    (sums, counts), cids = jax.lax.scan(body, init, (tiles, valid))
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
    return sums, counts, cids


@functools.lru_cache(maxsize=8)
def _make_lloyd_loop(mesh: Mesh | None, axis: str = "data"):
    """The WHOLE Lloyd's loop as one jitted program (lax.while_loop).

    Memoized on (mesh, axis): build_centroids calls lloyd() 4-6 times per
    build (main, recenter, balance) with identical tile/K-pad shapes — a
    fresh jit wrapper per call would re-trace each time and depend on the
    persistent compile cache to dodge a 30-120 s tunnel compile.

    Convergence is checked on device, so the host syncs once at the end
    instead of once per iteration. Through the remote-TPU tunnel every
    synchronous D2H is a round trip whose latency GROWS over the tunnel
    session (CLAUDE.md "first-D2H stall"; later syncs measured 10-150 s
    on aged sessions) — the per-iteration `int(changes)` fetch dominated
    the 10M build's superset phase (465 s for ~20 s of device compute).
    max_iters/tol ride as traced scalars so every phase (superset, main,
    survivors, balance sub-splits) shares one compiled program per tile
    shape.
    """

    def run(tiles, valid, centroids, prev_assign, k_valid, max_iters, tol):
        def body(carry):
            cents, _, prev, it, _ = carry
            sums, counts, cids = _assign_and_accumulate(
                tiles, valid, cents, k_valid,
                axis if mesh is not None else None,
            )
            new_cents = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts, 1)[:, None],
                cents,
            )
            changes = jnp.sum(
                jnp.where(valid, cids != prev, False).astype(jnp.int32)
            )
            if mesh is not None:
                changes = jax.lax.psum(changes, axis)
            return new_cents, counts, cids, it + 1, changes

        def cond(carry):
            _, _, _, it, changes = carry
            return (it < max_iters) & (changes > tol)

        init = (
            centroids,
            jnp.zeros((centroids.shape[0],), jnp.float32),
            prev_assign,
            jnp.int32(0),
            jnp.int32(2**31 - 1),
        )
        cents, counts, cids, it, changes = jax.lax.while_loop(
            cond, body, init
        )
        return cents, counts, cids, it, changes

    if mesh is None:
        return jax.jit(run)
    pv = P(axis)
    specs_in = (
        PackedVectors(P(axis), P(axis), P(axis), P(axis)),
        pv,
        P(),
        pv,
        P(),
        P(),
        P(),
    )
    specs_out = (P(), P(), pv, P(), P())
    return jax.jit(
        jax.shard_map(
            run, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
            check_vma=False,
        )
    )


def _device_put_tiles(tiles, valid, prev, mesh: Mesh | None, axis: str = "data"):
    if mesh is None:
        return (
            PackedVectors(*[jnp.asarray(a) for a in tiles]),
            jnp.asarray(valid),
            jnp.asarray(prev),
        )
    from ..parallel.distributed import put_sharded

    sh = NamedSharding(mesh, P(axis))
    return (
        PackedVectors(*[put_sharded(np.asarray(a), sh) for a in tiles]),
        put_sharded(valid, sh),
        put_sharded(prev, sh),
    )


def prepare_tiles(
    packed: PackedVectors, chunk: int, mesh: Mesh | None = None
):
    """Stage the corpus on device once (tiles + validity + n). Passing the
    result to several lloyd() calls avoids re-uploading the corpus per
    phase — at 1M x 768 that is ~770 MB of host->device traffic per call."""
    n_dev = mesh.devices.size if mesh is not None else 1
    tiles, valid, n = _tile_data(packed, chunk, pad_multiple=n_dev)
    prev = np.full(valid.shape, -1, np.int32)
    d_tiles, d_valid, d_prev = _device_put_tiles(tiles, valid, prev, mesh)
    return d_tiles, d_valid, d_prev, n


def lloyd(
    packed: PackedVectors,
    init_centroids: np.ndarray,
    max_iters: int = constants.KMEANS_ITERATION_LIMIT,
    chunk: int = 16_384,
    mesh: Mesh | None = None,
    tol_changes: int = 0,
    prepared=None,
) -> KMeansResult:
    """Run Lloyd's iterations from the given centroids until the number of
    assignment changes is <= tol_changes (reference converges on unchanged
    quantized bytes — dnc/k_means.go:67-117 — we converge on assignments)."""
    if prepared is None:
        prepared = prepare_tiles(packed, chunk, mesh)
    d_tiles, d_valid, d_prev, n = prepared
    k_real = init_centroids.shape[0]
    k_pad = _k_pad_class(k_real)
    centroids = jnp.asarray(
        np.pad(np.asarray(init_centroids, np.float32), ((0, k_pad - k_real), (0, 0))),
        jnp.float32,
    )
    k_valid = jnp.int32(k_real)  # dynamic mask, not a compile shape
    run = _make_lloyd_loop(mesh)
    centroids, counts, d_prev, it, changes = run(
        d_tiles, d_valid, centroids, d_prev, k_valid,
        jnp.int32(max_iters), jnp.int32(tol_changes),
    )
    # ONE bundled device->host transfer (every separate sync is a tunnel
    # round trip, CLAUDE.md)
    centroids, counts, d_prev, it, changes = jax.device_get(
        (centroids, counts, d_prev, it, changes)
    )
    assignments = np.asarray(d_prev).reshape(-1)[:n]
    return KMeansResult(
        centroids=np.asarray(centroids)[:k_real],
        assignments=assignments,
        counts=np.asarray(counts, np.int64)[:k_real],
        iterations=int(it),
        final_changes=int(changes),
    )


def sample_init(
    packed: PackedVectors, k: int, seed: int = 0
) -> np.ndarray:
    """Initial centroids = dequantized random distinct data rows."""
    n = np.shape(packed.codes)[0]
    rng = np.random.default_rng(seed)
    pick = rng.choice(n, size=min(k, n), replace=False)
    codes = np.asarray(packed.codes)[pick].astype(np.float32)
    scale = np.asarray(packed.scale)[pick]
    offset = np.asarray(packed.offset)[pick]
    return offset[:, None] + scale[:, None] * codes


def kmeans(
    packed: PackedVectors,
    k: int,
    max_iters: int = constants.KMEANS_ITERATION_LIMIT,
    superset_mul: int = constants.SUPERSET_MUL,
    superset_iters: int = 25,
    chunk: int = 16_384,
    mesh: Mesh | None = None,
    seed: int = 0,
    prepared=None,
) -> KMeansResult:
    """Superset-initialized k-means (reference: dnc/k_means.go:19-207).

    Phase 1: Lloyd's over k*superset_mul seeded centroids (bounded iters).
    Phase 2: keep the k clusters with the most members (final-iteration
             counts — the reference's ranking bug is fixed here), then run
             Lloyd's to convergence.
    """
    n = np.shape(packed.codes)[0]
    if n == 0:
        raise ValueError("kmeans on empty dataset")
    k = max(1, min(k, n))

    if prepared is None:
        prepared = prepare_tiles(packed, chunk, mesh)
    k_super = min(k * max(1, superset_mul), n)
    # The superset only seeds the init, so its K rounds DOWN to the pad
    # class: at k=4096 the reference's 5x oversample gives k_super=20480,
    # which pads to 32768 — 1.6x pure waste in the single most expensive
    # build phase (instrumented at 10M: ~680 s of an 840 s build). 16384
    # seeds (4x) cost half and seed k=4096 just as well.
    half = _k_pad_class(k_super) // 2
    if k < half < k_super:  # shrink only — never inflate a small superset
        k_super = half
    import time as _time

    from ..logger import sugar
    from .progress import tracker as _progress

    _t0 = _time.perf_counter()
    init = sample_init(packed, k_super, seed=seed)
    if k_super > k:
        # The superset phase also runs on a SAMPLE (the reference
        # k-means's a 50k sample too, dnc/dnc.go:320-324; it never sees
        # the full corpus before the final reassignment). Full-corpus
        # Lloyd's at 5x K was the other half of the r1 10M build cost.
        sample_n = min(n, max(constants.SAMPLE_SIZE, 12 * k_super))
        if sample_n < n:
            rng = np.random.default_rng(seed + 1)
            pick = np.sort(rng.choice(n, size=sample_n, replace=False))
            sub = PackedVectors(
                codes=np.asarray(packed.codes)[pick],
                scale=np.asarray(packed.scale)[pick],
                offset=np.asarray(packed.offset)[pick],
                inv_norm=np.asarray(packed.inv_norm)[pick],
            )
            # Small chunk: the superset program's [chunk, k_super] f32
            # intermediates must COEXIST with the full corpus tiles in
            # HBM. At chunk=65536/k_super=16384 they need ~9 GB of
            # scratch next to 7.8 GB of resident tiles, and the runtime
            # defragments by paging buffers through the host — measured
            # 536 s ONCE per process through the remote tunnel. chunk
            # 8192 shrinks scratch ~8x and the phase runs at roofline.
            with _progress.phase(
                "superset", f"{k_super} seeds / {sample_n}-row sample"
            ):
                phase1 = lloyd(
                    sub, init, max_iters=superset_iters,
                    chunk=min(chunk, 8_192), mesh=mesh,
                )
        else:
            with _progress.phase(
                "superset", f"{k_super} seeds / full corpus"
            ):
                phase1 = lloyd(
                    packed, init, max_iters=superset_iters, chunk=chunk,
                    mesh=mesh, prepared=prepared,
                )
        top = np.argsort(-phase1.counts, kind="stable")[:k]
        init = phase1.centroids[top]
        sugar().info(
            "build: superset %d seeds / %d-row sample: %.1fs",
            k_super, min(sample_n, n), _time.perf_counter() - _t0,
        )
    with _progress.phase("lloyd", f"k={k}, n={n}"):
        return lloyd(
            packed, init, max_iters=max_iters, chunk=chunk, mesh=mesh,
            prepared=prepared,
        )


def build_centroids(
    packed: PackedVectors,
    target_cluster_size: int = constants.CENTROID_SIZE,
    min_cluster_size: int | None = None,
    max_iters: int = 100,
    chunk: int = 16_384,
    mesh: Mesh | None = None,
    seed: int = 0,
    k: int | None = None,
    superset_iters: int = 25,
    balance_rounds: int = 1,
) -> KMeansResult:
    """Full index build: k = ceil(n / target), k-means, drop small clusters,
    reassign and recenter, then split oversized clusters (balance).
    Replaces dnc.KMeansDivideAndConquer (dnc/dnc.go:35-263 +
    dropSmallCentroids + recenterDbCentroid + the recursive size bound)."""
    import time as _time

    from ..logger import sugar

    n = np.shape(packed.codes)[0]
    if k is None:
        k = max(1, -(-n // target_cluster_size))
    if min_cluster_size is None:
        min_cluster_size = max(1, target_cluster_size // 10)

    from .progress import tracker as _progress

    t0 = _time.perf_counter()
    with _progress.phase("upload", f"{n} rows -> device tiles"):
        prepared = prepare_tiles(packed, chunk, mesh)
    t_prep = _time.perf_counter()
    result = kmeans(
        packed, k, max_iters=max_iters, chunk=chunk, mesh=mesh, seed=seed,
        superset_iters=superset_iters, prepared=prepared,
    )
    t_kmeans = _time.perf_counter()
    sugar().info(
        "build: prepare(upload) %.1fs, kmeans(superset+%d iters) %.1fs",
        t_prep - t0, result.iterations, t_kmeans - t_prep,
    )
    # The MAIN Lloyd's convergence stats. Later passes (drop-small
    # recenter, balance reassign) run 1-2 bounded iterations against a
    # reset prev=-1, so THEIR iterations/final_changes are meaningless
    # as convergence diagnostics — restore these before returning.
    main_iters, main_churn = result.iterations, result.final_changes
    if result.centroids.shape[0] <= 1:
        return result

    small = result.counts < min_cluster_size
    if small.any() and (~small).any():
        with _progress.phase(
            "drop-small", f"{int(small.sum())} clusters below minimum"
        ):
            survivors = result.centroids[~small]
            # one Lloyd's iteration against survivors = reassign+recenter
            result = lloyd(
                packed, survivors, max_iters=1, chunk=chunk, mesh=mesh,
                tol_changes=-1, prepared=prepared,
            )
            # recenter once more so centroids reflect the new assignment
            result = lloyd(
                packed, result.centroids, max_iters=1, chunk=chunk,
                mesh=mesh, tol_changes=-1, prepared=prepared,
            )
        sugar().info(
            "build: drop-small (%d dropped) %.1fs",
            int(small.sum()), _time.perf_counter() - t_kmeans,
        )

    # Balance pass: split clusters larger than 2x the mean by running a
    # local k-means on their members — one level of the reference's
    # divide step (dnc/dnc.go:320-335 splits any node above CENTROID_SIZE).
    # Skew directly sets the uniform bucket capacity (index/ivf.py), so a
    # tighter max cluster means less HBM padding and faster probes.
    for round_i in range(balance_rounds):
        t_round = _time.perf_counter()
        mean_count = max(1, int(result.counts.sum() // max(1, len(result.counts))))
        limit = 2 * mean_count
        oversized = np.nonzero(result.counts > limit)[0]
        if oversized.size == 0:
            break
        with _progress.phase(
            "balance", f"round {round_i + 1}: {oversized.size} splits"
        ):
            keep = [result.centroids[i] for i in range(len(result.counts))
                    if i not in set(oversized.tolist())]
            new_centroids = list(keep)
            host_codes = np.asarray(packed.codes)
            for ci in oversized:
                members = np.nonzero(result.assignments == ci)[0]
                if members.size > constants.SAMPLE_SIZE:
                    members = np.random.default_rng(seed + int(ci)).choice(
                        members, size=constants.SAMPLE_SIZE, replace=False
                    )
                sub = PackedVectors(
                    codes=host_codes[members],
                    scale=np.asarray(packed.scale)[members],
                    offset=np.asarray(packed.offset)[members],
                    inv_norm=np.asarray(packed.inv_norm)[members],
                )
                k_sub = max(2, -(-int(result.counts[ci]) // mean_count))
                # superset_mul=1: skip the oversample phase for
                # sub-splits — it would add one compiled shape per
                # distinct k_sub*mul (compiles dominate through the
                # remote-compile tunnel)
                sub_res = kmeans(
                    sub, k_sub, max_iters=10, superset_mul=1, chunk=chunk,
                    seed=seed + int(ci),
                )
                new_centroids.extend(list(sub_res.centroids))
            t_subs = _time.perf_counter()
            result = lloyd(
                packed, np.stack(new_centroids), max_iters=2, chunk=chunk,
                mesh=mesh, tol_changes=-1, prepared=prepared,
            )
            sugar().info(
                "build: balance round (%d split, subs %.1fs, "
                "reassign %.1fs)",
                oversized.size, t_subs - t_round,
                _time.perf_counter() - t_subs,
            )
    import dataclasses

    return dataclasses.replace(
        result, iterations=main_iters, final_changes=main_churn
    )
