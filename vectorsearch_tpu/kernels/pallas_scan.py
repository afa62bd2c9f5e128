"""Fused Pallas IVF bucket scan.

The XLA path (index/ivf.py _ivf_scan) materializes the gather of probed
buckets before the batched GEMV: HBM traffic = gather-read + gather-write +
dot-read = 3x the probed bytes. This kernel reads each probed bucket tile
from HBM exactly once: scalar-prefetched cluster ids drive the BlockSpec
index_map, so Pallas pipelines the HBM->VMEM streaming of
[TILE_CAP, D] int8 code tiles directly (double-buffered DMA), scores them
on-chip with the affine identity, and emits per-tile top-k candidates. A
tiny XLA top_k then merges [B, nprobe*tiles*k] candidates.

This is SURVEY.md §7's "fuse correction + top-k in Pallas" (stage 3/4) and
the "blockwise Pallas top-k" hard part: scores never round-trip to HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layout import PackedVectors
from . import cosine

TILE_CAP = 1024  # bucket rows per grid step (int8 sublane multiple)


def _scan_kernel(
    # scalar prefetch
    probed_ref,  # int32 [B, nprobe]
    counts_ref,  # int32 [K]
    # VMEM blocks
    q_ref,  # bf16 [1, D]        query row b
    qmeta_ref,  # f32  [1, 2]       (qsum, unused)
    codes_ref,  # int8 [1, TILE, D]
    scale_ref,  # f32  [1, TILE]
    offset_ref,  # f32 [1, TILE]
    inv_ref,  # f32   [1, TILE]
    mask_ref,  # bool  [1, TILE]
    # outputs
    out_s_ref,  # f32 [1, 1, 1, k]
    out_i_ref,  # i32 [1, 1, 1, k]
    *,
    k: int,
    cap: int,
    tile: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    t = pl.program_id(2)
    cid = probed_ref[b, j]
    count = counts_ref[cid]

    q = q_ref[0, :].astype(jnp.float32)  # [D]
    codes = codes_ref[0].astype(jnp.float32)  # [TILE, D]
    dots = jnp.sum(codes * q[None, :], axis=1)  # [TILE] (VPU mul + reduce)

    qsum = qmeta_ref[0, 0]
    inner = offset_ref[0] * qsum + scale_ref[0] * dots
    scores = inner * inv_ref[0]  # [TILE]

    row = t * tile + jax.lax.broadcasted_iota(
        jnp.int32, (tile, 1), 0
    ).reshape(tile)
    valid = (row < count) & mask_ref[0]
    neg_inf = jnp.float32(float("-inf"))  # python literal: jnp module
    # constants cannot be captured by pallas kernels
    scores = jnp.where(valid, scores, neg_inf)

    # k-pass max-extract (k is small and static; TILE is VPU-resident)
    for step in range(k):
        m = jnp.max(scores)
        am = jnp.argmax(scores)
        out_s_ref[0, 0, 0, step] = m
        out_i_ref[0, 0, 0, step] = cid * cap + t * tile + am.astype(jnp.int32)
        scores = jnp.where(row == t * tile + am, neg_inf, scores)


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "interpret")
)
def ivf_scan_pallas(
    queries: jax.Array,
    centroids_n: jax.Array,
    buckets: PackedVectors,
    counts: jax.Array,
    bucket_mask: jax.Array,
    nprobe: int,
    k: int,
    interpret: bool = False,
):
    """Drop-in replacement for index.ivf._ivf_scan (same signature/returns)."""
    b = queries.shape[0]
    kk, cap, d = buckets.codes.shape
    nprobe = max(1, min(nprobe, kk))
    tiles = max(1, cap // TILE_CAP)
    tile = min(cap, TILE_CAP)
    assert cap % tile == 0, (cap, tile)

    qn = cosine.l2_normalize(queries.astype(jnp.float32))
    probe = jnp.dot(
        qn.astype(jnp.bfloat16),
        centroids_n.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    _, probed = jax.lax.top_k(probe, nprobe)  # [B, nprobe]

    qsum = jnp.sum(qn, axis=-1)
    qmeta = jnp.stack([qsum, jnp.zeros_like(qsum)], axis=-1)  # [B, 2]

    k_eff = min(k, tile)

    kernel = functools.partial(_scan_kernel, k=k_eff, cap=cap, tile=tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nprobe, tiles),
        in_specs=[
            pl.BlockSpec((1, d), lambda b_, j_, t_, probed, counts: (b_, 0)),
            pl.BlockSpec((1, 2), lambda b_, j_, t_, probed, counts: (b_, 0)),
            pl.BlockSpec(
                (1, tile, d),
                lambda b_, j_, t_, probed, counts: (probed[b_, j_], t_, 0),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda b_, j_, t_, probed, counts: (probed[b_, j_], t_),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda b_, j_, t_, probed, counts: (probed[b_, j_], t_),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda b_, j_, t_, probed, counts: (probed[b_, j_], t_),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda b_, j_, t_, probed, counts: (probed[b_, j_], t_),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, k_eff),
                lambda b_, j_, t_, probed, counts: (b_, j_, t_, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, k_eff),
                lambda b_, j_, t_, probed, counts: (b_, j_, t_, 0),
            ),
        ],
    )
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nprobe, tiles, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((b, nprobe, tiles, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(
        probed.astype(jnp.int32),
        counts.astype(jnp.int32),
        qn.astype(jnp.bfloat16),
        qmeta,
        buckets.codes,
        buckets.scale,
        buckets.offset,
        buckets.inv_norm,
        bucket_mask,
    )

    # merge candidates (tiny): [B, nprobe*tiles*k_eff] -> top k
    cand_s = cand_s.reshape(b, -1)
    cand_i = cand_i.reshape(b, -1)
    take = min(k, cand_s.shape[-1])
    best, pos = jax.lax.top_k(cand_s, take)
    gslot = jnp.take_along_axis(cand_i, pos, axis=-1)
    if take < k:
        best = jnp.pad(best, ((0, 0), (0, k - take)), constant_values=cosine.NEG_INF)
        gslot = jnp.pad(gslot, ((0, 0), (0, k - take)))
    return best, gslot
