"""Fused Pallas IVF bucket scan.

The XLA path (index/ivf.py _ivf_scan) materializes the gather of probed
buckets before the batched GEMV: HBM traffic = gather-read + gather-write +
dot-read = 3x the probed code bytes, and the gather itself is
O(B*nprobe*cap*D) HBM — 19 GB at B=128/nprobe=64/cap=3072/D=768, an OOM.

This kernel reads each probed bucket tile from HBM exactly once:
scalar-prefetched cluster ids drive the BlockSpec index_maps, so Pallas
pipelines the HBM->VMEM streaming of [TILE, D] int8 code tiles directly
(double-buffered DMA), scores them on-chip, and writes only the f32
scores — 4 bytes/row out vs 768 bytes/row in. jax.lax.top_k then reduces
[B, nprobe*cap]. (SURVEY.md §7 stage 3/4: fused affine correction +
blockwise scan.)

The affine identity is refactored so the kernel is pure vector arithmetic
(Mosaic on this toolchain cannot broadcast dynamic scalars across lanes,
store scalars to VMEM, or handle 1-D vector layouts):

    score[r] = a[r] * <codes[r], q> + bv[r] * qsum + bias[r]
      a    = scale * inv_norm              (precomputed, [K, cap, 1])
      bv   = offset * inv_norm             (precomputed, [K, cap, 1])
      bias = 0 where live, -inf where padding/tombstone  ([K, cap, 1])
      qsum is pre-broadcast to [B, TILE, 1] on the XLA side

so masking needs no `count` scalar in-kernel and every intermediate is a
2-D [TILE, 1] column (sublane-major) vector.
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
    probed_ref,  # i32 [B, nprobe]
    # VMEM blocks
    q_ref,  # bf16 [1, 1, D]     query row b (block-selected)
    qsum_ref,  # f32 [1, TILE, 1] qsum pre-broadcast
    codes_ref,  # i8  [1, TILE, D]
    a_ref,  # f32 [1, TILE, 1]    scale * inv_norm
    bv_ref,  # f32 [1, TILE, 1]   offset * inv_norm
    bias_ref,  # f32 [1, TILE, 1] 0 live / -inf dead
    # output
    out_ref,  # f32 [1, 1, TILE, 1]
):
    q = q_ref[0, 0, :].astype(jnp.float32)  # [D]
    codes = codes_ref[0].astype(jnp.float32)  # [TILE, D]
    dots = jnp.sum(codes * q[None, :], axis=1, keepdims=True)  # [TILE, 1]
    out_ref[0, 0] = a_ref[0] * dots + bv_ref[0] * qsum_ref[0] + bias_ref[0]


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "interpret"))
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

    qsum = jnp.sum(qn, axis=-1)  # [B]
    qsum_tile = jnp.broadcast_to(qsum[:, None, None], (b, tile, 1))

    # fold sidecars + padding/tombstone mask into kernel-ready columns
    col = jax.lax.broadcasted_iota(jnp.int32, (kk, cap), 1)
    valid = (col < counts[:, None]) & bucket_mask
    a = (buckets.scale * buckets.inv_norm).reshape(kk, cap, 1)
    bv = (buckets.offset * buckets.inv_norm).reshape(kk, cap, 1)
    bias = jnp.where(valid, 0.0, cosine.NEG_INF).reshape(kk, cap, 1)

    side_spec = pl.BlockSpec(
        (1, tile, 1),
        lambda b_, j_, t_, probed: (probed[b_, j_], t_, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe, tiles),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda b_, j_, t_, probed: (b_, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda b_, j_, t_, probed: (b_, 0, 0)),
            pl.BlockSpec(
                (1, tile, d),
                lambda b_, j_, t_, probed: (probed[b_, j_], t_, 0),
            ),
            side_spec,
            side_spec,
            side_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, 1),
            lambda b_, j_, t_, probed: (b_, j_, t_, 0),
        ),
    )
    scores = pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nprobe, cap, 1), jnp.float32),
        interpret=interpret,
    )(
        probed.astype(jnp.int32),
        qn.astype(jnp.bfloat16).reshape(b, 1, d),
        qsum_tile,
        buckets.codes,
        a,
        bv,
        bias,
    )

    # top-k over the union of probed buckets (same merge as _ivf_scan)
    scores = scores.reshape(b, nprobe * cap)
    k_eff = min(k, nprobe * cap)
    best, pos = jax.lax.top_k(scores, k_eff)
    cluster = jnp.take_along_axis(probed, pos // cap, axis=-1)
    slot = pos % cap
    gslot = cluster * cap + slot
    if k_eff < k:
        best = jnp.pad(
            best, ((0, 0), (0, k - k_eff)), constant_values=cosine.NEG_INF
        )
        gslot = jnp.pad(gslot, ((0, 0), (0, k - k_eff)))
    return best, gslot
