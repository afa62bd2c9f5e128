"""Fused flat-scan Pallas kernel: band-max sketch + exact rescore.

The XLA flat path (kernels/cosine.py scan_topk) materializes a [B, chunk]
f32 score tile per chunk and runs (approx_)top_k over it — at B=512 over
1M rows that is ~2 GB of score traffic per batch and the top-k pass
dominates. This kernel never writes full scores: each grid step computes a
[B, TILE] score block ON CHIP and reduces it to interleaved band maxima
(band b = rows {b mod 128} across the tile's 8 lane registers, so the
reduction is an elementwise max of 8 vector registers — no relayouts),
emitting a [B, 128] sketch per tile: a 64x reduction in HBM writes.

The serving pipeline is then:
  1. kernel: band maxima  [n_tiles, B, 128]
  2. XLA: approx_max_k over [B, n_tiles*128] bands -> top band ids
  3. expand each band to its 8 rows, exact-f32 rescore (rescore_topk)
A true top-k row always lives in a band whose max >= that row's score, so
with k_bands >= k the only loss is many distinct high bands crowding out a
top-k row's band — recall measured in bench (use k_bands ~ 4-8x k).

Affine identity, Mosaic-safe formulation (see CLAUDE.md gotchas):
  scores = a (.) dots + qsum (x) bv + bias
    dots  = q [B, D] @ codes^T        (MXU, contraction on D)
    a     = scale * inv_norm    [1, TILE]  (sublane-broadcast: allowed)
    qsum (x) bv = rank-1 MXU matmul [B,1] @ [1,TILE] (no lane broadcast!)
    bias  = 0 live / -inf dead  [1, TILE]

Measured (v5e, 1Mx768, B=512): 27.8 ms -> 18.4k QPS at recall@10 0.998.
The XLA scan_topk(approx=True) path does the same batch in 8.2 ms (62.5k
QPS at 0.978; +refine 0.9996) — XLA's matmul+approx_max_k pipeline beats
this bf16 kernel, so the XLA path remains the serving default and this
kernel is the recall-maximal alternative. Round-2 leads: s8 MXU dots
in-kernel, manual double-buffered DMA, multi-tile accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..quant.layout import PackedVectors
from . import cosine

TILE_N = 1024  # corpus rows per grid step; bands = 128, band size = 8
BAND_LANES = 128


def _flat_kernel(
    q_ref,  # bf16 [B, D]
    qsum_ref,  # f32 [B, 1]
    codes_ref,  # i8  [1, TILE, D]
    a_ref,  # f32 [1, 1, TILE]
    bv_ref,  # f32 [1, 1, TILE]
    bias_ref,  # f32 [1, 1, TILE]
    out_ref,  # f32 [1, B, 128]
    *,
    tile: int,
):
    q = q_ref[...]  # [B, D] bf16
    codes = codes_ref[0].astype(jnp.bfloat16)  # [TILE, D]
    dots = jax.lax.dot_general(
        q,
        codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE]
    outer = jax.lax.dot_general(
        qsum_ref[...],  # [B, 1]
        bv_ref[0],  # [1, TILE]
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE] rank-1
    scores = a_ref[0] * dots + outer + bias_ref[0]
    b = scores.shape[0]
    regs = scores.reshape(b, tile // BAND_LANES, BAND_LANES)
    out_ref[0] = jnp.max(regs, axis=1)  # elementwise max of lane registers


@functools.partial(
    jax.jit, static_argnames=("k", "k_bands", "interpret")
)
def flat_search_pallas(
    queries: jax.Array,
    corpus: PackedVectors,
    n_valid,
    k: int,
    k_bands: int = 64,
    valid_mask: jax.Array | None = None,
    interpret: bool = False,
):
    """Drop-in sibling of cosine.scan_topk for large batched flat search.

    Returns (scores f32[B,k], idx i32[B,k]) — scores are EXACT f32 (the
    rescore stage), idx -inf-padded rows clipped like scan_topk.
    """
    b, d = queries.shape
    n = corpus.codes.shape[0]
    n_pad = (-n) % TILE_N
    total = n + n_pad
    tiles = total // TILE_N

    qn = cosine.l2_normalize(queries.astype(jnp.float32))
    qsum = jnp.sum(qn, axis=-1, keepdims=True)  # [B, 1]

    codes = jnp.pad(corpus.codes, ((0, n_pad), (0, 0)))
    scale = jnp.pad(corpus.scale, (0, n_pad))
    offset = jnp.pad(corpus.offset, (0, n_pad))
    inv = jnp.pad(corpus.inv_norm, (0, n_pad))

    row = jnp.arange(total, dtype=jnp.int32)
    live = row < jnp.int32(n_valid)
    if valid_mask is not None:
        live = live & jnp.pad(valid_mask, (0, n_pad))
    a = (scale * inv).reshape(tiles, 1, TILE_N)
    bv = (offset * inv).reshape(tiles, 1, TILE_N)
    bias = jnp.where(live, 0.0, cosine.NEG_INF).reshape(tiles, 1, TILE_N)
    codes_t = codes.reshape(tiles, TILE_N, d)

    bands = pl.pallas_call(
        functools.partial(_flat_kernel, tile=TILE_N),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda t: (0, 0)),
            pl.BlockSpec((b, 1), lambda t: (0, 0)),
            pl.BlockSpec((1, TILE_N, d), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TILE_N), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TILE_N), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TILE_N), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, BAND_LANES), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles, b, BAND_LANES), jnp.float32),
        interpret=interpret,
    )(
        qn.astype(jnp.bfloat16),
        qsum,
        codes_t,
        a,
        bv,
        bias,
    )

    # band sketch -> candidate bands -> candidate rows -> exact rescore
    flat_bands = jnp.moveaxis(bands, 1, 0).reshape(b, tiles * BAND_LANES)
    kb = min(k_bands, tiles * BAND_LANES)
    band_s, band_i = jax.lax.approx_max_k(flat_bands, kb)
    nt = band_i // BAND_LANES  # tile of each band
    lane = band_i % BAND_LANES
    j = jnp.arange(TILE_N // BAND_LANES, dtype=jnp.int32)  # regs per tile
    rows = (
        nt[:, :, None] * TILE_N + j[None, None, :] * BAND_LANES + lane[:, :, None]
    ).reshape(b, kb * (TILE_N // BAND_LANES))
    # dead bands (max -inf) expand to dead rows; the live mask re-kills them
    return cosine.rescore_topk(
        queries,
        PackedVectors(codes=codes, scale=scale, offset=offset, inv_norm=inv),
        None,
        rows,
        k,
        valid=live,
    )
