from .cosine import (
    l2_normalize,
    mask_invalid,
    merge_topk,
    nearest_centroid,
    quantize_queries,
    scan_topk,
    scores_f32,
    scores_int8,
    scores_packed,
    topk,
)

__all__ = [
    "l2_normalize",
    "mask_invalid",
    "merge_topk",
    "nearest_centroid",
    "quantize_queries",
    "scan_topk",
    "scores_f32",
    "scores_int8",
    "scores_packed",
    "topk",
]
