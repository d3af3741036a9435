from .distance import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    hamming_distance,
    l1_distance,
    l2_distance,
    metric_distance,
    l2_norm,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "hamming_distance",
    "dot_product",
    "l1_distance",
    "l2_distance",
    "metric_distance",
    "l2_norm",
]
