from .distance import (
    cosine_similarity,
    dot_product,
    l1_distance,
    l2_distance,
    metric_distance,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l1_distance",
    "l2_distance",
    "metric_distance",
    "l2_norm",
]
