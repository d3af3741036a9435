"""Engine configuration.

Mirrors the runtime surface of the reference pipeline
(reference: pipeline.py:44-140 — conversion/id/drop/non-dummy column roles,
metric, and exactly one of k / radius / percentile), as plain dataclasses
instead of Beam ValueProviders.
"""

from __future__ import annotations

from dataclasses import dataclass, field


VALID_METRICS = ("manhattan", "euclidean", "cosine", "hamming", "chebyshev")


@dataclass(frozen=True)
class AdjustmentConfig:
    """Column roles + matching-mode parameters for the conversion adjustment.

    Exactly one of ``number_nearest_neighbors`` / ``radius`` / ``percentile``
    must be set (reference: nearest_consented_customers.py:254-259, 502-508;
    the reference dispatches on truthiness — a documented bug, SURVEY.md §5 —
    we dispatch on ``is not None`` so ``radius=0.0`` is a valid empty-match
    radius join).
    """

    conversion_column: str
    id_columns: list[str]
    drop_columns: list[str] = field(default_factory=list)
    non_dummy_columns: list[str] = field(default_factory=list)
    date_column: str | None = None
    metric: str = "manhattan"
    number_nearest_neighbors: float | None = None
    radius: float | None = None
    percentile: float | None = None

    def __post_init__(self) -> None:
        from .functions.distance import parse_minkowski

        # sklearn-style parametrized L_p: "minkowski:<p>" (the reference
        # forwards any sklearn metric, nearest_consented_customers.py:50)
        if self.metric not in VALID_METRICS and parse_minkowski(self.metric) is None:
            raise ValueError(
                f"metric must be one of {VALID_METRICS} or 'minkowski:<p>', "
                f"got {self.metric!r}"
            )
        modes = [
            self.number_nearest_neighbors is not None,
            self.radius is not None,
            self.percentile is not None,
        ]
        if sum(modes) != 1:
            raise ValueError(
                "exactly one of number_nearest_neighbors, radius, percentile "
                "must be provided"
            )
        if self.percentile is not None and not (0.0 < self.percentile <= 1.0):
            # reference: nearest_consented_customers.py:510-511 (V6)
            raise ValueError("percentile must be in (0, 1]")
        if self.radius is not None and self.radius < 0:
            raise ValueError("radius must be non-negative")
        if (
            self.number_nearest_neighbors is not None
            and self.number_nearest_neighbors <= 0
        ):
            raise ValueError("number_nearest_neighbors must be positive")
