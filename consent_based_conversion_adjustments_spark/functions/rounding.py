"""Cross-engine stable rounding for oracle-checked float outputs.

Plain ``round(x, n)`` disagrees between engines when the true value is an
exact half-boundary (e.g. softmax weights of 1/m on 2-decimal conversion
values yield odd multiples of 0.0005): Spark rounds the shortest decimal
representation HALF_UP while DuckDB rounds the raw binary double. Shifting
by a 1e-9 epsilon pushes exact boundaries decisively below the edge on both
engines; `+ 0.0` normalizes any resulting -0.0. Both the Spark query and
its DuckDB oracle twin must use the same formulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def stable_round(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c - EPS, scale) + F.lit(0.0)


def sql_round(expr: str, scale: int) -> str:
    return f"round(({expr}) - 1e-9, {scale}) + 0.0"
