"""Runnable analog of the reference Colab demo (cocoa_template.ipynb).

The notebook scenario, end to end on Spark instead of in-memory pandas:

1. Simulate 8,000 consenting / 2,000 non-consenting customers whose ad
   groups are 3-letter combinations of 'ABCDEFG' joined with '_' and whose
   conversion values are lognormal(1) draws (cell 11).
2. Feature-engineer by splitting the adgroup string into one categorical
   column per hierarchy level, then one-hot over the union (cell 13,
   `split_adgroup_levels` = the P8 hook).
3. Run the kNN adjustment with k=100 (cell 15 — the notebook recommends
   kNN with large k over percentile mode, cell 14).
4. Compare the original vs adjusted conversion-value distributions with a
   terminal histogram (cell 17's matplotlib comparison).

Run:  python examples/notebook_demo.py  (~30 s on local[*])

Everything is deterministic (fixed seeds), so the printed summary is
stable run to run. reference: cocoa/cocoa_template.ipynb cells 11-17.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np

sys.path.insert(0, ".")

from consent_based_conversion_adjustments_spark.config import AdjustmentConfig
from consent_based_conversion_adjustments_spark.operators.preprocess import (
    split_adgroup_levels,
)
from consent_based_conversion_adjustments_spark.pipeline import run_adjustment
from consent_based_conversion_adjustments_spark.session import get_spark

N_CONSENT = 8_000
N_NOCONSENT = 2_000
K = 100


def simulate(spark, n_consent: int, n_noconsent: int):
    """Notebook cell 11: adgroups = 3-combinations of 'ABCDEFG', conversion
    values lognormal(mean=1). Plain numpy on the driver — 10k rows is demo
    scale; at real scale this would be a parquet scan."""
    rng = np.random.default_rng(42)
    adgroups = ["_".join(c) for c in itertools.combinations("ABCDEFG", 3)]
    rows = []
    for i in range(n_consent + n_noconsent):
        rows.append(
            (
                i,
                adgroups[int(rng.integers(len(adgroups)))],
                float(np.round(rng.lognormal(mean=1.0), 2)),
            )
        )
    return spark.createDataFrame(rows, ["index", "adgroup", "conversion_value"])


def text_hist(values: np.ndarray, title: str, bins: int = 12, width: int = 50):
    counts, edges = np.histogram(values, bins=bins)
    peak = counts.max() or 1
    print(f"\n{title}  (n={len(values)}, mean={values.mean():.3f})")
    for c, lo, hi in zip(counts, edges, edges[1:]):
        bar = "#" * int(round(width * c / peak))
        print(f"  [{lo:7.2f}, {hi:7.2f})  {c:5d}  {bar}")


def main() -> None:
    spark = get_spark("notebook-demo")
    df = simulate(spark, N_CONSENT, N_NOCONSENT)
    consent = df.filter(df["index"] < N_CONSENT)
    noconsent = df.filter(df["index"] >= N_CONSENT)

    cfg = AdjustmentConfig(
        conversion_column="conversion_value",
        id_columns=["index"],
        number_nearest_neighbors=K,
    )
    result = run_adjustment(
        consent,
        noconsent,
        cfg,
        impl="numpy",  # the fused broadcast+BLAS scale path
        feature_engineering=lambda d: split_adgroup_levels(d, "adgroup"),
    )

    adjusted = result.data_adjusted.toPandas()
    print("\n=== summary (1 row) ===")
    result.summary.show(truncate=False)

    orig = adjusted["conversion_value"].to_numpy()
    adj = adjusted["adjusted_conversion"].to_numpy() + orig
    text_hist(orig, "original consenting conversion values")
    text_hist(adj, "adjusted (original + redistributed share)")

    total_in = df.groupBy().sum("conversion_value").first()[0]
    total_out = float(adj.sum())
    print(
        f"\nconservation: input total {total_in:.2f} → "
        f"consenting total after adjustment {total_out:.2f} "
        f"(every non-consenting value redistributed: "
        f"{abs(total_in - total_out) < 1e-6 * total_in})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
