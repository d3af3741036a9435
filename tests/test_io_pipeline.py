"""Sources/sinks, the per-date driver loop, and the notebook-scale workload."""

import glob

import pytest
import pyspark.sql.functions as F

from consent_based_conversion_adjustments_spark.config import AdjustmentConfig
from consent_based_conversion_adjustments_spark.operators.preprocess import (
    split_adgroup_levels,
)
from consent_based_conversion_adjustments_spark.operators.similarity_search import (
    cosine_topk,
)
from consent_based_conversion_adjustments_spark.pipeline import run_adjustment, run_dates
from consent_based_conversion_adjustments_spark.plans.relational import (
    approx_distinct_parts,
)
from consent_based_conversion_adjustments_spark.sources.io import (
    date_sequence,
    max_date,
    read_dates_text,
    scan_between_dates,
)

SF = "/root/testdata/sf0.001"


def test_read_dates_text(spark, tmp_path):
    path = tmp_path / "dates.txt"
    path.write_text("2021-11-20\n2021-11-21\n")
    out = read_dates_text(spark, str(path)).collect()
    assert sorted(str(r["date"]) for r in out) == ["2021-11-20", "2021-11-21"]


def test_scan_between_dates_pushes_filter(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    scanned = scan_between_dates(orders, "o_orderdate", "1995-01-01", "1996-01-01")
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderdate" in plan
    assert scanned.filter(F.col("o_orderdate") >= "1996-01-01").count() == 0


def test_max_date_and_sequence(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    # events ts is nanos-as-long in raw read; go through the engine reader
    from consent_based_conversion_adjustments_spark.sources.io import read_table

    events = read_table(spark, SF, "events")
    md = max_date(events, "ts")
    assert md.startswith("2024-01-")
    seq = date_sequence(spark, md, 7).collect()
    assert len(seq) == 7
    assert str(seq[-1]["date"]) == md


def test_run_dates_writes_per_date_csvs(spark, tmp_path):
    """O1-O3 + S4: the two-file-per-date layout (pipeline.py:265-295)."""
    rows = []
    for d, day in [("2021-11-20", 1), ("2021-11-21", 2)]:
        for i in range(4):
            rows.append((f"g{day}{i}", d, 10.0 * (i + 1), "dress", i % 2 == 0))
    df = spark.createDataFrame(
        rows, ["gclid", "conversion_date", "conversion_value", "item", "consented"]
    )
    consent = df.filter("consented").drop("consented")
    noconsent = df.filter("not consented").drop("consented")
    cfg = AdjustmentConfig(
        conversion_column="conversion_value",
        id_columns=["gclid"],
        date_column="conversion_date",
        number_nearest_neighbors=1,
    )
    out = str(tmp_path / "adjustments")
    run_dates(
        spark, consent, noconsent, cfg, ["2021-11-20", "2021-11-21"], out
    )
    for d in ["2021-11-20", "2021-11-21"]:
        data_files = glob.glob(f"{out}/{d}/adjustments_data/*.csv")
        summary_files = glob.glob(f"{out}/{d}/adjustments_summary/*.csv")
        assert len(data_files) == 1  # coalesce(1) single-file layout
        assert len(summary_files) == 1
        header = open(data_files[0]).readline().strip().split(",")
        assert "adjusted_conversion" in header
        summary = open(summary_files[0]).read()
        assert "percentage_matched_conversion_value" in summary


def test_per_date_auto_stats_matches_in_loop_counts(spark):
    """r13 (VERDICT r12 §Next #7): the one-pass per-date precount must
    agree exactly with what the in-loop auto resolution would count —
    cleaned rows (null/non-positive conversions dropped) and distinct
    feature vectors per side per day — so the dispatch routes
    identically with zero per-date count jobs."""
    from consent_based_conversion_adjustments_spark.pipeline import (
        _per_date_auto_stats,
    )

    rows = []
    for d, day in [("2021-11-20", 1), ("2021-11-21", 2)]:
        for i in range(6):
            # one null + one zero conversion per day: must be excluded
            val = None if i == 4 else (0.0 if i == 5 else 10.0 * (i + 1))
            rows.append(
                (f"g{day}{i}", d, val, "dress" if i % 2 else "shoe",
                 i % 2 == 0)
            )
    df = spark.createDataFrame(
        rows,
        "gclid string, conversion_date string, conversion_value double, "
        "item string, consented boolean",
    )
    consent = df.filter("consented").drop("consented")
    noconsent = df.filter("not consented").drop("consented")
    cfg = AdjustmentConfig(
        conversion_column="conversion_value",
        id_columns=["gclid"],
        date_column="conversion_date",
        number_nearest_neighbors=1,
    )
    stats = _per_date_auto_stats(consent, noconsent, cfg)
    assert set(stats) == {"2021-11-20", "2021-11-21"}
    for date in stats:
        np_, nb, dp, db = stats[date]
        # per day: consented rows are i in {0,2,4} → i=4 null dropped →
        # 2 rows; non-consented i in {1,3,5} → i=5 zero dropped → 2 rows
        assert (np_, nb) == (2, 2)
        # items among survivors: probe i∈{1,3} → dress,dress → 1 distinct;
        # build i∈{0,2} → shoe,shoe → 1 distinct
        assert (dp, db) == (1, 1)


def test_run_dates_partitioned_layout(spark, tmp_path):
    from consent_based_conversion_adjustments_spark.pipeline import (
        run_dates_partitioned,
    )
    from consent_based_conversion_adjustments_spark.sources.io import read_csv

    rows = []
    for d, day in [("2021-11-20", 1), ("2021-11-21", 2)]:
        for i in range(4):
            rows.append((f"g{day}{i}", d, 10.0 * (i + 1), i % 2 == 0))
    df = spark.createDataFrame(
        rows, ["gclid", "conversion_date", "conversion_value", "consented"]
    )
    cfg = AdjustmentConfig(
        conversion_column="conversion_value",
        id_columns=["gclid"],
        date_column="conversion_date",
        number_nearest_neighbors=1,
    )
    out = str(tmp_path / "p")
    run_dates_partitioned(
        spark,
        df.filter("consented").drop("consented"),
        df.filter("not consented").drop("consented"),
        cfg,
        ["2021-11-20", "2021-11-21"],
        out,
    )
    back = read_csv(spark, f"{out}/adjustments_data_partitioned")
    assert sorted(
        str(r["date"]) for r in back.select("date").distinct().collect()
    ) == ["2021-11-20", "2021-11-21"]
    # partition pruning reaches the scan
    pruned = back.filter(F.col("date") == "2021-11-20")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_prepare_pipeline_input_trigger_parity(spark, tmp_path):
    """cloud_function trigger path: MAX(date) -> lookback window -> dates.txt."""
    from consent_based_conversion_adjustments_spark.pipeline import (
        prepare_pipeline_input,
    )
    from consent_based_conversion_adjustments_spark.sources.io import (
        read_dates_text,
        read_table,
    )

    events = read_table(spark, SF, "events").withColumn(
        "d", F.to_date("ts")
    )
    dates = prepare_pipeline_input(spark, events, "d", 5, str(tmp_path))
    assert len(dates) == 5
    back = sorted(
        str(r["date"]) for r in read_dates_text(spark, str(tmp_path / "dates")).collect()
    )
    assert back == sorted(dates)


def test_csv_json_round_trip(spark, tmp_path):
    from consent_based_conversion_adjustments_spark.sources.io import (
        read_csv,
        read_json,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "score"]
    )
    df.coalesce(1).write.option("header", True).csv(str(tmp_path / "c"))
    df.coalesce(1).write.json(str(tmp_path / "j"))
    c = read_csv(spark, str(tmp_path / "c"))
    j = read_json(spark, str(tmp_path / "j"), schema=df.schema)
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, df.collect()))


def test_notebook_scale_workload_conservation(spark):
    """FIXTURES.md F3: adgroup 'X_Y_Z' feature engineering + kNN at scale;
    the conservation invariant must hold on lognormal conversion values."""
    import numpy as np

    rng = np.random.RandomState(123)
    from itertools import combinations

    adgroups = ["_".join(c) for c in combinations("ABCDEFG", 3)]
    n_consent, n_noconsent = 800, 200
    rows = [
        (i, adgroups[rng.randint(len(adgroups))], float(rng.lognormal(1)), i < n_consent)
        for i in range(n_consent + n_noconsent)
    ]
    df = spark.createDataFrame(rows, ["idx", "adgroup", "conversion_value", "c"])
    consent = df.filter("c").drop("c")
    noconsent = df.filter("not c").drop("c")
    cfg = AdjustmentConfig(
        conversion_column="conversion_value",
        id_columns=["idx"],
        number_nearest_neighbors=50,
    )
    result = run_adjustment(
        consent, noconsent, cfg,
        feature_engineering=lambda d: split_adgroup_levels(d, "adgroup"),
    )
    totals = result.data_adjusted.agg(
        F.sum("adjusted_conversion").alias("added"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    expected = noconsent.agg(F.sum("conversion_value")).first()[0]
    assert totals["n"] == n_consent
    assert totals["added"] == pytest.approx(expected, rel=1e-9)


def test_approx_distinct_within_tolerance(spark):
    rows = approx_distinct_parts(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r["approx_parts"] == pytest.approx(r["exact_parts"], rel=0.05)


def test_write_compacted_parquet(spark, tmp_path):
    from consent_based_conversion_adjustments_spark.sources.io import (
        write_compacted_parquet,
    )

    df = spark.range(50_000).selectExpr(
        "id", "repeat('x', 100) AS payload"
    ).repartition(32)
    out = str(tmp_path / "compacted")
    n_files = write_compacted_parquet(df, out, target_file_mb=1)
    import glob

    parts = glob.glob(out + "/part-*.parquet")
    # one file per computed partition, far fewer than the 32 input
    # partitions would have produced, and the data round-trips
    assert len(parts) == n_files
    assert 1 <= n_files < 32
    assert spark.read.parquet(out).count() == 50_000


def test_schema_evolution_merge(spark, tmp_path):
    """Reading a dataset whose later files added a column: mergeSchema
    unions the schemas and back-fills nulls — the standard warehouse
    schema-evolution contract."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(base + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_rotation_prioritizes_failed_rows(tmp_path):
    """The verification-window rotation treats a FAILED correctness row
    (hash mismatch or hard error) as never-verified, so a fixed query
    re-sorts to the front of the next driver window instead of waiting a
    full rotation cycle; rows-only records (err == "no_oracle") count as
    verified."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    rec = {
        "green_q": {"hash_match": True, "rows_match": True,
                    "schema_match": True, "err": None},
        "red_hash_q": {"hash_match": False, "rows_match": True,
                       "schema_match": True, "err": None},
        "red_err_q": {"hash_match": None, "rows_match": None,
                      "schema_match": None, "err": "EXCEPTION boom"},
        "rows_only_q": {"hash_match": None, "rows_match": None,
                        "schema_match": None, "err": "no_oracle"},
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(rec))
    seen = e._last_verified_round(str(tmp_path))
    assert seen.get("green_q") == 7
    assert seen.get("rows_only_q") == 7
    assert "red_hash_q" not in seen   # re-verify ASAP
    assert "red_err_q" not in seen    # re-verify ASAP
    # a later green row restores normal rotation for a once-red query
    (tmp_path / "CORRECTNESS_r08.json").write_text(json.dumps(
        {"red_hash_q": {"hash_match": True, "rows_match": True,
                        "schema_match": True, "err": None}}
    ))
    assert e._last_verified_round(str(tmp_path))["red_hash_q"] == 8
