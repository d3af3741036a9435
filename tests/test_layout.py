"""Z-order layout: interleave golden values (both engines), bucket edges,
range-repartition locality, and the pruning-gain invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators import layout as L
from consent_based_conversion_adjustments_spark.plans.data_queries import (
    zorder_pruning_gain,
)

SF = "/root/testdata/sf0.001"


def test_interleave_golden(spark):
    # bp=0b1010, bs=0b0101 → bit b of dim d lands at 2b+d:
    # 2 + 4 + 32 + 64 = 102
    df = spark.range(1).select(
        L.zorder_key([F.lit(0b1010), F.lit(0b0101)], 4).alias("z")
    )
    assert df.first().z == 102
    got = duckdb.sql(
        "SELECT " + L.zorder_key_sql(["10", "5"], 4)
    ).fetchone()[0]
    assert got == 102


def test_interleave_is_bijective_on_grid(spark):
    df = (
        spark.range(16)
        .selectExpr("id AS x")
        .crossJoin(spark.range(16).selectExpr("id AS y"))
        .select(L.zorder_key([F.col("x"), F.col("y")], 4).alias("z"))
    )
    zs = [r.z for r in df.collect()]
    assert sorted(zs) == list(range(256))


def test_int_bucket_edges(spark):
    df = spark.createDataFrame([(v,) for v in (10, 11, 500, 1009, 1010)], ["v"])
    out = [
        r.b
        for r in df.select(
            L.int_bucket(F.col("v"), F.lit(10), F.lit(1010), 4).alias("b")
        ).orderBy("v").collect()
    ]
    assert out[0] == 0            # lo → first bucket
    assert out[-1] == 15          # hi → last bucket, never 16
    assert out == sorted(out)     # monotone


def test_zorder_repartition_locality(spark):
    # 64×64 grid, 16 partitions: a z-ordered range partitioning keeps BOTH
    # dimensions local; an x-sort leaves y spanning the full range in
    # every partition.
    grid = (
        spark.range(64)
        .selectExpr("id AS x")
        .crossJoin(spark.range(64).selectExpr("id AS y"))
    )
    z = L.zorder_repartition(
        grid, [F.col("x"), F.col("y")], bits=6, num_partitions=16
    )
    spans = (
        z.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 16
    avg_sy = sum(r.sy for r in spans) / len(spans)
    assert avg_sy < 48, f"z-order should localize y too (avg span {avg_sy})"

    linear = grid.repartitionByRange(16, "x")
    lin_spans = (
        linear.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    assert all(r.sy == 63 for r in lin_spans)


def test_pruning_gain_invariants(spark):
    rows = {r.layout: r for r in zorder_pruning_gain(spark, SF).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z.n_files == lin.n_files == 16
    # single-column sort cannot prune the other dimension at all
    assert lin.files_scanned_sk == lin.n_files
    # z-order prunes it
    assert z.files_scanned_sk < lin.files_scanned_sk
    # min/max pruning is sound: scanned rows cover every matching row
    for r in (z, lin):
        assert r.rows_scanned_both >= r.rows_match_both
        assert r.rows_scanned_pk >= r.rows_match_pk
        assert r.rows_scanned_sk >= r.rows_match_sk
