"""Small-files compaction for parquet tables (the OPTIMIZE half of a
transactional table format, for plain-parquet layouts).

Long-running per-epoch sinks (the admission / SCD2 / attribution stores)
and over-parallel writers leave tables fragmented into thousands of
small files; every scan then pays file-listing, footer-read, and
task-scheduling overhead per file, and row-group-level min/max skipping
degrades because each file holds too few rows to separate values. The
cure is mechanical — rewrite at a target file size — but the ENGINE
should pick the partition count from the table's actual bytes, not a
guess.

``plan_compaction`` inspects the table through the Hadoop FS API (works
on any scheme — local, HDFS, object stores) and returns the rewrite
plan; ``compact_parquet`` executes it. The rewrite repartitions by a
caller-chosen layout column (range partitioning, so downstream min/max
skipping on that column actually improves — the Z-order module's story
at file grain) or round-robin when no column is given.

At 100 TB this is an offline maintenance job during a quiet window, as
the admission-store docstring prescribes; the operator is deliberately
a plain rewrite (no atomic swap — that belongs to Delta/Iceberg, whose
OPTIMIZE this mirrors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet directory via Hadoop FS."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            n_files += 1
            total += f.getLen()
    return n_files, total


def plan_compaction(
    spark: SparkSession, path: str, target_mb: int = 128
) -> dict:
    """Inspect ``path`` and return the rewrite plan:
    (n_files, total_bytes, target_partitions). Partition count is
    ceil(bytes / target) with a floor of 1 — sized from the table's
    REAL bytes, so the output files land near the target regardless of
    the input's fragmentation or compression ratio drift."""
    n_files, total = _fs_stats(spark, path)
    target_bytes = target_mb * 1024 * 1024
    parts = max(1, -(-total // target_bytes))
    return {
        "n_files": n_files,
        "total_bytes": total,
        "target_partitions": int(parts),
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    layout_col: str | None = None,
) -> dict:
    """Rewrite ``src`` into ``dst`` at ~``target_mb`` files.
    ``layout_col`` range-partitions the rewrite (clustered output:
    min/max file skipping on that column becomes effective);
    otherwise round-robin for pure size normalization. Returns the plan
    plus the output's (n_files, total_bytes)."""
    plan = plan_compaction(spark, src, target_mb)
    df: DataFrame = spark.read.parquet(src)
    parts = plan["target_partitions"]
    out = (
        df.repartitionByRange(parts, layout_col)
        if layout_col
        else df.repartition(parts)
    )
    out.write.mode("overwrite").parquet(dst)
    plan["out_files"], plan["out_bytes"] = _fs_stats(spark, dst)
    return plan
