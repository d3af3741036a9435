"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, schema (column names), and an
order-insensitive value comparison (exact after the queries' own rounding;
also reports max float deviation so rounding choices can be validated).

Usage:  python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import os

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
# data-dependent oracles (e.g. cocoa_knn_lsh_planned) derive constants
# from the gate's tables — tell them which scale this gate runs at
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def compare(name, spark_df, con, sql) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"schema mismatch: spark={s_cols} duckdb={d_cols}"
    dtype_notes = []
    for c in s_cols:
        st, dt = str(sdf[c].dtype), str(ddf[c].dtype)
        if st != dt:
            dtype_notes.append(f"{c}: spark={st} duckdb={dt}")
    if dtype_notes:
        print(f"    [dtype] {name}: {'; '.join(dtype_notes)}")
    if len(sdf) != len(ddf):
        return False, f"rowcount mismatch: spark={len(sdf)} duckdb={len(ddf)}"
    s_rows = sorted(
        [tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )
    d_rows = sorted(
        [tuple(_norm(v) for v in row) for row in ddf[d_cols].itertuples(index=False)],
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )
    n_bad = 0
    max_dev = 0.0
    first_bad = None
    for sr, dr in zip(s_rows, d_rows):
        for a, b in zip(sr, dr):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    max_dev = max(max_dev, abs(a - b))
                    n_bad += 1
                    if first_bad is None:
                        first_bad = (sr, dr)
            elif a != b:
                n_bad += 1
                if first_bad is None:
                    first_bad = (sr, dr)
    if n_bad:
        return False, (
            f"{n_bad} value mismatches, max float dev {max_dev:.3e}; "
            f"first: spark={first_bad[0]} duckdb={first_bad[1]}"
        )
    return True, f"{len(sdf)} rows"


def main() -> int:
    import __spark_entry__ as e
    from consent_based_conversion_adjustments_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            n = fn(spark, SF_DIR).count()
            print(f"  [rows-only] {name}: {n} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ok, msg = compare(name, fn(spark, SF_DIR), con, oracles[name])
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        status = "OK " if ok else "FAIL"
        print(f"  [{status}] {name}: {msg} ({time.time()-t0:.1f}s)")
        if not ok:
            failed.append(name)
    extra = set(oracles) - set(qs)
    if extra:
        print(f"  [WARN] oracle_sql keys without queries(): {sorted(extra)}")
    print("ALL OK" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
