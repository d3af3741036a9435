"""2-D skyline: brute-force parity (randomized + adversarial ties),
duplicate handling, and partition-count invariance."""

import random

from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators.skyline import skyline_2d


def brute_skyline(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = skyline_2d(df, "price", "size", **kw)
    return sorted(tuple(r) for r in got.collect())


def test_skyline_golden_with_ties_and_duplicates(spark):
    rows = [
        (1, 1.0, 10),
        (2, 1.0, 10),   # duplicate point: both survive
        (3, 1.0, 5),    # same price, smaller size: dominated by 1
        (4, 2.0, 10),   # same size, pricier: dominated by 1
        (5, 2.0, 20),
        (6, 3.0, 20),   # dominated by 5 (same size, pricier)
        (7, 3.0, 30),
        (8, 0.5, 1),    # cheapest: always on the frontier
    ]
    assert run(spark, rows) == brute_skyline(rows)
    got = run(spark, rows)
    ids = {r[0] for r in got}
    assert ids == {1, 2, 5, 7, 8}


def test_skyline_randomized_parity(spark):
    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 30)), rng.randint(0, 30))
        for i in range(300)
    ]
    assert run(spark, rows) == brute_skyline(rows)


def test_skyline_partition_invariance(spark):
    rng = random.Random(11)
    rows = [
        (i, float(rng.randint(0, 50)), rng.randint(0, 50))
        for i in range(200)
    ]
    a = run(spark, rows, num_partitions=1)
    b = run(spark, rows, num_partitions=7)
    c = run(spark, rows, num_partitions=32)
    assert a == b == c == brute_skyline(rows)


def test_skyline_is_antichain(spark):
    rng = random.Random(3)
    rows = [(i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(150)]
    got = run(spark, rows)
    for p in got:
        for q in got:
            assert not (
                q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            )
