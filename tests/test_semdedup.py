"""SemDeDup (cluster-then-within-cluster near-dup) correctness.

The pair stage must equal the brute-force definition — all-pairs cosine
filtered to pairs sharing the SAME k-means cluster — for every blocking
factor, and the keep rule must drop exactly the higher ids of qualifying
pairs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators import cluster as C
from consent_based_conversion_adjustments_spark.operators.semdedup import (
    semdedup_keep,
    semdedup_pairs,
)
from consent_based_conversion_adjustments_spark.operators.similarity_search import (
    cosine_neardup_pairs,
)

SF = "/root/testdata/sf0.001"
TAU = 0.45


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _brute_within_cluster(emb, k, iters, tau):
    cents = C.kmeans_fit(emb, k, iters)
    cluster_of = {
        r["vec_id"]: r["cluster"]
        for r in C.kmeans_label(emb, cents).collect()
    }
    return {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in cosine_neardup_pairs(emb, tau).collect()
        if cluster_of[r["id_a"]] == cluster_of[r["id_b"]]
    }


def test_semdedup_pairs_match_brute_force_any_blocking(spark, emb):
    expected = _brute_within_cluster(emb, k=4, iters=2, tau=TAU)
    assert expected  # fixture must produce within-cluster near-dups
    for n_blocks in (1, 3):
        got = {
            (r["id_a"], r["id_b"]): round(r["cosine"], 9)
            for r in semdedup_pairs(
                emb, TAU, k=4, iters=2, n_blocks=n_blocks
            ).collect()
        }
        assert got == expected, f"n_blocks={n_blocks}"


def test_semdedup_clustering_prunes_cross_cluster_pairs(spark, emb):
    """Some global near-dup pair must be split across clusters at a low
    threshold — otherwise the test corpus can't distinguish SemDeDup
    from plain all-pairs dedup."""
    all_pairs = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(emb, TAU).collect()
    }
    within = set(_brute_within_cluster(emb, k=4, iters=2, tau=TAU))
    assert within < all_pairs


def test_semdedup_keep_drops_higher_pair_ids(spark, emb):
    pairs = semdedup_pairs(emb, TAU, k=4, iters=2).collect()
    removed = {r["id_b"] for r in pairs}
    kept = {r["vec_id"] for r in semdedup_keep(emb, TAU, k=4, iters=2).collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert kept == all_ids - removed
    # the lowest id of every dup pair always survives unless some other
    # pair dominates it
    assert all(r["id_a"] in kept or r["id_a"] in removed for r in pairs)


def test_semdedup_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semdedup_pairs(empty, 0.5)
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0
    assert semdedup_keep(empty, 0.5).count() == 0


def test_semdedup_mega_cluster_blocks(spark):
    """All rows in ONE cluster (k=1) degrades to the blocked all-pairs
    shape — the grouped grid must still emit each qualifying pair exactly
    once."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = []
    for i in range(40):
        v = base + rng.normal(scale=0.05, size=8)  # one tight bundle
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semdedup_pairs(df, 0.9, k=1, iters=1, n_blocks=3).collect()
    expected = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in cosine_neardup_pairs(df, 0.9).collect()
    }
    assert {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9) for r in got
    } == expected
    assert len(expected) == 40 * 39 / 2  # the bundle really is a clique


def test_semdedup_keep_paper_parity_on_transitive_groups(spark):
    """The paper keep rule (farthest-from-centroid) vs keep-lowest-id on
    planted transitive dup groups (cliques): identical removal COUNTS —
    one survivor per clique — and the paper survivor is the clique
    member farthest from its assigned centroid (tie → lowest id)."""
    rng = np.random.default_rng(23)
    b1, b2 = rng.normal(size=12), rng.normal(size=12)
    rows = []
    for i, v in enumerate(_bundle(rng, b1, 5) + _bundle(rng, b2, 4)):
        rows.append((i, [float(x) for x in v]))
    rows.append((50, [float(x) for x in rng.normal(size=12)]))  # singleton
    rows.append((51, [float(x) for x in rng.normal(size=12)]))  # singleton
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kept_id = {
        r["vec_id"]
        for r in semdedup_keep(df, 0.9, k=2, iters=2).collect()
    }
    kept_paper = {
        r["vec_id"]
        for r in semdedup_keep(
            df, 0.9, k=2, iters=2, keep="farthest_from_centroid"
        ).collect()
    }
    assert len(kept_id) == len(kept_paper)  # identical removal counts
    assert {50, 51} <= kept_id and {50, 51} <= kept_paper
    # both bundles are cliques at 0.9 → exactly one survivor each
    assert len(kept_paper & set(range(5))) == 1
    assert len(kept_paper & set(range(5, 9))) == 1
    # the paper survivor is the farthest-from-centroid clique member
    cents = C.kmeans_fit(df, 2, 2)
    dists = {
        r["vec_id"]: r["sq_dist"]
        for r in C.kmeans_label(df, cents, emit_dist=True).collect()
    }
    for clique in (set(range(5)), set(range(5, 9))):
        winner = max(clique, key=lambda i: (dists[i], -i))
        assert kept_paper & clique == {winner}


def test_semdedup_keep_rejects_unknown_rule(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="keep must be"):
        semdedup_keep(empty, 0.5, keep="first_seen")


def test_centroid_outliers_flags_match_manual_stats(spark, emb):
    from consent_based_conversion_adjustments_spark.operators.semdedup import (
        centroid_outliers,
    )

    rows = centroid_outliers(emb, k=4, iters=2).collect()
    assert len(rows) == emb.count()
    by_cluster = {}
    for r in rows:
        assert r["sq_dist"] >= 0.0
        by_cluster.setdefault(r["cluster"], []).append(r)
    import statistics

    for cluster, rs in by_cluster.items():
        ds = [r["sq_dist"] for r in rs]
        mu, sd = statistics.fmean(ds), statistics.pstdev(ds)
        for r in rs:
            expected = r["sq_dist"] > mu + 2.0 * sd
            assert r["is_outlier"] == expected, (cluster, r["vec_id"])
    # a 2-sigma flag must be sparse but the fixture should trip it somewhere
    n_out = sum(r["is_outlier"] for r in rows)
    assert 0 < n_out < len(rows) * 0.2


def test_centroid_outliers_empty(spark):
    from consent_based_conversion_adjustments_spark.operators.semdedup import (
        centroid_outliers,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = centroid_outliers(empty)
    assert out.columns == ["vec_id", "cluster", "sq_dist", "is_outlier"]
    assert out.count() == 0


def test_diverse_sample_picks_farthest_per_cluster(spark, emb):
    from consent_based_conversion_adjustments_spark.operators import cluster as CL
    from consent_based_conversion_adjustments_spark.operators.semdedup import (
        diverse_sample,
    )

    m = 5
    got = diverse_sample(emb, m, k=4, iters=2).collect()
    cents = CL.kmeans_fit(emb, 4, 2)
    all_rows = CL.kmeans_label(emb, cents, emit_dist=True).collect()
    by_cluster = {}
    for r in all_rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    expected = set()
    for cluster, rs in by_cluster.items():
        top = sorted(rs, key=lambda r: (-r["sq_dist"], r["vec_id"]))[:m]
        expected |= {(cluster, r["vec_id"]) for r in top}
    assert {(r["cluster"], r["vec_id"]) for r in got} == expected
    for r in got:
        assert 1 <= r["rank"] <= m


def _bundle(rng, base, n, scale=0.03):
    return [base + rng.normal(scale=scale, size=len(base)) for _ in range(n)]


def test_semdedup_admission_planted_relations(spark):
    """Batch docs near a store doc or an earlier batch-mate are flagged
    with the right dup_of; novel batch docs pass clean; store-store pairs
    never appear."""
    import numpy as np

    from consent_based_conversion_adjustments_spark.operators.semdedup import (
        semdedup_admission,
    )

    rng = np.random.default_rng(11)
    b1, b2 = rng.normal(size=16), rng.normal(size=16)
    store_rows = [
        (i, [float(x) for x in v])
        for i, v in enumerate(_bundle(rng, b1, 6) + _bundle(rng, b2, 6))
    ]
    novel = rng.normal(size=16)
    batch_rows = [
        (100, [float(x) for x in (b1 + rng.normal(scale=0.03, size=16))]),
        (101, [float(x) for x in novel]),                       # clean
        (102, [float(x) for x in (novel + rng.normal(scale=0.03, size=16))]),
    ]
    schema = "vec_id long, embedding array<double>"
    store = spark.createDataFrame(store_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    rels = semdedup_admission(store, batch, 0.9, k=2, iters=2).collect()
    by_doc = {}
    for r in rels:
        by_doc.setdefault(r["vec_id"], set()).add(r["dup_of"])
    # 100 matches the b1 store bundle (store ids 0..5)
    assert by_doc.get(100) and by_doc[100] <= set(range(6))
    # 101 entered first, so it is clean; 102 trips on batch-mate 101
    assert 101 not in by_doc
    assert 102 in by_doc and 101 in by_doc[102]
    # no relation ever names a batch doc later than itself or a store pair
    for r in rels:
        assert r["vec_id"] >= 100
        assert r["dup_of"] < r["vec_id"] or r["dup_of"] < 100


def test_semdedup_admission_empty_store_falls_back(spark):
    import numpy as np

    from consent_based_conversion_adjustments_spark.operators.semdedup import (
        semdedup_admission,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    batch = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(_bundle(rng, base, 4))],
        schema,
    )
    rels = semdedup_admission(empty, batch, 0.9, k=1, iters=1).collect()
    # a tight bundle: every doc relates to every earlier batch-mate
    assert {(r["vec_id"], r["dup_of"]) for r in rels} == {
        (b, a) for a in range(4) for b in range(a + 1, 4)
    }
