"""Checkable queries for the corpus-construction operators (TF-IDF scoring,
deterministic splits, per-source quotas, chunking, decontamination, event
funnels) + DuckDB oracle twins.

Every oracle reuses the exact polynomial-hash and tokenizer SQL mirrors from
``plans.data_queries`` so hashes, buckets, and gram sets match bit-for-bit
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import sql_round, stable_round
from ..operators import corpus as C
from ..operators import text as X
from ..operators.text import string_hash, tokens
from ..sources.io import read_table
from .caching import make_pin
from .data_queries import _DTOKS, _TOKS, _sql_hash, _sql_stop_hits  # noqa: F401

# Fibonacci-mixed bucket — mirrors corpus.split_bucket exactly (int64-exact)
_SPLIT_BUCKET_SQL = (
    f"((({_sql_hash('CAST(doc_id AS VARCHAR)')}) * 2654435761)"
    f" % 4294967296) * {C.SPLIT_BUCKETS} // 4294967296"
)
_SPLIT_CASE_SQL = f"""CASE
    WHEN {_SPLIT_BUCKET_SQL} < {C.TRAIN_UPPER} THEN 'train'
    WHEN {_SPLIT_BUCKET_SQL} < {C.VAL_UPPER} THEN 'val'
    ELSE 'test' END"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = C.tfidf_top_terms(docs, "text", "doc_id", k=3)
    return out.select(
        "doc_id",
        "term",
        "tf",
        "doc_freq",
        stable_round("tfidf", 6).alias("tfidf"),
        F.col("rank").cast("long").alias("rank"),
    )


TFIDF_SQL = """
WITH terms AS (
    SELECT doc_id, unnest({toks}) AS term FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), df_ AS (
    SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df_.doc_freq,
           tf.tf * (ln((n.n_docs + 1.0) / (df_.doc_freq + 1.0)) + 1.0)
               AS tfidf
    FROM tf JOIN df_ USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, doc_freq, {r} AS tfidf, rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
    FROM scored)
WHERE rank <= 3
""".format(toks=_TOKS.format(c="text"), r=sql_round("tfidf", 6))


def corpus_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-split assignment (90/5/5) + per-split profile."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        C.assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            stable_round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
        .orderBy("split")
    )


SPLIT_SUMMARY_SQL = f"""
SELECT {_SPLIT_CASE_SQL} AS split,
       count(*) AS n_docs,
       {sql_round('avg(n_chars)', 3)} AS avg_chars
FROM documents
GROUP BY split
ORDER BY split
"""


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    kept = C.source_quota_sample(docs, "source", "doc_id", quota=10)
    return kept.select("source", "doc_id")


SOURCE_QUOTA_SQL = """
SELECT source, doc_id
FROM (
    SELECT source, doc_id, row_number() OVER (
        PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents)
WHERE rn <= 10
"""


def weighted_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample without replacement, 20 docs per source
    (Efraimidis–Spirakis keys off the Knuth-mixed doc id — fully
    deterministic, so the oracle replays the exact key formula)."""
    docs = read_table(spark, sf_dir, "documents")
    kept = C.weighted_sample(
        docs, "n_chars", 20, id_col="doc_id", by="source"
    )
    return kept.select("source", "doc_id").orderBy("source", "doc_id")


WEIGHTED_SAMPLE_SQL = f"""
WITH w AS (
    SELECT source, doc_id,
           ln((((doc_id * {C.ES_MULT}) % {C.ES_MOD}) + 0.5)
               / {C.ES_MOD}.0)
           / greatest(CAST(n_chars AS DOUBLE), 1e-12) AS esk
    FROM documents
)
SELECT source, doc_id
FROM (
    SELECT source, doc_id, row_number() OVER (
        PARTITION BY source ORDER BY esk DESC, doc_id) AS rn
    FROM w)
WHERE rn <= 20
ORDER BY source, doc_id
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks (8-token overlap); chunk text compared
    by polynomial hash to keep the oracle diff compact."""
    docs = read_table(spark, sf_dir, "documents")
    chunks = C.chunk_documents(docs, "text", "doc_id", 32, 8)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        string_hash(F.col("chunk_text")).alias("chunk_hash"),
    )


DOC_CHUNKS_SQL = """
WITH t AS (
    SELECT doc_id, {toks} AS toks FROM documents
), s AS (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks) - 8, 1) + 1, 24)) AS start
    FROM t
)
SELECT doc_id,
       CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
       CAST(len(toks[start : start + 31]) AS BIGINT) AS n_tokens,
       {chunk_hash} AS chunk_hash
FROM s
""".format(
    toks=_TOKS.format(c="text"),
    chunk_hash=_sql_hash("array_to_string(toks[start : start + 31], ' ')"),
)


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: distinct word 3-grams of each test-split document
    matched against the full train-split gram set (equi-join on gram hash —
    never a doc×doc comparison)."""
    docs = read_table(spark, sf_dir, "documents")
    split = C.assign_split(docs, "doc_id")
    train = split.filter(F.col("split") == "train")
    eval_ = split.filter(F.col("split") == "test")
    out = C.ngram_contamination(train, eval_, "text", "doc_id", n=3)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        "n_shared",
        stable_round("contamination", 6).alias("contamination"),
    )


CONTAMINATION_SQL = """
WITH s AS (
    SELECT doc_id, text, {bucket} AS b FROM documents
), g AS (
    SELECT doc_id, b,
           list_distinct(list_transform(
               range(1, greatest(len({toks}) - 2, 1) + 1),
               i -> {gram_hash})) AS grams
    FROM s
), tr AS (
    SELECT DISTINCT unnest(grams) AS gh FROM g WHERE b < {train_upper}
), ev AS (
    SELECT doc_id, grams FROM g WHERE b >= {val_upper}
), hits AS (
    SELECT e.doc_id, count(*) AS n_shared
    FROM (SELECT doc_id, unnest(grams) AS gh FROM ev) e
    JOIN tr USING (gh)
    GROUP BY e.doc_id
)
SELECT ev.doc_id,
       CAST(len(ev.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(hits.n_shared, 0) AS BIGINT) AS n_shared,
       {r} AS contamination
FROM ev LEFT JOIN hits USING (doc_id)
""".format(
    bucket=_SPLIT_BUCKET_SQL,
    toks=_TOKS.format(c="text"),
    gram_hash=_sql_hash(
        "array_to_string(" + _TOKS.format(c="text") + "[i : i + 2], ' ')"
    ),
    train_upper=C.TRAIN_UPPER,
    val_upper=C.VAL_UPPER,
    r=sql_round(
        "CAST(coalesce(hits.n_shared, 0) AS DOUBLE)"
        " / greatest(len(ev.grams), 1)",
        6,
    ),
)


def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return C.temperature_sample_quotas(
        docs, "source", "doc_id", target_total=200
    ).orderBy("source")


_MIX_BUCKET = (
    f"((({_sql_hash('CAST(doc_id AS VARCHAR)')}) * 2654435761)"
    f" % 4294967296) * 1000000000 // 4294967296"
)

TEMPERATURE_MIX_SQL = f"""
WITH counts AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), weights AS (
    SELECT source, n_docs,
           CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w
    FROM counts
), quotas AS (
    SELECT source, n_docs, (w * 200) // (SELECT sum(w) FROM weights) AS quota
    FROM weights
), ranked AS (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {_MIX_BUCKET}, doc_id) AS rn
    FROM documents
), kept AS (
    SELECT r.source, count(*) AS n_kept
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rn <= q.quota
    GROUP BY r.source
)
SELECT q.source, q.n_docs, CAST(q.quota AS BIGINT) AS quota,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM quotas q LEFT JOIN kept k USING (source)
ORDER BY q.source
"""


def corpus_shuffle_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 50 documents of the seeded global shuffle — the reproducible
    ORDER BY random() replacement for training-example ordering."""
    docs = read_table(spark, sf_dir, "documents")
    pos = C.shuffled_position("doc_id")
    return (
        docs.select("doc_id", pos.alias("shuffle_pos"))
        .orderBy("shuffle_pos", "doc_id")
        .limit(50)
    )


CORPUS_SHUFFLE_SQL = f"""
SELECT doc_id, {_MIX_BUCKET} AS shuffle_pos
FROM documents
ORDER BY shuffle_pos, doc_id
LIMIT 50
"""


def chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group packing summary of the 32-token chunk stream under a
    128-token budget (greedy FFD in applyInPandas). The FFD loop is
    iterative but fully deterministic, so the oracle replays it with a
    recursive CTE: each recursion step advances every group by one chunk
    in FFD order, threading the pack-remainder list as a LIST column and
    first-fitting via a lambda scan — byte-identical pack counts.
    Invariants are additionally pytest-checked in tests/test_corpus.py."""
    docs = read_table(spark, sf_dir, "documents")
    chunks = C.chunk_documents(docs, "text", "doc_id", 32, 8)
    packed = C.pack_chunks(chunks, budget=128, n_groups=16)
    return (
        packed.groupBy("group_id")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("group_id")
    )


def pii_scrub_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction parity check: plants a deterministic email + phone
    into every document, then counts and redacts them. The oracle runs
    the identical regexes under DuckDB's RE2, so this proves the
    cross-engine behavior of the scrubbing pass itself (the fixture text
    contains no organic PII)."""
    from ..operators.text import pii_count, redact_pii, string_hash

    docs = read_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        pii_count(planted, "email").cast("long").alias("n_emails"),
        pii_count(planted, "phone").cast("long").alias("n_phones"),
        string_hash(redact_pii(planted)).alias("redacted_hash"),
    ).orderBy("doc_id")


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"[0-9]{3}-[0-9]{3,}"
_PLANTED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 555-01' || CAST(doc_id AS VARCHAR)"
)

PII_SCRUB_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({_PLANTED}, '{_PII_EMAIL}'))
            AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({_PLANTED}, '{_PII_PHONE}'))
            AS BIGINT) AS n_phones,
       {_sql_hash(
           "regexp_replace(regexp_replace(" + _PLANTED
           + ", '" + _PII_EMAIL + "', '[EMAIL]', 'g'), '"
           + _PII_PHONE + "', '[PHONE]', 'g')"
       )} AS redacted_hash
FROM documents
ORDER BY doc_id
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    out = C.funnel_counts(events, ("view", "click", "purchase"))
    return out.select(
        "n_step1",
        "n_step2",
        "n_step3",
        stable_round("rate_12", 6).alias("rate_12"),
        stable_round("rate_23", 6).alias("rate_23"),
    )


EVENTS_FUNNEL_SQL = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2 FROM events e
    JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3 FROM events e
    JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_step1,
       (SELECT count(*) FROM s2) AS n_step2,
       (SELECT count(*) FROM s3) AS n_step3,
       {sql_round('(SELECT count(*) FROM s2) * 1.0'
                  ' / greatest((SELECT count(*) FROM s1), 1)', 6)} AS rate_12,
       {sql_round('(SELECT count(*) FROM s3) * 1.0'
                  ' / greatest((SELECT count(*) FROM s2), 1)', 6)} AS rate_23
"""


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel with a 3-day conversion window measured from the entry
    event (corpus.funnel_counts max_span_seconds) — later steps outside
    the window don't convert."""
    events = read_table(spark, sf_dir, "events")
    out = C.funnel_counts(
        events, ("view", "click", "purchase"), max_span_seconds=3 * 86400
    )
    return out.select(
        "n_step1",
        "n_step2",
        "n_step3",
        stable_round("rate_12", 6).alias("rate_12"),
        stable_round("rate_23", 6).alias("rate_23"),
    )


EVENTS_FUNNEL_WINDOWED_SQL = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2, max(s1.t1) AS t1 FROM events e
    JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t1
      AND e.ts <= s1.t1 + INTERVAL 3 DAY
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3 FROM events e
    JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      AND e.ts <= s2.t1 + INTERVAL 3 DAY
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_step1,
       (SELECT count(*) FROM s2) AS n_step2,
       (SELECT count(*) FROM s3) AS n_step3,
       {sql_round('(SELECT count(*) FROM s2) * 1.0'
                  ' / greatest((SELECT count(*) FROM s1), 1)', 6)} AS rate_12,
       {sql_round('(SELECT count(*) FROM s3) * 1.0'
                  ' / greatest((SELECT count(*) FROM s2), 1)', 6)} AS rate_23
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition quality signals over the documents table —
    duplicate-bigram fraction and modal-bigram share, rounded for
    cross-engine hashing."""
    docs = read_table(spark, sf_dir, "documents")
    out = C.repetition_stats(docs, "text", "doc_id")
    return out.select(
        "doc_id",
        stable_round("dup_bigram_frac", 6).alias("dup_bigram_frac"),
        stable_round("top_bigram_frac", 6).alias("top_bigram_frac"),
    ).orderBy("doc_id")


DOC_REPETITION_SQL = """
WITH toks AS (
    SELECT doc_id, {toks} AS t FROM documents
),
grams AS (
    SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
    FROM (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks)
),
counts AS (
    SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
),
per_doc AS (
    SELECT doc_id, sum(c) AS total, count(*) AS n_distinct, max(c) AS top
    FROM counts GROUP BY doc_id
)
SELECT doc_id,
       {r_dup} AS dup_bigram_frac,
       {r_top} AS top_bigram_frac
FROM per_doc
ORDER BY doc_id
""".format(
    toks=_TOKS.format(c="text"),
    r_dup=sql_round("(total - n_distinct) * 1.0 / total", 6),
    r_top=sql_round("top * 1.0 / total", 6),
)


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate document pairs (MinHash graph,
    threshold 0.8) tallied by the split pair they straddle. Hash-based
    splitting assigns near-dups independently, so without a
    cluster-aware split a fraction of dup pairs lands across train/test —
    exactly the leakage this audit quantifies (the reason modern corpus
    pipelines dedup BEFORE splitting). Rows with split_a ≠ split_b are
    the leaks; the within-split rows complete the distribution."""
    from ..operators import dedup as D
    from .data_queries import JACCARD_THRESHOLD

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_neardup(docs, "text", "doc_id", threshold=JACCARD_THRESHOLD)
    splits = C.assign_split(docs.select("doc_id"), "doc_id").select(
        "doc_id", "split"
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("__sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("__sb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("split_a", "split_b")
    )


def _split_leakage_sql() -> str:
    from .data_queries import _minhash_sql

    return f"""
WITH pairs AS ({_minhash_sql()}),
s AS (SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       count(*) AS n_pairs
FROM pairs p
JOIN s sa ON sa.doc_id = p.doc_a
JOIN s sb ON sb.doc_id = p.doc_b
GROUP BY 1, 2
ORDER BY split_a, split_b
"""


def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIX for what split_leakage_pairs audits: assign train/val/test
    by the near-dup CLUSTER representative, not the doc id, so every
    near-duplicate pair lands in the same split by construction (dedup-
    aware splitting — the standard ordering modern corpus pipelines use:
    cluster first, split on the cluster key). Composition: MinHash graph
    → connected components → split_key = component min-id (docs with no
    near-dup keep their own id) → the same Fibonacci-mixed hash split as
    assign_split, keyed on split_key.

    Scale: adds nothing beyond the dedup_clusters pipeline it reuses —
    one extra doc_id-keyed left join and a stateless hash map."""
    from ..operators import dedup as D
    from .data_queries import JACCARD_THRESHOLD

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_neardup(
        docs, "text", "doc_id", threshold=JACCARD_THRESHOLD
    )
    cc = D.connected_components(pairs, a_col="doc_a", b_col="doc_b")
    keyed = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("split_key"),
        )
    )
    return (
        C.assign_split(keyed, "split_key")
        .select("doc_id", "split_key", "split")
        .orderBy("doc_id")
    )


def _split_case_for(col: str) -> str:
    """The assign_split CASE on an arbitrary int column (int64-exact)."""
    bucket = (
        f"((({_sql_hash(f'CAST({col} AS VARCHAR)')}) * 2654435761)"
        f" % 4294967296) * {C.SPLIT_BUCKETS} // 4294967296"
    )
    return f"""CASE
    WHEN {bucket} < {C.TRAIN_UPPER} THEN 'train'
    WHEN {bucket} < {C.VAL_UPPER} THEN 'val'
    ELSE 'test' END"""


def _leakage_safe_splits_sql() -> str:
    from .data_queries import _minhash_sql

    return f"""
WITH RECURSIVE
p AS (SELECT doc_a, doc_b FROM ({_minhash_sql()}) mp),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM p
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM p
),
comp(node, label) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, c.label
    FROM comp c JOIN edges e ON e.src = c.node
),
labels AS (
    SELECT node, min(label) AS component FROM comp GROUP BY node
),
r AS (
    SELECT d.doc_id, coalesce(l.component, d.doc_id) AS split_key
    FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
)
SELECT doc_id, split_key, {_split_case_for('split_key')} AS split
FROM r
ORDER BY doc_id
"""


def vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters through a sketch-prefilter cascade: freqItems
    (bounded-state KPS counter sketch, superset guarantee) proposes
    candidates, an exact count over candidate-matching instances filters
    to precisely frequency ≥ 2% — so the plain GROUP BY ... HAVING oracle
    checks it exactly despite the sketch in the plan."""
    docs = read_table(spark, sf_dir, "documents")
    out = C.vocab_heavy_hitters(docs, support=0.02)
    return out.select(
        "term",
        "n_occurrences",
        stable_round("frequency", 6).alias("frequency"),
    )


HEAVY_HITTERS_SQL = """
WITH t AS (
    SELECT unnest({toks}) AS term FROM documents
), tot AS (SELECT count(*) AS n FROM t)
SELECT term,
       count(*) AS n_occurrences,
       {f} AS frequency
FROM t, tot
GROUP BY term, tot.n
HAVING count(*) >= 0.02 * tot.n
ORDER BY n_occurrences DESC, term
""".format(
    toks=_TOKS.format(c="text"),
    f=sql_round("count(*) / CAST(tot.n AS DOUBLE)", 6),
)


# first-fit index into the remainder list (1-based; NULL = no pack fits)
_FFD_FIT = (
    "list_filter(range(1, len(f.rem) + 1),"
    " i -> list_extract(f.rem, i) >= o.n_tokens)[1]"
)

CHUNK_PACKING_SQL = """
WITH RECURSIVE
t AS (
    SELECT doc_id, {toks} AS toks FROM documents
), s AS (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks) - 8, 1) + 1, 24)) AS start
    FROM t
), chunks AS (
    SELECT doc_id,
           CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
           CAST(len(toks[start : start + 31]) AS BIGINT) AS n_tokens,
           CAST(({bucket}) % 16 AS BIGINT) AS group_id
    FROM s
), ord AS (
    SELECT *, row_number() OVER (
               PARTITION BY group_id
               ORDER BY n_tokens DESC, doc_id, chunk_idx) AS rn
    FROM chunks
), ffd(group_id, rn, rem, n_packs) AS (
    SELECT group_id, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), CAST(0 AS BIGINT)
    FROM (SELECT DISTINCT group_id FROM ord)
    UNION ALL
    SELECT o.group_id, o.rn,
           CASE WHEN {fit} IS NULL
                THEN list_append(f.rem, greatest(128 - o.n_tokens, 0))
                ELSE list_transform(range(1, len(f.rem) + 1),
                     i -> CASE WHEN i = {fit}
                               THEN list_extract(f.rem, i) - o.n_tokens
                               ELSE list_extract(f.rem, i) END)
           END,
           CASE WHEN {fit} IS NULL THEN f.n_packs + 1 ELSE f.n_packs END
    FROM ffd f JOIN ord o ON o.group_id = f.group_id AND o.rn = f.rn + 1
), sizes AS (
    SELECT group_id, count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           max(rn) AS last_rn
    FROM ord GROUP BY group_id
)
SELECT s.group_id,
       f.n_packs,
       CAST(s.n_chunks AS BIGINT) AS n_chunks,
       s.total_tokens
FROM sizes s JOIN ffd f ON f.group_id = s.group_id AND f.rn = s.last_rn
ORDER BY s.group_id
""".format(
    toks=_TOKS.format(c="text"),
    bucket=(
        f"((({_sql_hash('CAST(doc_id AS VARCHAR)')}) * 2654435761)"
        f" % 4294967296) * 1000000000 // 4294967296"
    ),
    fit=_FFD_FIT,
)


#: Gopher rule-filter thresholds (Rae et al. 2021, Table A1 — the subset
#: whose signals exist in any plain-text corpus; the symbol/bullet/
#: ellipsis rules key on layout characters and join trivially when needed)
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MEAN_LEN = 3.0
_GOPHER_MAX_MEAN_LEN = 10.0
_GOPHER_MIN_ALPHA_RATIO = 0.80
_GOPHER_MIN_STOP_HITS = 2
_GOPHER_MAX_DUP_LINE_RATIO = 0.30
#: Gopher's own 8-word stop list (distinct from the lang-ID STOPWORDS)
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1) —
    the hard-threshold sibling of the learned quality scorers
    (doc_nb_quality / doc_logreg_quality): per document, the raw signals
    and one 0/1 flag per rule, plus the conjunction. Everything is pure
    Catalyst over one tokenize pass (zero Python, zero shuffle beyond
    the scan), so at 100 TB this is a map-only projection — the cheapest
    possible pre-filter in front of the dedup/classifier stages.

    Rules (thresholds = the paper's): word count in [50, 100k]; mean
    word length in [3, 10]; ≥80% of words contain an alphabetic
    character; ≥2 hits on Gopher's 8-word stop list (the, be, to, of,
    and, that, have, with); duplicate-line fraction ≤30%."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")

    def per_doc(t: Column) -> list[Column]:
        n = F.size(t)
        nd = n.cast("double")
        mean_len = F.when(
            n > 0,
            F.aggregate(
                F.transform(t, lambda w: F.length(w)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / nd,
        ).otherwise(F.lit(0.0))
        alpha = F.when(
            n > 0,
            F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]"))).cast(
                "double"
            )
            / nd,
        ).otherwise(F.lit(0.0))
        stops = F.size(
            F.filter(
                t, lambda w: F.lower(w).isin(*_GOPHER_STOPS)
            )
        )
        lines = F.split(F.col("text"), "\n")
        nl = F.size(lines)
        dup_lines = F.when(
            nl > 0,
            (nl - F.size(F.array_distinct(lines))).cast("double")
            / nl.cast("double"),
        ).otherwise(F.lit(0.0))
        return [n, mean_len, alpha, stops, dup_lines]

    n, mean_len, alpha, stops, dup_lines = per_doc(toks)
    ok_wc = (n >= _GOPHER_MIN_WORDS) & (n <= _GOPHER_MAX_WORDS)
    ok_ml = (mean_len >= _GOPHER_MIN_MEAN_LEN) & (
        mean_len <= _GOPHER_MAX_MEAN_LEN
    )
    ok_al = alpha >= _GOPHER_MIN_ALPHA_RATIO
    ok_st = stops >= _GOPHER_MIN_STOP_HITS
    ok_dl = dup_lines <= _GOPHER_MAX_DUP_LINE_RATIO
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        stable_round(mean_len, 6).alias("mean_word_len"),
        stable_round(alpha, 6).alias("alpha_ratio"),
        stops.cast("long").alias("stop_hits"),
        stable_round(dup_lines, 6).alias("dup_line_ratio"),
        ok_wc.cast("int").alias("ok_word_count"),
        ok_ml.cast("int").alias("ok_mean_word_len"),
        ok_al.cast("int").alias("ok_alpha"),
        ok_st.cast("int").alias("ok_stop_hits"),
        ok_dl.cast("int").alias("ok_dup_lines"),
        (ok_wc & ok_ml & ok_al & ok_st & ok_dl).cast("int").alias("passes"),
    ).orderBy("doc_id")


def _gopher_rules_sql() -> str:
    toks = _TOKS.format(c="text")
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)
    return f"""
WITH sig AS (
    SELECT doc_id,
           len(t) AS n_words,
           CASE WHEN len(t) > 0 THEN
               CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE)
               / len(t) ELSE 0.0 END AS mean_word_len,
           CASE WHEN len(t) > 0 THEN
               CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
                    AS DOUBLE) / len(t) ELSE 0.0 END AS alpha_ratio,
           len(list_filter(t, w -> lower(w) IN ({stops}))) AS stop_hits,
           CASE WHEN len(l) > 0 THEN
               CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l)
           ELSE 0.0 END AS dup_line_ratio
    FROM (
        SELECT doc_id, {toks} AS t,
               string_split(text, chr(10)) AS l
        FROM documents
    )
), flags AS (
    SELECT *,
           CASE WHEN n_words >= {_GOPHER_MIN_WORDS}
                 AND n_words <= {_GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS ok_word_count,
           CASE WHEN mean_word_len >= {_GOPHER_MIN_MEAN_LEN!r}
                 AND mean_word_len <= {_GOPHER_MAX_MEAN_LEN!r} THEN 1 ELSE 0 END AS ok_mean_word_len,
           CASE WHEN alpha_ratio >= {_GOPHER_MIN_ALPHA_RATIO!r} THEN 1 ELSE 0 END AS ok_alpha,
           CASE WHEN stop_hits >= {_GOPHER_MIN_STOP_HITS} THEN 1 ELSE 0 END AS ok_stop_hits,
           CASE WHEN dup_line_ratio <= {_GOPHER_MAX_DUP_LINE_RATIO!r} THEN 1 ELSE 0 END AS ok_dup_lines
    FROM sig
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       {sql_round("mean_word_len", 6)} AS mean_word_len,
       {sql_round("alpha_ratio", 6)} AS alpha_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       {sql_round("dup_line_ratio", 6)} AS dup_line_ratio,
       ok_word_count, ok_mean_word_len, ok_alpha, ok_stop_hits,
       ok_dup_lines,
       ok_word_count * ok_mean_word_len * ok_alpha * ok_stop_hits
         * ok_dup_lines AS passes
FROM flags
ORDER BY doc_id
"""


GOPHER_RULES_SQL = _gopher_rules_sql()


def doc_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained Naive Bayes quality classifier (the FineWeb-Edu
    pseudo-label recipe: heuristic quality ≥ 0.5 labels the training set,
    then a multinomial NB over raw tokens re-scores every document).
    Unlike doc_model_quality's fixed-weight scorer, the MODEL here is fit
    on the cluster — one conditional token aggregation — and scoring is a
    vocab-bounded left join + per-doc sum (operators.corpus
    .nb_quality_scores). The oracle replays counts, add-alpha smoothing,
    priors, and the per-doc LLR sum."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    quality = X.quality_score_in(
        toks, X.punct_ratio("text"), X.stopword_ratio_in(toks)
    )
    labeled = docs.select(
        "doc_id", "text", (quality >= F.lit(0.5)).alias("label")
    )
    out = C.nb_quality_scores(labeled, labeled)
    return out.select(
        "doc_id",
        "n_tokens",
        stable_round("nb_score", 6).alias("nb_score"),
    ).orderBy("doc_id")


_NB_LABEL_EXPR = """(0.4 * least(len({toks}) / 50.0, 1.0)
    + 0.3 * (1.0 - least(
        CASE WHEN length(text) > 0 THEN
            CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                 AS DOUBLE) / length(text) ELSE 0.0 END * 5.0, 1.0))
    + 0.3 * least(
        CASE WHEN len({toks}) > 0 THEN
            CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END * 5.0,
        1.0)) >= 0.5""".format(
    toks=_TOKS.format(c="text"), en_hits=_sql_stop_hits("en")
)

NB_QUALITY_SQL = """
WITH base AS ({inner})
SELECT doc_id, n_tokens, {r} AS nb_score FROM base ORDER BY doc_id
""".format(
    inner=C.nb_quality_sql(
        _NB_LABEL_EXPR, toks_expr=_TOKS.format(c="text")
    ),
    r=sql_round("nb_score", 6),
)


# Most-recent-only persist pin for the trained-model feature frames
# (see plans.caching — its own slot, independent of the pretrain pin).
_pin_mlfit = make_pin()


def _logreg_feats(docs: DataFrame) -> DataFrame:
    """Shared (doc_id, x0, x1, x2, y) frame for the trained-classifier
    queries: features (1, quality, ln(1+n_tokens)), pseudo-label
    language_id == 'en'.

    PERSISTED (most-recent-only pin): the consumers scan it 3–4 times
    (per Newton step, scoring, evaluation), and without the pin each
    scan re-derives the full tokenize + 4-language stopword-filter +
    quality chain from the documents scan. Measured at the 64× rung
    (tools/scale/results_mlfit_r10*.json): 88.4 s unpinned → 43.9 s
    localCheckpointed → 37.9 s persisted. Two caveats the A/B exposed:
    the MATERIALIZATION pass itself costs ~3× one fused agg scan (the
    cache-build projection of these giant expressions falls out of
    fused whole-stage codegen — the direct agg is the fast evaluator),
    so the pin only pays at ≥3 consumers: doc_quality_ols (2 scans)
    stays deliberately UNPINNED (11.5 s plain vs 39.9 s pinned per
    fit-scan at 64×). persist, not localCheckpoint — the RDD conversion
    costs another ~15%. Cached frame: 4 doubles + an id per row
    (~10 MB at 64×)."""
    toks = tokens("text")
    praw = X.punct_ratio("text")
    quality = X.quality_score_in(toks, praw, X.stopword_ratio_in(toks))
    y = (X.language_id_in(toks) == F.lit("en")).cast("double")
    return _pin_mlfit(
        docs.select(
            "doc_id",
            F.lit(1.0).alias("x0"),
            quality.alias("x1"),
            F.log(F.lit(1.0) + F.size(toks).cast("double")).alias("x2"),
            # x3/x4 ride along for the d=4/d=5 variants; the d=3 fits
            # never reference them (6 doubles + id per cached row)
            X.stopword_ratio_in(toks).alias("x3"),
            # x4 = mean chars per token — length-scale information the
            # ln(1+tokens) axis doesn't carry (not an affine function of
            # any other feature; conditioning measured on the fixture:
            # cond(A) ≈ 2e5, det/Π diag ≈ 1e-9 ≫ the 1e-12 guard)
            (
                F.length("text").cast("double")
                / (F.lit(1.0) + F.size(toks).cast("double"))
            ).alias("x4"),
            y.alias("y"),
        )
    )


def doc_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained LOGISTIC-REGRESSION quality classifier — the
    discriminative sibling of doc_nb_quality's generative NB, completing
    the on-cluster classifier family (operators.mlfit): two Newton/IRLS
    steps, each ONE d=3 normal-matrix aggregation (9 doubles of state)
    plus a driver-side adjugate solve whose float-op order the oracle
    replays term for term; scoring is a stateless codegen sigmoid.
    Pseudo-labels = language_id == 'en'; features = (1, quality,
    ln(1 + n_tokens)) — correlated with but not derived from the label,
    the FineWeb-Edu teacher-label shape. (punct_ratio is deliberately
    NOT a feature: the synthetic corpus carries no punctuation, so that
    column is identically zero and the normal matrix goes singular —
    the trainer raises a clear error on exactly that.) The
    oracle replays both Newton steps as chained CTEs
    (mlfit.logreg_sql3) and scores with the resulting weights."""
    from ..operators import mlfit as M

    feats = _logreg_feats(read_table(spark, sf_dir, "documents"))
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    return feats.select(
        "doc_id",
        stable_round(M.logreg_scores(feats, fx, w), 6).alias("lr_score"),
    ).orderBy("doc_id")


def _logreg_ctes() -> str:
    """Shared oracle CTE body: feats + both Newton steps (ends at w2)."""
    from ..operators.mlfit import logreg_sql3

    toks = _TOKS.format(c="text")
    feats_cte = """feats AS (
    SELECT doc_id, 1.0 AS x0,
           0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - least(praw * 5.0, 1.0))
             + 0.3 * least(sraw * 5.0, 1.0) AS x1,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x2,
           CASE WHEN lang_pred = 'en' THEN 1.0 ELSE 0.0 END AS y
    FROM (
        SELECT doc_id,
               len({toks}) AS n_tokens,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
               CASE WHEN len({toks}) > 0 THEN
                   CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END AS sraw,
               CASE
                 WHEN {fr_hits} > greatest({es_hits}, {en_hits}, {de_hits}, 0) THEN 'fr'
                 WHEN {es_hits} > greatest({en_hits}, {de_hits}, 0) THEN 'es'
                 WHEN {en_hits} > greatest({de_hits}, 0) THEN 'en'
                 WHEN {de_hits} > 0 THEN 'de'
                 ELSE 'und'
               END AS lang_pred
        FROM documents
    )
)""".format(
        toks=toks,
        en_hits=_sql_stop_hits("en"),
        de_hits=_sql_stop_hits("de"),
        es_hits=_sql_stop_hits("es"),
        fr_hits=_sql_stop_hits("fr"),
    )
    return logreg_sql3(feats_cte, iters=2)


_LOGREG_SCORE_EXPR = (
    "1.0 / (1.0 + exp(-((w.w0 * f.x0 + w.w1 * f.x1) + w.w2 * f.x2)))"
)


def _logreg_quality_sql() -> str:
    return f"""
WITH {_logreg_ctes()}
SELECT f.doc_id, {sql_round(_LOGREG_SCORE_EXPR, 6)} AS lr_score
FROM feats f CROSS JOIN w2 w
ORDER BY f.doc_id
"""


LOGREG_QUALITY_SQL = _logreg_quality_sql()


def doc_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ROC-AUC of the on-cluster logistic classifier against
    its pseudo-labels — the evaluation half of the trained-model family,
    in the rank-sum (Mann–Whitney) form: AUC = (Σ_pos avg-rank −
    n₁(n₁+1)/2) / (n₁·n₀). Ranks come from ``corpus.global_rank`` (the
    scale-safe total-order ranking: range exchange + per-partition Arrow
    pass — NO single-partition window), average ranks per tied score
    from one score-keyed aggregation (exact score ties are exact in both
    engines — same formula, same doubles), and the rank-sum from one
    more bounded agg. Evaluating a classifier over 10¹¹ scored rows is
    exactly this plan. Output: one row (n_pos, n_neg, auc).

    Precondition: both classes present — single-class pseudo-labels
    (every doc predicted 'en', or none) make AUC undefined and raise a
    clear ValueError instead of a ZeroDivisionError (ADVICE r10)."""
    from ..operators import mlfit as M

    feats = _logreg_feats(read_table(spark, sf_dir, "documents"))
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    scored = feats.select(
        "doc_id", "y", M.logreg_scores(feats, fx, w, out_col="score")
    )
    ranked = C.global_rank(scored, ["score", "doc_id"])
    grp = ranked.groupBy("score").agg(
        F.avg(F.col("rank").cast("double")).alias("__ar"),
        F.sum("y").alias("__n1s"),
    )
    rp = float(
        grp.agg(F.sum(F.col("__n1s") * F.col("__ar")).alias("s")).first()[
            "s"
        ]
    )
    tot = scored.agg(
        F.sum("y").alias("n1"),
        F.sum(F.lit(1.0) - F.col("y")).alias("n0"),
    ).first()
    n1, n0 = float(tot["n1"]), float(tot["n0"])
    if n1 == 0.0 or n0 == 0.0:
        # single-class pseudo-labels: AUC is undefined (the SQL oracle
        # would divide by zero too) — fail loudly, mirroring
        # logreg_newton_fit's empty-input error (ADVICE r10)
        raise ValueError(
            "doc_classifier_auc: single-class labels "
            f"(n_pos={int(n1)}, n_neg={int(n0)}) — ROC-AUC requires both "
            "classes present; check the language_id pseudo-labeling"
        )
    auc = (rp - n1 * (n1 + 1.0) / 2.0) / (n1 * n0)
    return spark.createDataFrame(
        [(int(n1), int(n0), auc)], "n_pos long, n_neg long, auc double"
    ).select(
        "n_pos", "n_neg", stable_round(F.col("auc"), 6).alias("auc")
    )


def _classifier_auc_sql() -> str:
    return f"""
WITH {_logreg_ctes()},
scored AS (
    SELECT f.doc_id, f.y, {_LOGREG_SCORE_EXPR} AS score
    FROM feats f CROSS JOIN w2 w
), ranked AS (
    SELECT y, score,
           row_number() OVER (ORDER BY score, doc_id) AS rnk
    FROM scored
), grp AS (
    SELECT score, avg(rnk) AS ar, sum(y) AS n1s FROM ranked GROUP BY score
), tot AS (
    SELECT sum(y) AS n1, sum(1.0 - y) AS n0 FROM scored
)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       {sql_round("((SELECT sum(n1s * ar) FROM grp) - n1 * (n1 + 1.0) / 2.0) / (n1 * n0)", 6)} AS auc
FROM tot
"""


CLASSIFIER_AUC_SQL = _classifier_auc_sql()


def doc_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the trained classifier — the third member
    of the evaluation set (scores: doc_logreg_quality; ranking quality:
    doc_classifier_auc; calibration: this): scores bucketed into ten
    fixed bins, each reporting count, mean predicted probability, and
    observed positive rate. One hash aggregation over the scored frame —
    at 100 TB this is the same plan as a word count. A well-calibrated
    classifier has frac_pos ≈ avg_score per bin; the gap IS the
    calibration error (one weighted-avg away from ECE)."""
    from ..operators import mlfit as M

    feats = _logreg_feats(read_table(spark, sf_dir, "documents"))
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    scored = feats.select(
        "y", M.logreg_scores(feats, fx, w, out_col="score")
    )
    # bin on the 1e-6-ROUNDED score: the raw sigmoid differs between
    # engines in the accepted reduction-order class, and a doc within a
    # ulp of a k/10 boundary would flip bins — an integer count mismatch
    # the value rounding cannot absorb (the cluster.py emit_dist lesson)
    b = F.least(
        F.floor(stable_round("score", 6) * F.lit(10.0)).cast("long"),
        F.lit(9),
    )
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.avg("score"), 6).alias("avg_score"),
            stable_round(F.avg("y"), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def _calibration_bins_sql() -> str:
    rounded_score = sql_round("score", 6)
    return f"""
WITH {_logreg_ctes()},
scored AS (
    SELECT f.y, {_LOGREG_SCORE_EXPR} AS score
    FROM feats f CROSS JOIN w2 w
)
SELECT least(CAST(floor(({rounded_score}) * 10.0) AS BIGINT), 9) AS bin,
       count(*) AS n,
       {sql_round("avg(score)", 6)} AS avg_score,
       {sql_round("avg(y)", 6)} AS frac_pos
FROM scored
GROUP BY 1 ORDER BY bin
"""


CALIBRATION_BINS_SQL = _calibration_bins_sql()


def doc_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error — the scalar the calibration-bins
    docstring promised was "one weighted-avg away": ECE = Σ_b (n_b/N) ·
    |avg_score_b − frac_pos_b| over the ten reliability bins (Naeini et
    al. 2015's binned estimator). Computed FROM the rounded bin
    aggregates (the hash-matched cross-engine surface), so the only
    engine divergence is the 10-term final sum's order — absorbed by the
    1e-6 rounding. Same 100 TB plan as the bins: one hash agg + a
    10-row reduction. Output: one row (n_docs, ece)."""
    bins = doc_calibration_bins(spark, sf_dir)
    gap = F.abs(F.col("avg_score") - F.col("frac_pos"))
    return bins.agg(
        F.sum("n").cast("long").alias("n_docs"),
        stable_round(
            F.sum(F.col("n").cast("double") * gap) / F.sum(F.col("n").cast("double")),
            6,
        ).alias("ece"),
    )


def _calibration_ece_sql() -> str:
    rounded_score = sql_round("score", 6)
    return f"""
WITH {_logreg_ctes()},
scored AS (
    SELECT f.y, {_LOGREG_SCORE_EXPR} AS score
    FROM feats f CROSS JOIN w2 w
),
bins AS (
    SELECT least(CAST(floor(({rounded_score}) * 10.0) AS BIGINT), 9) AS bin,
           count(*) AS n,
           {sql_round("avg(score)", 6)} AS avg_score,
           {sql_round("avg(y)", 6)} AS frac_pos
    FROM scored
    GROUP BY 1
)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       {sql_round(
           "sum(CAST(n AS DOUBLE) * abs(avg_score - frac_pos))"
           " / sum(CAST(n AS DOUBLE))", 6
       )} AS ece
FROM bins
"""


CALIBRATION_ECE_SQL = _calibration_ece_sql()


def doc_logreg_quality_d4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d=4 logistic fit — extends the oracle-matched float contract
    past d=3 (VERDICT r10 "What's wrong" #2): features (1, quality,
    ln(1+n_tokens), stopword_ratio), two Newton steps, each ONE 14-cell
    normal-matrix aggregation plus a driver-side 4×4 adjugate solve
    whose formulas are the SAME expression strings the oracle splices
    into its CTEs (mlfit._DET4_EXPR/_INV4_EXPRS — term order matches by
    construction, not by hand-mirroring). stopword_ratio is NOT an
    affine function of the other features (quality clips it through
    min(sraw·5, 1)), so the normal matrix stays honestly full-rank while
    still exercising correlated features. Scale shape identical to the
    d=3 fit: d(d+3)/2 = 14 doubles of state per step."""
    from ..operators import mlfit as M

    feats = _logreg_feats(read_table(spark, sf_dir, "documents"))
    fx = [F.col("x0"), F.col("x1"), F.col("x2"), F.col("x3")]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    return feats.select(
        "doc_id",
        stable_round(M.logreg_scores(feats, fx, w), 6).alias("lr_score"),
    ).orderBy("doc_id")


def _logreg_ctes4() -> str:
    """d=4 oracle CTE body: feats (with x3 = stopword ratio) + both
    Newton steps via mlfit.logreg_sql4 (ends at w2)."""
    from ..operators.mlfit import logreg_sql4

    toks = _TOKS.format(c="text")
    feats_cte = """feats AS (
    SELECT doc_id, 1.0 AS x0,
           0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - least(praw * 5.0, 1.0))
             + 0.3 * least(sraw * 5.0, 1.0) AS x1,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x2,
           sraw AS x3,
           CASE WHEN lang_pred = 'en' THEN 1.0 ELSE 0.0 END AS y
    FROM (
        SELECT doc_id,
               len({toks}) AS n_tokens,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
               CASE WHEN len({toks}) > 0 THEN
                   CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END AS sraw,
               CASE
                 WHEN {fr_hits} > greatest({es_hits}, {en_hits}, {de_hits}, 0) THEN 'fr'
                 WHEN {es_hits} > greatest({en_hits}, {de_hits}, 0) THEN 'es'
                 WHEN {en_hits} > greatest({de_hits}, 0) THEN 'en'
                 WHEN {de_hits} > 0 THEN 'de'
                 ELSE 'und'
               END AS lang_pred
        FROM documents
    )
)""".format(
        toks=toks,
        en_hits=_sql_stop_hits("en"),
        de_hits=_sql_stop_hits("de"),
        es_hits=_sql_stop_hits("es"),
        fr_hits=_sql_stop_hits("fr"),
    )
    return logreg_sql4(feats_cte, iters=2)


_LOGREG_SCORE_EXPR_D4 = (
    "1.0 / (1.0 + exp(-((((w.w0 * f.x0 + w.w1 * f.x1)"
    " + w.w2 * f.x2) + w.w3 * f.x3))))"
)


def _logreg_quality_d4_sql() -> str:
    return f"""
WITH {_logreg_ctes4()}
SELECT f.doc_id, {sql_round(_LOGREG_SCORE_EXPR_D4, 6)} AS lr_score
FROM feats f CROSS JOIN w2 w
ORDER BY f.doc_id
"""


LOGREG_QUALITY_D4_SQL = _logreg_quality_d4_sql()


def doc_logreg_quality_d5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d=5 logistic fit — closes the "first d=5 user walks off the
    oracle path" boundary (VERDICT r11 §Next #7): features (1, quality,
    ln(1+n_tokens), stopword_ratio, chars-per-token), two Newton steps,
    each ONE 20-cell normal-matrix aggregation plus a driver-side 5×5
    adjugate solve whose formulas are GENERATED by the cofactor
    generator (mlfit.adjugate_exprs — the same generator that reproduces
    the handwritten d=4 strings byte-for-byte) and evaluated as the SAME
    text the oracle splices into its CTEs (mlfit.logreg_sqln). x4 =
    length/(1+n_tokens) carries length-scale information none of the
    other axes is an affine function of; the Hadamard-relative
    singularity guard admits the fit at det/Π diag ≈ 1e-9. Scale shape:
    d(d+3)/2 = 20 doubles of state per step, rows never leave the
    executors."""
    from ..operators import mlfit as M

    feats = _logreg_feats(read_table(spark, sf_dir, "documents"))
    fx = [F.col(f"x{i}") for i in range(5)]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    return feats.select(
        "doc_id",
        stable_round(M.logreg_scores(feats, fx, w), 6).alias("lr_score"),
    ).orderBy("doc_id")


def _logreg_ctes5() -> str:
    """d=5 oracle CTE body: feats (x4 = chars-per-token) + both Newton
    steps via mlfit.logreg_sqln (ends at w2)."""
    from ..operators.mlfit import logreg_sqln

    toks = _TOKS.format(c="text")
    feats_cte = """feats AS (
    SELECT doc_id, 1.0 AS x0,
           0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - least(praw * 5.0, 1.0))
             + 0.3 * least(sraw * 5.0, 1.0) AS x1,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x2,
           sraw AS x3,
           CAST(n_chars AS DOUBLE) / (1.0 + CAST(n_tokens AS DOUBLE)) AS x4,
           CASE WHEN lang_pred = 'en' THEN 1.0 ELSE 0.0 END AS y
    FROM (
        SELECT doc_id,
               len({toks}) AS n_tokens,
               length(text) AS n_chars,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
               CASE WHEN len({toks}) > 0 THEN
                   CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END AS sraw,
               CASE
                 WHEN {fr_hits} > greatest({es_hits}, {en_hits}, {de_hits}, 0) THEN 'fr'
                 WHEN {es_hits} > greatest({en_hits}, {de_hits}, 0) THEN 'es'
                 WHEN {en_hits} > greatest({de_hits}, 0) THEN 'en'
                 WHEN {de_hits} > 0 THEN 'de'
                 ELSE 'und'
               END AS lang_pred
        FROM documents
    )
)""".format(
        toks=toks,
        en_hits=_sql_stop_hits("en"),
        de_hits=_sql_stop_hits("de"),
        es_hits=_sql_stop_hits("es"),
        fr_hits=_sql_stop_hits("fr"),
    )
    return logreg_sqln(feats_cte, 5, iters=2)


_LOGREG_SCORE_EXPR_D5 = (
    "1.0 / (1.0 + exp(-(((((w.w0 * f.x0 + w.w1 * f.x1)"
    " + w.w2 * f.x2) + w.w3 * f.x3) + w.w4 * f.x4))))"
)


def _logreg_quality_d5_sql() -> str:
    return f"""
WITH {_logreg_ctes5()}
SELECT f.doc_id, {sql_round(_LOGREG_SCORE_EXPR_D5, 6)} AS lr_score
FROM feats f CROSS JOIN w2 w
ORDER BY f.doc_id
"""


LOGREG_QUALITY_D5_SQL = _logreg_quality_d5_sql()


_OLS_FEATS_CTE = """feats AS (
    SELECT 1.0 AS x0,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x1,
           sraw AS x2,
           0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - least(praw * 5.0, 1.0))
             + 0.3 * least(sraw * 5.0, 1.0) AS y
    FROM (
        SELECT len({toks}) AS n_tokens,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
               CASE WHEN len({toks}) > 0 THEN
                   CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END AS sraw
        FROM documents
    )
)"""


def doc_quality_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS on-cluster (operators.mlfit.ols_fit) — the
    regression member of the trained-model family: distill the composite
    quality heuristic into a linear proxy of (1, ln(1+n_tokens),
    stopword_ratio). (punct_ratio is identically ZERO on this corpus —
    the synthetic text carries no punctuation — which is the exact
    column-of-zeros singularity the solver guards against.) One
    normal-equations aggregation (9 doubles of state)
    + the driver-side adjugate solve the oracle replays term for term;
    one residual pass for the fit quality. Output: (stat, value) rows —
    the three fitted weights and the RMSE. The distilled proxy is the
    production trick this models: score 100 TB with three multiplies
    instead of the full tokenizer pass."""
    from ..operators import mlfit as M

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    praw = X.punct_ratio("text")
    quality = X.quality_score_in(toks, praw, X.stopword_ratio_in(toks))
    # deliberately UNPINNED: only two consumers (normal-equations agg +
    # residual pass), and the 64× A/B showed the cache-build
    # materialization costs ~3× one fused agg scan — two direct scans
    # beat persist here (results_mlfit_r10*.json; _logreg_feats' pin
    # pays only at its 3–4 consumers)
    feats = docs.select(
        F.lit(1.0).alias("x0"),
        F.log(F.lit(1.0) + F.size(toks).cast("double")).alias("x1"),
        X.stopword_ratio_in(toks).alias("x2"),
        quality.alias("y"),
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = M.ols_fit(feats, fx, F.col("y"))
    resid = F.col("y") - M.linear_predict(fx, w)
    rmse = float(
        feats.agg(F.sqrt(F.avg(resid * resid)).alias("r")).first()["r"]
    )
    rows = [
        ("rmse", rmse),
        ("w0", float(w[0])),
        ("w1", float(w[1])),
        ("w2", float(w[2])),
    ]
    return (
        spark.createDataFrame(rows, "stat string, value double")
        .select("stat", stable_round(F.col("value"), 6).alias("value"))
        .orderBy("stat")
    )


def _quality_ols_sql() -> str:
    from ..operators.mlfit import ols_sql3

    cte = ols_sql3(
        _OLS_FEATS_CTE.format(
            toks=_TOKS.format(c="text"), en_hits=_sql_stop_hits("en")
        )
    )
    return f"""
WITH {cte},
resid AS (
    SELECT f.y - ((w.w0 * f.x0 + w.w1 * f.x1) + w.w2 * f.x2) AS e
    FROM feats f CROSS JOIN w
)
SELECT stat, {sql_round("v", 6)} AS value FROM (
    SELECT 'rmse' AS stat, sqrt(avg(e * e)) AS v FROM resid
    UNION ALL SELECT 'w0', w0 FROM w
    UNION ALL SELECT 'w1', w1 FROM w
    UNION ALL SELECT 'w2', w2 FROM w
) ORDER BY stat
"""


QUALITY_OLS_SQL = _quality_ols_sql()


_OLS4_FEATS_CTE = """feats AS (
    SELECT 1.0 AS x0,
           ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x1,
           sraw AS x2,
           least(n_tokens / 50.0, 1.0) AS x3,
           0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * (1.0 - least(praw * 5.0, 1.0))
             + 0.3 * least(sraw * 5.0, 1.0) AS y
    FROM (
        SELECT len({toks}) AS n_tokens,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
               CASE WHEN len({toks}) > 0 THEN
                   CAST({en_hits} AS DOUBLE) / len({toks}) ELSE 0.0 END AS sraw
        FROM documents
    )
)"""


def doc_quality_ols_d4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d=4 OLS fit — closes the oracle-matched float contract for
    BOTH trainers past d=3 (logreg: doc_logreg_quality_d4): features
    (1, ln(1+n_tokens), stopword_ratio, length_saturation) regress the
    composite quality heuristic; one 14-cell normal-equations agg + the
    shared-expression-string 4×4 adjugate solve (mlfit.ols_sql4). The
    length-saturation feature min(n_tokens/50, 1) is a CLIPPED transform
    of x1's argument — correlated but not affine, so the system stays
    honestly full-rank while stressing the solve's conditioning more
    than independent features would. Output: (stat, value) rows — four
    weights + RMSE."""
    from ..operators import mlfit as M

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    praw = X.punct_ratio("text")
    quality = X.quality_score_in(toks, praw, X.stopword_ratio_in(toks))
    feats = docs.select(
        F.lit(1.0).alias("x0"),
        F.log(F.lit(1.0) + F.size(toks).cast("double")).alias("x1"),
        X.stopword_ratio_in(toks).alias("x2"),
        F.least(F.size(toks) / F.lit(50.0), F.lit(1.0)).alias("x3"),
        quality.alias("y"),
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2"), F.col("x3")]
    w = M.ols_fit(feats, fx, F.col("y"))
    resid = F.col("y") - M.linear_predict(fx, w)
    rmse = float(
        feats.agg(F.sqrt(F.avg(resid * resid)).alias("r")).first()["r"]
    )
    rows = [("rmse", rmse)] + [
        (f"w{i}", float(w[i])) for i in range(4)
    ]
    return (
        spark.createDataFrame(rows, "stat string, value double")
        .select("stat", stable_round(F.col("value"), 6).alias("value"))
        .orderBy("stat")
    )


def _quality_ols_d4_sql() -> str:
    from ..operators.mlfit import ols_sql4

    cte = ols_sql4(
        _OLS4_FEATS_CTE.format(
            toks=_TOKS.format(c="text"), en_hits=_sql_stop_hits("en")
        )
    )
    return f"""
WITH {cte},
resid AS (
    SELECT f.y - ((((w.w0 * f.x0 + w.w1 * f.x1) + w.w2 * f.x2)
                   + w.w3 * f.x3)) AS e
    FROM feats f CROSS JOIN w
)
SELECT stat, {sql_round("v", 6)} AS value FROM (
    SELECT 'rmse' AS stat, sqrt(avg(e * e)) AS v FROM resid
    UNION ALL SELECT 'w0', w0 FROM w
    UNION ALL SELECT 'w1', w1 FROM w
    UNION ALL SELECT 'w2', w2 FROM w
    UNION ALL SELECT 'w3', w3 FROM w
) ORDER BY stat
"""


QUALITY_OLS_D4_SQL = _quality_ols_d4_sql()


def source_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining data-recipe solver (corpus.mixture_waterfill):
    allocate a 2.0-epoch token budget over sources ∝ √tokens
    (temperature-0.5 flattening) with a 2.2-epoch per-source cap;
    capped surplus water-fills back onto uncapped sources. One
    token-count aggregation (#sources rows — a bounded driver pull),
    a driver-side integer water-fill, and a literal result frame: the
    100 TB cost is exactly the one corpus scan. The oracle replays all
    24 water-fill iterations as chained CTEs over exact integer
    token-fifths — summation order cannot flip a cap comparison, so
    the replay is bit-faithful, not just close."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    counts = (
        docs.groupBy("source")
        .agg(F.sum(F.size(toks)).cast("long").alias("t"))
        .collect()
    )
    plan = C.mixture_waterfill(
        sorted((r["source"], int(r["t"])) for r in counts)
    )
    rows = [
        (
            p["source"],
            p["n_tokens"],
            p["weight"],
            p["alloc_tokens"],
            p["epochs"],
            p["capped"],
        )
        for p in plan
    ]
    return (
        spark.createDataFrame(
            rows,
            "source string, n_tokens long, weight long, "
            "alloc_tokens double, epochs double, capped int",
        )
        .select(
            "source",
            "n_tokens",
            "weight",
            stable_round(F.col("alloc_tokens"), 6).alias("alloc_tokens"),
            stable_round(F.col("epochs"), 6).alias("epochs"),
            "capped",
        )
        .orderBy("source")
    )


def _mixture_sql() -> str:
    toks = _TOKS.format(c="text")
    cap5, b5m, iters = C.MIXTURE_CAP5, C.MIXTURE_BUDGET5, C.MIXTURE_ITERS
    ctes = [
        f"""counts AS MATERIALIZED (
    SELECT source, CAST(sum(len({toks})) AS BIGINT) AS t
    FROM documents GROUP BY source
)""",
        """base AS MATERIALIZED (
    SELECT source, t,
           CAST(floor(sqrt(CAST(t AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
    FROM counts
)""",
        f"tot AS MATERIALIZED (SELECT {b5m} * sum(t) AS b5 FROM base)",
        "it0 AS MATERIALIZED (SELECT source, t, w, 0 AS capped FROM base)",
    ]
    for k in range(1, iters + 1):
        prev = f"it{k - 1}"
        ctes.append(f"""it{k} AS MATERIALIZED (
    SELECT source, t, w,
           CASE WHEN capped = 1 THEN 1
                WHEN CAST((SELECT b5 FROM tot)
                          - coalesce((SELECT sum({cap5} * t) FROM {prev}
                                      WHERE capped = 1), 0) AS DOUBLE)
                     * w / (SELECT sum(w) FROM {prev} WHERE capped = 0)
                     >= CAST({cap5} * t AS DOUBLE)
                THEN 1 ELSE 0 END AS capped
    FROM {prev}
)""")
    alloc = (
        f"CASE WHEN capped = 1 THEN CAST({cap5} * t AS DOUBLE) / 5.0 "
        f"ELSE (CAST((SELECT b5 FROM tot) - (SELECT c5 FROM agg) AS DOUBLE)"
        f" * w / (SELECT wu FROM agg)) / 5.0 END"
    )
    ctes.append(f"""agg AS (
    SELECT coalesce(sum(CASE WHEN capped = 1 THEN {cap5} * t END), 0) AS c5,
           sum(CASE WHEN capped = 0 THEN w END) AS wu
    FROM it{iters}
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT source, t AS n_tokens, w AS weight,
       {sql_round(alloc, 6)} AS alloc_tokens,
       {sql_round(f"({alloc}) / t", 6)} AS epochs,
       capped
FROM it{iters}
ORDER BY source
"""


MIXTURE_SQL = _mixture_sql()


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): every document scored by
    the mean hashed-bigram log-likelihood ratio between the `src0` target
    domain and the whole corpus — the data-selection signal importance
    resampling draws against. Part of the beyond-reference LLM-pipeline
    layer; plan shape documented on the operator."""
    docs = read_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    out = C.dsir_importance_weights(
        docs, target, "text", "doc_id", n=2, n_buckets=4096
    )
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        stable_round("weight", 6).alias("weight"),
    )


DSIR_SQL = """
WITH g AS (
    SELECT doc_id, source,
           list_transform(
               range(1, greatest(len({toks}) - 1, 1) + 1),
               i -> {gram_hash}) AS grams
    FROM documents
), rg AS (
    SELECT doc_id, unnest(grams) % 4096 AS b FROM g
), tg AS (
    SELECT unnest(grams) % 4096 AS b FROM g WHERE source = 'src0'
), rc AS (
    SELECT b, count(*) AS rc FROM rg GROUP BY b
), tc AS (
    SELECT b, count(*) AS tc FROM tg GROUP BY b
), tot AS (
    SELECT (SELECT count(*) FROM rg) AS rt, (SELECT count(*) FROM tg) AS tt
), ratio AS (
    SELECT rc.b,
           ln((coalesce(tc.tc, 0) + 1.0) / (tot.tt + 4096.0))
         - ln((rc.rc + 1.0) / (tot.rt + 4096.0)) AS lr
    FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
)
SELECT rg.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       {r} AS weight
FROM rg JOIN ratio USING (b)
GROUP BY rg.doc_id
""".format(
    toks=_TOKS.format(c="text"),
    gram_hash=_sql_hash(
        "array_to_string(" + _TOKS.format(c="text") + "[i : i + 1], ' ')"
    ),
    r=sql_round("avg(lr)", 6),
)


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scores: add-α bigram cross-entropy of every
    document against a model trained on the `src0` reference slice
    (Wenzek et al. 2020). Beyond-reference LLM-pipeline operator; plan
    shape documented on operators.corpus.lm_cross_entropy."""
    docs = read_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == "src0")
    out = C.lm_cross_entropy(docs, ref, "text", "doc_id", alpha=0.5)
    return out.select(
        "doc_id",
        "n_tokens",
        stable_round("cross_entropy", 6).alias("cross_entropy"),
    )


LM_PERPLEXITY_SQL = """
WITH toks AS (
    SELECT doc_id, source, {toks} AS tk FROM documents
), t AS (
    SELECT doc_id, source, tk,
           unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS cur
    FROM toks WHERE len(tk) > 0
), tp AS (
    SELECT doc_id, source, pos, cur,
           CASE WHEN pos > 1 THEN tk[pos - 1] END AS prev
    FROM t
), uni AS (
    SELECT cur AS word, count(*) AS c1 FROM tp WHERE source = 'src0'
    GROUP BY cur
), big AS (
    SELECT prev, cur, count(*) AS c2 FROM tp
    WHERE source = 'src0' AND pos > 1 GROUP BY prev, cur
), scal AS (
    SELECT sum(c1) AS n, count(*) AS v FROM uni
), lp AS (
    SELECT tp.doc_id,
           CASE WHEN tp.pos = 1
                THEN ln((coalesce(uc.c1, 0) + 0.5) / (scal.n + 0.5 * scal.v))
                ELSE ln((coalesce(big.c2, 0) + 0.5)
                        / (coalesce(pc.c1, 0) + 0.5 * scal.v))
           END AS lp
    FROM tp
    LEFT JOIN uni uc ON tp.cur = uc.word
    LEFT JOIN uni pc ON tp.prev = pc.word
    LEFT JOIN big ON tp.prev = big.prev AND tp.cur = big.cur
    CROSS JOIN scal
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {r} AS cross_entropy
FROM lp GROUP BY doc_id
""".format(
    toks=_TOKS.format(c="text"),
    r=sql_round("-sum(lp) / count(*)", 6),
)


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet split step (Wenzek et al. 2020 §4.4): within each
    detected language, documents are assigned to head/middle/tail by
    perplexity TERCILE against the reference-trained LM — head (lowest
    cross-entropy) is the "looks like the reference" slice pretraining
    keeps. Composes the two existing signals (lm_cross_entropy +
    language_id) into the actual pipeline step.

    Scale shape: deliberately WINDOWLESS — a per-language ntile would
    sort near-global partitions (5 languages ⇒ one window holds ~n/5 of
    a 100 TB corpus); instead the tercile BOUNDARIES come from one
    per-language exact-percentile hash agg (5 rows) broadcast back, and
    bucketing is a stateless comparison. Cross-engine float contract:
    both the per-doc cross-entropy and the boundaries are 1e-6-rounded
    before comparison (the calibration-bins lesson), so both engines
    bucket identical doubles against identical thresholds."""
    docs = read_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == "src0")
    ce = C.lm_cross_entropy(docs, ref, "text", "doc_id", alpha=0.5).select(
        "doc_id", stable_round("cross_entropy", 6).alias("ce")
    )
    langs = docs.select("doc_id", X.language_id("text").alias("lang"))
    scored = ce.join(langs, "doc_id")
    bounds = scored.groupBy("lang").agg(
        stable_round(F.percentile("ce", F.lit(1.0 / 3.0)), 6).alias("b1"),
        stable_round(F.percentile("ce", F.lit(2.0 / 3.0)), 6).alias("b2"),
    )
    bucket = (
        F.when(F.col("ce") <= F.col("b1"), F.lit("head"))
        .when(F.col("ce") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(bounds), "lang")
        .select("doc_id", "lang", F.col("ce").alias("cross_entropy"),
                bucket.alias("ppl_bucket"))
        .orderBy("doc_id")
    )


def _ccnet_buckets_sql() -> str:
    toks = _TOKS.format(c="text")
    lang_case = """CASE
                 WHEN {fr} > greatest({es}, {en}, {de}, 0) THEN 'fr'
                 WHEN {es} > greatest({en}, {de}, 0) THEN 'es'
                 WHEN {en} > greatest({de}, 0) THEN 'en'
                 WHEN {de} > 0 THEN 'de'
                 ELSE 'und'
               END""".format(
        en=_sql_stop_hits("en"),
        de=_sql_stop_hits("de"),
        es=_sql_stop_hits("es"),
        fr=_sql_stop_hits("fr"),
    )
    return f"""
WITH tk AS (
    SELECT doc_id, source, {toks} AS tk FROM documents
), t AS (
    SELECT doc_id, source, tk,
           unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS cur
    FROM tk WHERE len(tk) > 0
), tp AS (
    SELECT doc_id, source, pos, cur,
           CASE WHEN pos > 1 THEN tk[pos - 1] END AS prev
    FROM t
), uni AS (
    SELECT cur AS word, count(*) AS c1 FROM tp WHERE source = 'src0'
    GROUP BY cur
), big AS (
    SELECT prev, cur, count(*) AS c2 FROM tp
    WHERE source = 'src0' AND pos > 1 GROUP BY prev, cur
), scal AS (
    SELECT sum(c1) AS n, count(*) AS v FROM uni
), lp AS (
    SELECT tp.doc_id,
           CASE WHEN tp.pos = 1
                THEN ln((coalesce(uc.c1, 0) + 0.5) / (scal.n + 0.5 * scal.v))
                ELSE ln((coalesce(big.c2, 0) + 0.5)
                        / (coalesce(pc.c1, 0) + 0.5 * scal.v))
           END AS lp
    FROM tp
    LEFT JOIN uni uc ON tp.cur = uc.word
    LEFT JOIN uni pc ON tp.prev = pc.word
    LEFT JOIN big ON tp.prev = big.prev AND tp.cur = big.cur
    CROSS JOIN scal
), scored AS (
    SELECT lp.doc_id, {sql_round("-sum(lp.lp) / count(*)", 6)} AS ce
    FROM lp GROUP BY lp.doc_id
), langs AS (
    SELECT doc_id, {lang_case} AS lang FROM documents
), joined AS (
    SELECT s.doc_id, l.lang, s.ce FROM scored s JOIN langs l USING (doc_id)
), bounds AS (
    SELECT lang,
           {sql_round("quantile_cont(ce, 1.0 / 3.0)", 6)} AS b1,
           {sql_round("quantile_cont(ce, 2.0 / 3.0)", 6)} AS b2
    FROM joined GROUP BY lang
)
SELECT j.doc_id, j.lang, j.ce AS cross_entropy,
       CASE WHEN j.ce <= b.b1 THEN 'head'
            WHEN j.ce <= b.b2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM joined j JOIN bounds b USING (lang)
ORDER BY j.doc_id
"""


CCNET_BUCKETS_SQL = _ccnet_buckets_sql()


def collocation_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by PMI (Church & Hanks 1990)
    with the deterministic (pmi DESC, prev, cur) tie-break — TakeOrdered,
    no global sort. Beyond-reference corpus-analysis operator."""
    docs = read_table(spark, sf_dir, "documents")
    out = C.bigram_pmi(docs, "text", min_count=5)
    return (
        out.select(
            "prev", "cur", "pair_count", stable_round("pmi", 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), "prev", "cur")
        .limit(20)
    )


COLLOCATION_SQL = """
WITH toks AS (
    SELECT {toks} AS tk FROM documents
), t AS (
    SELECT tk, unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS cur
    FROM toks WHERE len(tk) > 0
), tp AS (
    SELECT pos, cur, CASE WHEN pos > 1 THEN tk[pos - 1] END AS prev FROM t
), pairs AS (
    SELECT prev, cur, count(*) AS pair_count FROM tp WHERE pos > 1
    GROUP BY prev, cur
), uni AS (
    SELECT cur AS word, count(*) AS c1 FROM tp GROUP BY cur
), scal AS (
    SELECT (SELECT sum(pair_count) FROM pairs) AS n2,
           (SELECT sum(c1) FROM uni) AS n1
)
SELECT p.prev, p.cur, p.pair_count, {r} AS pmi
FROM pairs p
JOIN uni ua ON p.prev = ua.word
JOIN uni ub ON p.cur = ub.word
CROSS JOIN scal
WHERE p.pair_count >= 5
ORDER BY pmi DESC, p.prev, p.cur
LIMIT 20
""".format(
    toks=_TOKS.format(c="text"),
    r=sql_round(
        "ln((p.pair_count / CAST(scal.n2 AS DOUBLE)) / "
        "((ua.c1 / CAST(scal.n1 AS DOUBLE)) * (ub.c1 / CAST(scal.n1 AS DOUBLE))))",
        6,
    ),
)


_BPE_MERGES = 8


def _bpe_parts(n_merges: int) -> str:
    """Shared CTE chain replaying BPE training exactly (operators.tokenizer
    .bpe_learn): v0 = char-split word vocab with corpus counts; per
    iteration, pair counts via zipped parallel unnests, the deterministic
    argmax (cnt DESC, la, rb LIMIT 1), and the greedy left-to-right merge
    as a ``list_reduce`` string-fold over a unit-separator-joined symbol
    string — provably identical to the Spark array-fold (a just-merged
    element never re-triggers because la||rb != la for non-empty rb)."""
    sep = "chr(31)"
    parts = [
        """v0 AS (
    SELECT word, count(*) AS n, string_split(word, '') AS syms
    FROM (SELECT unnest({toks}) AS word FROM documents)
    GROUP BY word
)""".format(toks=_TOKS.format(c="text"))
    ]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        parts.append(
            f"""p{i} AS (
    SELECT la, rb, sum(n) AS cnt FROM (
        SELECT unnest(syms[1:len(syms) - 1]) AS la,
               unnest(syms[2:len(syms)]) AS rb, n
        FROM {prev} WHERE len(syms) >= 2)
    GROUP BY la, rb
), b{i} AS (
    SELECT la, rb, cnt FROM p{i} ORDER BY cnt DESC, la, rb LIMIT 1
), v{i} AS (
    SELECT word, n,
           string_split(list_reduce(syms, (acc, x) -> CASE
               WHEN (acc = b.la OR ends_with(acc, {sep} || b.la))
                    AND x = b.rb
               THEN acc || b.rb
               ELSE acc || {sep} || x END), {sep}) AS syms
    FROM {prev} CROSS JOIN b{i} b
)"""
        )
    return ",\n".join(parts)


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (step, la, rb, merged, cnt) over the corpus
    — distributed tokenizer induction (Sennrich et al. 2016). Beyond-
    reference LLM-pipeline operator; scale story on operators.tokenizer."""
    from ..operators import tokenizer as T

    docs = read_table(spark, sf_dir, "documents")
    merges, _ = T.bpe_learn(docs, "text", n_merges=_BPE_MERGES)
    return merges


BPE_MERGES_SQL = (
    "WITH "
    + _bpe_parts(_BPE_MERGES)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS step, la, rb, la || rb AS merged,"
        f" CAST(cnt AS BIGINT) AS cnt FROM b{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
    + "\nORDER BY step"
)


def bpe_encoded_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword counts under the 8-merge BPE vocab learned on
    the same corpus — the encoder side of tokenizer induction (token
    explode ⋈ vocab hash join, AQE decides the strategy)."""
    from ..operators import tokenizer as T

    docs = read_table(spark, sf_dir, "documents")
    _, vocab = T.bpe_learn(docs, "text", n_merges=_BPE_MERGES)
    return T.encoded_lengths(docs, vocab).orderBy("doc_id")


BPE_ENCODED_SQL = (
    "WITH "
    + _bpe_parts(_BPE_MERGES)
    + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(len(syms)) AS BIGINT) AS n_subwords
FROM (SELECT doc_id, unnest({_TOKS.format(c="text")}) AS word
      FROM documents) t
JOIN v{_BPE_MERGES} USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""
)


def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-event user paths (operators.corpus.event_path_counts):
    lead-window sliding paths built in-row (no per-user arrays), one
    hash agg, TakeOrdered cutoff."""
    ev = read_table(spark, sf_dir, "events")
    return C.event_path_counts(ev, length=3, k=20)


EVENT_PATHS_SQL = """
WITH s AS (
    SELECT event_type AS e1,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n_paths
FROM s WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n_paths DESC, path ASC
LIMIT 20
"""


def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams
    (operators.corpus.event_transition_matrix): keyed lead-window pairs,
    one hash agg, bounded-state broadcast normalizer."""
    ev = read_table(spark, sf_dir, "events")
    out = C.event_transition_matrix(ev)
    return out.select(
        "state",
        "next_state",
        "n_transitions",
        stable_round("prob", 9).alias("prob"),
    ).orderBy("state", "next_state")


TRANSITION_SQL = """
WITH p AS (
    SELECT event_type AS state,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_state
    FROM events
), c AS (
    SELECT state, next_state, CAST(count(*) AS BIGINT) AS n_transitions
    FROM p WHERE next_state IS NOT NULL
    GROUP BY state, next_state
), t AS (
    SELECT state, sum(n_transitions) AS tot FROM c GROUP BY state
)
SELECT c.state AS state, next_state, n_transitions,
       {pr} AS prob
FROM c JOIN t USING (state)
ORDER BY state, next_state
""".format(pr=sql_round("n_transitions / tot", 9))


def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization audit (operators.corpus.winsorize_stats):
    exact p1/p99 bounds as literals, stateless clip map, one agg."""
    ev = read_table(spark, sf_dir, "events")
    out = C.winsorize_stats(ev, "value", 0.01, 0.99)
    return out.select(
        stable_round("lower_bound", 6).alias("lower_bound"),
        stable_round("upper_bound", 6).alias("upper_bound"),
        "n_clipped_low",
        "n_clipped_high",
        "n_rows",
        stable_round("clipped_min", 6).alias("clipped_min"),
        stable_round("clipped_max", 6).alias("clipped_max"),
    )


WINSORIZE_SQL = """
WITH b AS (
    SELECT quantile_cont(value, 0.01) AS lo,
           quantile_cont(value, 0.99) AS hi
    FROM events
)
SELECT {rlo} AS lower_bound, {rhi} AS upper_bound,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_low,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_high,
       CAST(count(*) AS BIGINT) AS n_rows,
       {rmin} AS clipped_min,
       {rmax} AS clipped_max
FROM events CROSS JOIN b
""".format(
    rlo=sql_round("any_value(lo)", 6),
    rhi=sql_round("any_value(hi)", 6),
    rmin=sql_round("min(least(greatest(value, lo), hi))", 6),
    rmax=sql_round("max(least(greatest(value, lo), hi))", 6),
)


_PAIR_MIN_SUPPORT = 50


def token_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori frequent token-pair mining (operators.corpus
    .frequent_item_pairs): items filtered to frequent BEFORE the
    per-document pair explode, pair supports from one map-side-combined
    hash agg."""
    docs = read_table(spark, sf_dir, "documents")
    return C.frequent_item_pairs(
        docs, "text", "doc_id", min_support=_PAIR_MIN_SUPPORT
    )


TOKEN_PAIRS_SQL = f"""
WITH t AS (
    SELECT doc_id, unnest(list_distinct({{toks}})) AS item FROM documents
), freq AS (
    SELECT item FROM t GROUP BY item
    HAVING count(*) >= {_PAIR_MIN_SUPPORT}
), k AS (
    SELECT doc_id, item FROM t JOIN freq USING (item)
)
SELECT a.item AS item_a, b.item AS item_b,
       CAST(count(*) AS BIGINT) AS pair_support
FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.item < b.item
GROUP BY 1, 2
HAVING count(*) >= {_PAIR_MIN_SUPPORT}
""".format(toks=_TOKS.format(c="text"))


def token_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics over the A-Priori frequent pairs
    (corpus.association_rules): confidence both directions + lift with
    the document-probability base-rate correction; deterministic
    (lift desc, pair) top-25 cutoff."""
    docs = read_table(spark, sf_dir, "documents")
    return C.association_rules(
        docs, "text", "doc_id", min_support=_PAIR_MIN_SUPPORT, top_k=25
    )


ASSOCIATION_SQL = """
WITH t AS (
    SELECT doc_id, unnest(list_distinct({toks})) AS item FROM documents
), item_df AS (
    SELECT item, CAST(count(*) AS BIGINT) AS n_docs FROM t GROUP BY item
), freq AS (
    SELECT item FROM item_df WHERE n_docs >= {minsup}
), k AS (
    SELECT doc_id, item FROM t JOIN freq USING (item)
), pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(count(*) AS BIGINT) AS pair_support
    FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.item < b.item
    GROUP BY 1, 2
    HAVING count(*) >= {minsup}
), n_tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT item_a, item_b, pair_support,
       da.n_docs AS supp_a, db.n_docs AS supp_b,
       {conf_ab} AS confidence_ab,
       {conf_ba} AS confidence_ba,
       {lift} AS lift
FROM pairs
JOIN item_df da ON da.item = item_a
JOIN item_df db ON db.item = item_b
CROSS JOIN n_tot
ORDER BY lift DESC, item_a ASC, item_b ASC
LIMIT 25
""".format(
    toks="{toks}",
    minsup="{minsup}",
    conf_ab=sql_round("CAST(pair_support AS DOUBLE) / da.n_docs", 6),
    conf_ba=sql_round("CAST(pair_support AS DOUBLE) / db.n_docs", 6),
    lift=sql_round(
        "pair_support * n / (CAST(da.n_docs AS DOUBLE) * db.n_docs)", 6
    ),
).format(toks=_TOKS.format(c="text"), minsup=_PAIR_MIN_SUPPORT)


_BM25_TERMS = ["hash", "join", "spark", "vector"]
_BM25_K = 25


def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval over documents for a 4-term probe
    query (operators.corpus.bm25_topk): query-term filter pushed below
    the postings agg, broadcast df/N/avgdl attaches, TakeOrdered top-k."""
    docs = read_table(spark, sf_dir, "documents")
    return C.bm25_topk(docs, _BM25_TERMS, "text", "doc_id", k=_BM25_K)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
BM25_SQL = f"""
WITH dl AS (
    SELECT doc_id, CAST(len({{toks}}) AS DOUBLE) AS dl FROM documents
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
), postings AS (
    SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
    FROM (SELECT doc_id, unnest({{toks}}) AS term FROM documents)
    WHERE term IN ({_BM25_TERMS_SQL})
    GROUP BY doc_id, term
), df_ AS (
    SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY term
)
SELECT doc_id,
       {{r}} AS score,
       CAST(count(*) AS BIGINT) AS n_matched_terms
FROM postings JOIN df_ USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {_BM25_K}
""".format(
    toks="{toks}",
    r=sql_round(
        f"""sum(
        ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * ({C.BM25_K1} + 1)
        / (tf + {C.BM25_K1} * (1 - {C.BM25_B} + {C.BM25_B} * dl / avgdl)))""",
        6,
    ),
).format(toks=_TOKS.format(c="text"))


# --- token-distribution statistics: JS drift, chi-square association --------


def source_token_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between src0's and src1's unigram token
    distributions (corpus.token_js_divergence) — the vocabulary-drift
    statistic for the data-mixing dashboards: one term-keyed hash agg
    with conditional per-side sums, a 1-row totals attach, a scalar agg."""
    docs = read_table(spark, sf_dir, "documents")
    return C.token_js_divergence(docs, "source", "src0", "src1", "text")


SOURCE_TOKEN_JS_SQL = """
WITH terms AS (
    SELECT source AS lab, unnest({toks}) AS term
    FROM documents WHERE source IN ('src0', 'src1')
), counts AS (
    SELECT term,
           sum(CASE WHEN lab = 'src0' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN lab = 'src1' THEN 1 ELSE 0 END) AS cb
    FROM terms GROUP BY term
), tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM counts)
SELECT {js} AS js_divergence,
       CAST(count(CASE WHEN ca > 0 THEN 1 END) AS BIGINT) AS n_terms_a,
       CAST(count(CASE WHEN cb > 0 THEN 1 END) AS BIGINT) AS n_terms_b,
       CAST(sum(ca) AS BIGINT) AS tokens_a,
       CAST(sum(cb) AS BIGINT) AS tokens_b
FROM counts, tot
""".format(
    toks="{toks}",
    js=sql_round(
        """sum(0.5 * (
        CASE WHEN ca > 0 THEN (ca / ta)
             * log2((ca / ta) / (((ca / ta) + (cb / tb)) / 2)) ELSE 0 END
      + CASE WHEN cb > 0 THEN (cb / tb)
             * log2((cb / tb) / (((ca / ta) + (cb / tb)) / 2)) ELSE 0 END))""",
        6,
    ),
).format(toks=_TOKS.format(c="text"))


def token_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token↔source feature scoring (corpus.token_label_chi2):
    top-25 terms whose document presence is most associated with the
    source label. The 2×L contingency statistic reads off the observed
    (term, label) doc-count table via the telescoped closed form — the
    absent row and zero cells never materialize."""
    docs = read_table(spark, sf_dir, "documents")
    return C.token_label_chi2(docs, "source", "text", "doc_id", top_k=25)


TOKEN_CHI2_SQL = """
WITH n_tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
pres AS (
    SELECT source AS lab, doc_id, unnest(list_distinct({toks})) AS term
    FROM documents
), ntl AS (
    SELECT term, lab, CAST(count(*) AS DOUBLE) AS ntl
    FROM pres GROUP BY term, lab
), nl AS (
    SELECT source AS lab, CAST(count(*) AS DOUBLE) AS nl
    FROM documents GROUP BY source
), per_term AS (
    SELECT term,
           sum(ntl.ntl * ntl.ntl / nl.nl) AS s1,
           sum(((nl.nl - ntl.ntl) * (nl.nl - ntl.ntl) - nl.nl * nl.nl)
               / nl.nl) AS s2,
           sum(ntl.ntl) AS nt
    FROM ntl JOIN nl USING (lab) GROUP BY term
)
SELECT term, CAST(nt AS BIGINT) AS n_docs, {chi2} AS chi2
FROM per_term, n_tot
ORDER BY chi2 DESC, term ASC
LIMIT 25
""".format(
    toks="{toks}",
    chi2=sql_round(
        """(n * s1 / nt - nt)
        + CASE WHEN nt < n
               THEN n * s2 / (n - nt) + n * n / (n - nt) - (n - nt)
               ELSE 0 END""",
        4,
    ),
).format(toks=_TOKS.format(c="text"))


def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the token frequency distribution: OLS slope of
    log(frequency) on log(rank) over the ranked vocabulary (natural
    corpora land near −1; synthetic or templated text drifts shallow —
    a one-number corpus-naturalness diagnostic pairing with the
    Heaps-law growth curve). One hash agg to the vocab table, then the
    scale-safe global rank (range exchange + Arrow pass — a web-scale
    vocabulary never funnels through one window task; ties broken by
    term for determinism), one regr_slope/regr_r2 aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = C.global_rank(
        counts.withColumn("__negn", -F.col("n")), ["__negn", "term"],
        rank_col="r",
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        stable_round(F.regr_slope(y, x), 6).alias("zipf_slope"),
        stable_round(F.regr_r2(y, x), 6).alias("r2"),
    )


VOCAB_ZIPF_SQL = """
WITH counts AS (
    SELECT term, count(*) AS n
    FROM (SELECT unnest({toks}) AS term FROM documents)
    GROUP BY term
), ranked AS (
    SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS r
    FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       {slope} AS zipf_slope,
       {r2} AS r2
FROM ranked
""".format(
    toks="{toks}",
    slope=sql_round("regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE)))", 6),
    r2=sql_round("regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(r AS DOUBLE)))", 6),
).format(toks=_TOKS.format(c="text"))


_UNIGRAM_V, _UNIGRAM_ROUNDS = 48, 3


def unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (operators.tokenizer.unigram_learn,
    SentencePiece family): substring-seeded vocabulary shrunk by hard-EM
    rounds — each round ONE Arrow Viterbi pass over the distinct-word
    table with the bounded piece table in the closure. The float EM's DP
    is not SQL-expressible, but since round 13 the oracle is no longer
    rows-only: `_unigram_vocab_sql` replays the ENTIRE derivation as an
    independent single-node implementation (duckdb word counts → seed →
    hard-EM rounds → final cut, sharing only `_viterbi`'s deterministic
    tie-break spec) and emits the result as a VALUES table — the
    distributed trainer must hash-match a from-scratch replica on the
    gate corpus, the `adjugate_exprs` one-spec-two-engines contract."""
    from ..operators import tokenizer as TK

    docs = read_table(spark, sf_dir, "documents")
    return TK.unigram_learn(
        docs, vocab_size=_UNIGRAM_V, n_rounds=_UNIGRAM_ROUNDS
    )


def unigram_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc subword counts under the learned unigram vocabulary
    (operators.tokenizer.unigram_encoded_lengths): the DP runs once per
    DISTINCT word; documents encode via an equi-join onto that map.
    Hash-checked since round 13: `_unigram_doclen_sql` splices the
    replica's word → piece-count map as a VALUES table and re-derives
    the per-doc totals from the documents VIEW in SQL (tokenize → join
    → per-doc sum), so only the bounded DP dictionary comes from the
    replica while the corpus-scale arithmetic is independent SQL."""
    from ..operators import tokenizer as TK

    docs = read_table(spark, sf_dir, "documents")
    pieces = [
        (r["piece"], r["prob"])
        for r in TK.unigram_learn(
            docs, vocab_size=_UNIGRAM_V, n_rounds=_UNIGRAM_ROUNDS
        ).collect()
    ]
    return TK.unigram_encoded_lengths(docs, pieces)


_UNIGRAM_CACHE: dict = {}


def _unigram_replica() -> tuple[list, dict] | None:
    """Pure-Python replay of the unigram hard-EM derivation on the GATE's
    documents table (VERDICT r12 §Next #6 — the last rows-only pair gets
    a hash-checked companion). A genuinely independent second
    implementation of the documented spec — duckdb word counts → capped
    substring seed → add-½ char-pinned normalize → `_UNIGRAM_ROUNDS`
    hard-EM rounds → final cut — sharing only `_viterbi` (the
    deterministic DP tie-break) with the distributed trainer, the
    mlfit `adjugate_exprs` one-spec-two-engines precedent. Returns
    (vocab_rows [(piece, prob_raw, rank)], word→n_pieces dict under the
    ROUNDED final probs, exactly what `unigram_doc_lengths` encodes
    with), or None off-fixture. Cached on (path, mtime): the driver
    calls oracle_sql() once but both oracles share one derivation."""
    import math
    import os
    from collections import Counter

    from ..operators.tokenizer import UNIGRAM_MAX_PIECE_LEN, _viterbi

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        return None
    key = (path, os.path.getmtime(path))
    if key in _UNIGRAM_CACHE:
        return _UNIGRAM_CACHE[key]
    import duckdb as _dd

    toks = _TOKS.format(c="text")
    words = dict(
        _dd.sql(
            f"SELECT t.w, count(*) FROM (SELECT unnest({toks}) AS w "
            f"FROM read_parquet('{path}')) t GROUP BY 1"
        ).fetchall()
    )
    vocab_size, max_len = _UNIGRAM_V, UNIGRAM_MAX_PIECE_LEN
    subs: Counter = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                subs[w[i : i + ln]] += n
    chars = {p: c for p, c in subs.items() if len(p) == 1}
    n_seed = max(vocab_size * 4 - len(chars), 0)
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:n_seed]
    weights = {**chars, **dict(multi)}

    def normalize(usage: dict) -> dict:
        kept = {
            p: u + (0.5 if len(p) == 1 else 0.0)
            for p, u in usage.items()
            if u > 0 or len(p) == 1
        }
        for c in chars:
            kept.setdefault(c, 0.5)
        total = sum(kept.values())
        return {p: math.log(u / total) for p, u in kept.items()}

    logp = normalize(weights)
    for _ in range(_UNIGRAM_ROUNDS):
        usage: Counter = Counter()
        for w, n in words.items():
            for p in _viterbi(w, logp, max_len):
                usage[p] += n
        logp = normalize(usage)
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    final = [p for p, _ in ranked[: max(vocab_size, len(chars))]]
    keep = set(final) | set(chars)
    total = sum(math.exp(logp[p]) for p in keep)
    rows = sorted(
        ((p, math.exp(logp[p]) / total) for p in keep),
        key=lambda kv: (-kv[1], kv[0]),
    )
    vocab_rows = [(p, pr, i + 1) for i, (p, pr) in enumerate(rows)]
    # unigram_doc_lengths encodes with the ROUNDED collected probs —
    # replicate stable_round's shifted HALF-even-proof rounding exactly
    logp_enc = {
        p: math.log(round(pr - 1e-9, 8) + 0.0) for p, pr, _ in vocab_rows
    }
    word_pieces = {
        w: len(_viterbi(w, logp_enc, max_len)) for w in words
    }
    out = (vocab_rows, word_pieces)
    _UNIGRAM_CACHE[key] = out
    return out


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _unigram_vocab_sql() -> str | None:
    """Lazy oracle twin of `unigram_vocab` (see `_unigram_replica`)."""
    rep = _unigram_replica()
    if rep is None:
        return None
    vocab_rows, _ = rep
    values = ",\n".join(
        f"({_sql_str(p)}, {pr!r}, {rk})" for p, pr, rk in vocab_rows
    )
    r = sql_round("prob", 8)
    return f"""
SELECT piece, {r} AS prob, CAST(rank AS BIGINT) AS rank
FROM (VALUES {values}) AS t(piece, prob, rank)
ORDER BY rank
"""


def _unigram_doclen_sql() -> str | None:
    """Lazy oracle twin of `unigram_doc_lengths`: the replica supplies
    only the bounded word → piece-count DP dictionary; tokenization,
    the join, and the per-doc totals run in SQL over the gate's
    documents view."""
    rep = _unigram_replica()
    if rep is None:
        return None
    _, word_pieces = rep
    values = ",\n".join(
        f"({_sql_str(w)}, {n})" for w, n in sorted(word_pieces.items())
    )
    toks = _TOKS.format(c="text")
    return f"""
WITH wl(word, n_pieces) AS (VALUES {values}),
tk AS (SELECT doc_id, unnest({toks}) AS word FROM documents)
SELECT doc_id, CAST(sum(wl.n_pieces) AS BIGINT) AS n_pieces
FROM tk JOIN wl USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve (corpus.vocab_growth): cumulative
    vocab vs cumulative tokens at 10 equal-document checkpoints in doc-id
    order. Checkpoints come from the scale-safe global NTILE; the only
    window runs over the aggregated 10-row frame."""
    docs = read_table(spark, sf_dir, "documents")
    return C.vocab_growth(docs, "text", "doc_id", n_checkpoints=10)


VOCAB_GROWTH_SQL = """
WITH b AS (
    SELECT doc_id, {toks} AS tk,
           ntile(10) OVER (ORDER BY doc_id) AS cp
    FROM documents
), per_bucket AS (
    SELECT cp, count(*) AS docs, sum(len(tk)) AS tokens
    FROM b GROUP BY cp
), first_doc AS (
    SELECT term, min(doc_id) AS fd
    FROM (SELECT doc_id, unnest(tk) AS term FROM b) GROUP BY term
), newt AS (
    SELECT b.cp, count(*) AS nt
    FROM first_doc JOIN b ON b.doc_id = first_doc.fd GROUP BY b.cp
)
SELECT cp AS checkpoint,
       CAST(sum(docs) OVER w AS BIGINT) AS n_docs,
       CAST(sum(tokens) OVER w AS BIGINT) AS n_tokens,
       CAST(sum(coalesce(nt, 0)) OVER w AS BIGINT) AS vocab_size
FROM per_bucket LEFT JOIN newt USING (cp)
WINDOW w AS (ORDER BY cp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY checkpoint
""".format(toks=_TOKS.format(c="text"))


QUERIES: dict[str, tuple] = {
    "vocab_zipf_fit": (vocab_zipf_fit, VOCAB_ZIPF_SQL),
    "unigram_vocab": (unigram_vocab, _unigram_vocab_sql),
    "unigram_doc_lengths": (unigram_doc_lengths, _unigram_doclen_sql),
    "corpus_vocab_growth": (corpus_vocab_growth, VOCAB_GROWTH_SQL),
    "source_token_js": (source_token_js, SOURCE_TOKEN_JS_SQL),
    "token_source_chi2": (token_source_chi2, TOKEN_CHI2_SQL),
    "bm25_search_topk": (bm25_search_topk, BM25_SQL),
    "token_pair_mining": (token_pair_mining, TOKEN_PAIRS_SQL),
    "token_association_rules": (token_association_rules, ASSOCIATION_SQL),
    "user_event_paths": (user_event_paths, EVENT_PATHS_SQL),
    "event_transition_probs": (event_transition_probs, TRANSITION_SQL),
    "events_value_winsorized": (events_value_winsorized, WINSORIZE_SQL),
    "doc_lm_perplexity": (doc_lm_perplexity, LM_PERPLEXITY_SQL),
    "collocation_pmi_topk": (collocation_pmi_topk, COLLOCATION_SQL),
    "bpe_merges": (bpe_merges, BPE_MERGES_SQL),
    "bpe_encoded_lengths": (bpe_encoded_lengths, BPE_ENCODED_SQL),
    "vocab_heavy_hitters": (vocab_heavy_hitters, HEAVY_HITTERS_SQL),
    "dsir_importance": (dsir_importance, DSIR_SQL),
    "doc_nb_quality": (doc_nb_quality, NB_QUALITY_SQL),
    "doc_logreg_quality": (doc_logreg_quality, LOGREG_QUALITY_SQL),
    "doc_quality_ols": (doc_quality_ols, QUALITY_OLS_SQL),
    "doc_classifier_auc": (doc_classifier_auc, CLASSIFIER_AUC_SQL),
    "doc_calibration_bins": (doc_calibration_bins, CALIBRATION_BINS_SQL),
    "doc_calibration_ece": (doc_calibration_ece, CALIBRATION_ECE_SQL),
    "doc_gopher_rules": (doc_gopher_rules, GOPHER_RULES_SQL),
    "ccnet_perplexity_buckets": (ccnet_perplexity_buckets, CCNET_BUCKETS_SQL),
    "doc_logreg_quality_d4": (doc_logreg_quality_d4, LOGREG_QUALITY_D4_SQL),
    "doc_logreg_quality_d5": (doc_logreg_quality_d5, LOGREG_QUALITY_D5_SQL),
    "doc_quality_ols_d4": (doc_quality_ols_d4, QUALITY_OLS_D4_SQL),
    "source_mixture_plan": (source_mixture_plan, MIXTURE_SQL),
    "split_leakage_pairs": (split_leakage_pairs, _split_leakage_sql()),
    "leakage_safe_splits": (leakage_safe_splits, _leakage_safe_splits_sql()),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "tfidf_top_terms": (tfidf_top_terms, TFIDF_SQL),
    "corpus_split_summary": (corpus_split_summary, SPLIT_SUMMARY_SQL),
    "source_quota_sample": (source_quota_sample, SOURCE_QUOTA_SQL),
    "weighted_source_sample": (weighted_source_sample, WEIGHTED_SAMPLE_SQL),
    "doc_chunks": (doc_chunks, DOC_CHUNKS_SQL),
    "contamination_check": (contamination_check, CONTAMINATION_SQL),
    "source_temperature_mix": (source_temperature_mix, TEMPERATURE_MIX_SQL),
    "corpus_shuffle_sample": (corpus_shuffle_sample, CORPUS_SHUFFLE_SQL),
    "chunk_packing": (chunk_packing, CHUNK_PACKING_SQL),
    "pii_scrub_check": (pii_scrub_check, PII_SCRUB_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_funnel_windowed": (
        events_funnel_windowed,
        EVENTS_FUNNEL_WINDOWED_SQL,
    ),
}
