"""Corpus-construction operators for LLM training-data pipelines.

The reference engine stops at per-date adjustment analytics; a pretraining
corpus additionally needs dataset splitting, per-source quotas, relevance
scoring, chunking, and train/eval decontamination. Everything here is pure
DataFrame composition over the text primitives in :mod:`operators.text` —
no Python in the row path — and each has an exact DuckDB oracle twin in
``plans/corpus_queries.py``.

Scale notes per operator are inline; the common theme is that every step is
either a stateless per-row map (chunking, split assignment) or a shuffle on
a well-distributed key (term, gram hash, user id) — nothing quadratic and
nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from .text import let, shingle_hashes_in, string_hash, tokens

SPLIT_BUCKETS = 1000
TRAIN_UPPER = 900  # buckets [0, 900) → train
VAL_UPPER = 950  # buckets [900, 950) → val; [950, 1000) → test


def split_bucket(id_col: Column | str, n_buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic split bucket: polynomial hash of the stringified id,
    Fibonacci-mixed, then ranged to ``n_buckets``. Hash-based (not random)
    so the assignment is stable across runs, engines, and repartitions —
    the property a train/val/test split must have.

    The multiplicative mixing step matters: the polynomial hash alone maps
    consecutive ids to consecutive values (the last character dominates),
    so ``% n_buckets`` yields runs, and small-id corpora can leave whole
    splits empty. ``(h·2654435761 mod 2³²)·n // 2³²`` (Knuth's golden-ratio
    multiplier, take the high bits) spreads consecutive hashes ~0.618·n
    buckets apart. All steps stay under 2⁶³ and are exact in int64 — the
    DuckDB oracle mirrors them verbatim. Stateless per-row map; no shuffle.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = (string_hash(c.cast("string")) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    return F.floor((mixed * n_buckets) / F.lit(4294967296)).cast("long")


def assign_split(
    df: DataFrame,
    id_col: str,
    train_upper: int = TRAIN_UPPER,
    val_upper: int = VAL_UPPER,
) -> DataFrame:
    """Adds a ``split`` column (train/val/test) by hash bucket thresholds
    (default 90/5/5)."""
    b = split_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_upper, F.lit("train"))
        .when(b < val_upper, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = raw term count in the document; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed scikit-style variant — never zero, defined for unseen terms).

    Plan at scale: explode → hash-agg on (doc, term) → second hash-agg on
    term for document frequency → shuffled equi-join back on term (vocab
    can exceed broadcast at corpus scale, so no broadcast hint — AQE
    promotes it when small) → per-doc window for the top-k. Both shuffle
    keys (term, doc) are high-cardinality and well distributed; partial
    aggregation halves the explode volume before either exchange. N is a
    1-row agg crossJoined broadcast (no driver collect, stays lazy).
    """
    terms = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("__n_docs") + 1) / (F.col("doc_freq") + 1))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf", "rank")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson et al., TREC-3): the top-``k``
    documents for a bag-of-terms query — the relevance-scoring step of a
    quality-targeted corpus subselect ("find the docs most like this
    probe") and the classic full-text-search primitive.

    idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))
    score(d) = Σ_t idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Plan at scale: the query-term filter is pushed BELOW the (doc, term)
    hash-agg, so only postings for the |Q| query terms survive the
    explode stage — the corpus-wide term space is never shuffled. df
    comes from those same postings (one tiny agg, ≤ |Q| rows,
    broadcast); N/avgdl is a 1-row agg crossJoined broadcast (the
    documented scalar-attach idiom, no driver collect). Doc length
    attaches by an equi-join on the id (AQE promotes the postings side
    when small). The final top-k is orderBy+limit = TakeOrderedAndProject
    — per-partition heaps, never a single-partition sort. Ties break on
    the ROUNDED score (6 dp) then id, so the cutoff is deterministic and
    engine-independent.
    """
    toks = tokens(text_col)
    dl = docs.select(
        F.col(id_col), F.size(toks).cast("double").alias("__dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    postings = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_ = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    from ..functions.rounding import stable_round

    scored = (
        postings.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__c",
            F.log(
                1
                + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            )
            * F.col("__tf")
            * (k1 + 1)
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            stable_round(F.sum("__c"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def source_quota_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 10,
) -> DataFrame:
    """Caps each source at ``quota`` documents, keeping the lowest ids
    (deterministic; swap the ordering column for a quality score to keep
    the best instead).

    Scale: one shuffle on source + per-source window. A pathological
    heavy-hitter source serializes its partition through one reducer; for
    that shape, pre-filter with a per-source ``approx_count_distinct``
    pass and hash-sample down to ~quota·oversample rows per source before
    ranking, which bounds any partition at oversample·quota rows.
    """
    w = Window.partitionBy(source_col).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .drop("rn")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Splits documents into overlapping fixed-size token chunks — the
    standard context-window packing step before tokenization.

    Output: one row per chunk with ``chunk_idx``, ``chunk_text``,
    ``n_tokens``. A document shorter than one chunk yields exactly one
    chunk (possibly empty for a blank document, preserving doc count).

    Stateless per-row explode (no shuffle); the token array is let-bound so
    the document is tokenized once, not once per chunk (see text.let).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap

    def body(t: Column) -> Column:
        starts = F.sequence(
            F.lit(1),
            F.greatest(F.size(t) - overlap, F.lit(1)),
            F.lit(step),
        )
        return F.transform(
            starts,
            lambda i: F.struct(
                F.array_join(F.slice(t, i, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
                F.size(F.slice(t, i, chunk_tokens)).alias("n_tokens"),
            ),
        )

    chunks = let(tokens(text_col), body)
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").cast("long").alias("n_tokens"),
    )


def ngram_contamination(
    train: DataFrame,
    eval_: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Train/eval decontamination check: for each eval document, how many
    of its distinct word ``n``-grams also occur anywhere in the training
    corpus.

    Output: ``(id, n_grams, n_shared, contamination)`` for every eval doc.

    Plan at scale — the reason this is NOT an all-pairs document join: both
    sides explode to distinct ``(gram_hash)`` rows, the train side is
    deduplicated to a gram set, and the match is one equi-join on the hash
    (well-distributed key) followed by a per-doc count. Linear in corpus
    size; the train gram set shuffles once and can be bucketed/persisted
    and reused across eval sets.
    """
    eval_grams = eval_.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingle_hashes_in(tokens(text_col), n))
        ).alias("gh"),
    )
    train_grams = (
        train.select(
            F.explode(
                F.array_distinct(shingle_hashes_in(tokens(text_col), n))
            ).alias("gh")
        )
        .distinct()
    )
    totals = eval_.select(
        F.col(id_col),
        F.size(F.array_distinct(shingle_hashes_in(tokens(text_col), n))).alias(
            "n_grams"
        ),
    )
    hits = (
        eval_grams.join(train_grams, "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .withColumn(
            "contamination",
            F.col("n_shared") / F.greatest(F.col("n_grams"), F.lit(1)),
        )
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by the mean hashed-n-gram log-likelihood ratio between the target
    corpus' distribution and the raw corpus' distribution — high weight =
    "looks like the target domain". The standard use is resampling the raw
    corpus proportionally to these weights.

    Model: both sides are bags of hashed word n-grams over ``n_buckets``
    buckets with add-one smoothing, P(b) = (count_b + 1)/(total + B);
    weight(doc) = mean over its gram occurrences of
    log P_target(bucket) − log P_raw(bucket).

    Plan at scale: two global bucket-count aggregations (map-side
    combinable, output bounded by ``n_buckets``), scalar totals attached
    as 1-row broadcast aggregates, then one equi-join of the exploded raw
    grams against the bounded ratio table and a per-doc average — linear
    in corpus size, never doc×doc, and the ratio table is reusable across
    scoring runs. Output: ``(id, n_grams, weight)``.
    """
    def grams(df: DataFrame, *cols: Column) -> DataFrame:
        return df.select(
            *cols,
            F.explode(shingle_hashes_in(tokens(text_col), n)).alias("__gh"),
        ).withColumn("__b", F.pmod(F.col("__gh"), F.lit(n_buckets)))

    raw_grams = grams(raw, F.col(id_col))
    # the count tables are persisted: each is ≤ n_buckets rows, but each
    # feeds TWO consumers (the ratio join and its scalar total), and
    # without the persist Catalyst re-derives the full tokenize+explode
    # corpus scan per consumer — measured 5 parquet scans instead of the
    # intended 3 (raw counts, raw final join, target counts)
    tgt_counts = (
        grams(target).groupBy("__b").agg(F.count(F.lit(1)).alias("__tc"))
    ).persist()
    raw_counts = (
        raw_grams.groupBy("__b").agg(F.count(F.lit(1)).alias("__rc"))
    ).persist()
    # scalar totals roll up from the bounded persisted count tables (no
    # extra corpus scan); attached as 1-row broadcast aggregates — the
    # repo's accepted scalar-attach pattern. The ratio table stays
    # ≤ n_buckets rows.
    ratio = (
        raw_counts.join(tgt_counts, "__b", "left")
        .withColumn("__tc", F.coalesce("__tc", F.lit(0)))
        .crossJoin(F.broadcast(raw_counts.agg(F.sum("__rc").alias("__rt"))))
        .crossJoin(F.broadcast(tgt_counts.agg(F.sum("__tc").alias("__tt"))))
        .select(
            "__b",
            (
                F.log(
                    (F.col("__tc") + F.lit(1.0))
                    / (F.col("__tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("__rc") + F.lit(1.0))
                    / (F.col("__rt") + F.lit(float(n_buckets)))
                )
            ).alias("__lr"),
        )
    )
    return (
        raw_grams.join(ratio, "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.avg("__lr").alias("weight"),
        )
    )


def nb_quality_scores(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained AND scored on the
    cluster — the model-based quality-filter shape where the classifier
    itself is fit from (pseudo-)labels at corpus scale (FineWeb-Edu's
    teacher-label recipe; fastText's supervised mode is the same bag-of-
    tokens log-linear family).

    Training is ONE conditional aggregation: explode train tokens →
    per-token class counts (n1, n0) — a vocab-bounded table. Class
    totals, vocab size, and document priors attach as 1-row broadcast
    aggregates. Scoring left-joins the exploded score tokens against the
    count table (unseen tokens coalesce to 0 and fall through the same
    add-alpha smoothing), sums per-occurrence log-likelihood ratios per
    doc, and adds the log-prior ratio; zero-token docs score exactly the
    prior. Nothing scales beyond token volume: no Python, no window, one
    shuffle per aggregation, and the count table broadcasts while vocab
    stays under the threshold.

    Output: (id, n_tokens, nb_score) where nb_score > 0 ⇔ the positive
    class is more likely. Deterministic given the inputs; the DuckDB
    oracle replays counts, smoothing, and the per-doc sum verbatim.
    """
    a = float(alpha)
    t_toks = train.select(
        F.col(label_col).alias("__y"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    counts = t_toks.groupBy("__tok").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("__n1"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("__n0"),
    )
    # totals aliases must not collide case-insensitively with the
    # per-token __n1/__n0 (Spark resolution is case-insensitive)
    totals = counts.agg(
        F.sum("__n1").alias("__tot1"),
        F.sum("__n0").alias("__tot0"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    priors = train.agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("__D1"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("__D0"),
    )
    prior_lr = F.log(
        (F.col("__D1") + F.lit(a)) / (F.col("__D0") + F.lit(a))
    )
    llr = F.log(
        (F.coalesce(F.col("__n1"), F.lit(0)) + F.lit(a))
        / (F.col("__tot1") + F.lit(a) * F.col("__vocab"))
    ) - F.log(
        (F.coalesce(F.col("__n0"), F.lit(0)) + F.lit(a))
        / (F.col("__tot0") + F.lit(a) * F.col("__vocab"))
    )
    s_toks = score.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    )
    sums = (
        s_toks.join(counts, "__tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), llr.alias("__llr"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__llr").alias("__s"),
        )
    )
    return (
        score.select(id_col)
        .join(sums, id_col, "left")
        .crossJoin(F.broadcast(priors))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            (F.coalesce(F.col("__s"), F.lit(0.0)) + prior_lr).alias(
                "nb_score"
            ),
        )
    )


def nb_quality_sql(
    label_expr: str,
    alpha: float = 1.0,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    toks_expr: str,
) -> str:
    """DuckDB twin of ``nb_quality_scores`` with train = score = ``table``
    and the (pseudo-)label given as a boolean SQL expression over the
    table's columns."""
    a = float(alpha)
    return f"""
WITH lab AS (
    SELECT {id_col}, {toks_expr} AS toks, ({label_expr}) AS y FROM {table}
), t_toks AS (
    SELECT y, unnest(toks) AS tok FROM lab
), counts AS (
    SELECT tok,
           sum(CASE WHEN y THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN y THEN 0 ELSE 1 END) AS n0
    FROM t_toks GROUP BY tok
), totals AS (
    SELECT sum(n1) AS N1, sum(n0) AS N0, count(*) AS V FROM counts
), priors AS (
    SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS D1,
           sum(CASE WHEN y THEN 0 ELSE 1 END) AS D0
    FROM lab
), s_toks AS (
    SELECT {id_col}, unnest(toks) AS tok FROM lab
), sums AS (
    SELECT s.{id_col}, count(*) AS n_tokens,
           sum(ln((coalesce(c.n1, 0) + {a}) / (t.N1 + {a} * t.V))
               - ln((coalesce(c.n0, 0) + {a}) / (t.N0 + {a} * t.V))) AS s
    FROM s_toks s LEFT JOIN counts c USING (tok) CROSS JOIN totals t
    GROUP BY s.{id_col}
)
SELECT lab.{id_col},
       coalesce(sums.n_tokens, 0) AS n_tokens,
       coalesce(sums.s, 0.0)
           + ln((p.D1 + {a}) / (p.D0 + {a})) AS nb_score
FROM lab LEFT JOIN sums USING ({id_col}) CROSS JOIN priors p
"""


def _token_positions(df: DataFrame, text_col: str, *keep: Column) -> DataFrame:
    """Explode ``text_col`` into ``(keep..., pos, prev, cur)`` rows —
    1-based positions, ``prev`` NULL at pos 1, zero-token docs drop out.

    The token array is let-bound (text.let) so the document is tokenized
    ONCE, not once per position; the ``size > 0`` guard matters because
    Spark's ``sequence(1, 0)`` is DESCENDING, not empty."""
    pairs = let(
        tokens(text_col),
        lambda tk: F.when(
            F.size(tk) > 0,
            F.transform(
                F.sequence(F.lit(1), F.size(tk)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.element_at(tk, i).alias("cur"),
                    F.when(i > 1, F.element_at(tk, i - 1)).alias("prev"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,cur:string,prev:string>>")),
    )
    return df.select(*keep, F.explode(pairs).alias("__t")).select(
        *keep, "__t.*"
    )


def lm_cross_entropy(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document cross-entropy under an add-α smoothed bigram language
    model trained on ``ref_docs`` — the CCNet-family quality signal
    (Wenzek et al. 2020 score documents by LM perplexity against a clean
    reference corpus; low cross-entropy = "looks like the reference").

    Model over the reference vocabulary V (distinct reference unigrams,
    N total tokens):  P(w₁) = (c₁(w₁)+α)/(N+αV),
    P(wᵢ|wᵢ₋₁) = (c₂(wᵢ₋₁,wᵢ)+α)/(c₁(wᵢ₋₁)+αV); out-of-vocabulary
    words fall through to the α mass via coalesce(·, 0). Output:
    ``(id, n_tokens, cross_entropy)`` with cross_entropy =
    −(ln P(w₁) + Σ ln P(wᵢ|wᵢ₋₁)) / n_tokens.

    Plan at scale: two bounded count tables over the reference (unigram,
    bigram — map-side-combinable hash aggs, persisted because each feeds
    two consumers), scalar N/V attached as a 1-row broadcast aggregate,
    then three equi-joins of the exploded corpus positions against the
    count tables and one per-doc aggregation. Linear in corpus size,
    never doc×doc; the model tables are reusable across scoring runs.
    """
    uni = (
        ref_docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist()
    )
    big = _token_positions(ref_docs, text_col).where(F.col("pos") > 1).groupBy(
        "prev", "cur"
    ).agg(F.count(F.lit(1)).alias("c2"))
    scal = uni.agg(
        F.sum("c1").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    t = _token_positions(docs, text_col, F.col(id_col))
    a = F.lit(float(alpha))
    av = a * F.col("__v")
    joined = (
        t.join(uni.select(F.col("word").alias("cur"), F.col("c1").alias("__cc")), "cur", "left")
        .join(uni.select(F.col("word").alias("prev"), F.col("c1").alias("__pc")), "prev", "left")
        .join(big.select("prev", "cur", "c2"), ["prev", "cur"], "left")
        .crossJoin(F.broadcast(scal))
    )
    lp = F.when(
        F.col("pos") == 1,
        F.log((F.coalesce("__cc", F.lit(0)) + a) / (F.col("__n") + av)),
    ).otherwise(
        F.log(
            (F.coalesce("c2", F.lit(0)) + a)
            / (F.coalesce("__pc", F.lit(0)) + av)
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum(lp) / F.count(F.lit(1))).alias("cross_entropy"),
    )


def bigram_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation extraction: pointwise mutual information of adjacent
    word bigrams, PMI(a,b) = ln( (c₂(a,b)/N₂) / ((c₁(a)/N₁)·(c₁(b)/N₁)) )
    — the classic association score for multi-word expressions (Church &
    Hanks 1990). ``min_count`` filters the unstable low-frequency tail
    BEFORE the joins (PMI of rare pairs is noise, and the filter keeps
    the scored table small).

    Plan at scale: bigram + unigram count tables are map-side-combinable
    hash aggs (persisted — each feeds its scalar total and a join);
    scalar totals 1-row broadcast attaches; then two equi-joins of the
    frequency-filtered pair table against the unigram table. Linear in
    corpus size; output bounded by distinct surviving bigrams.

    Output: ``(prev, cur, pair_count, pmi)``.
    """
    pos = _token_positions(docs, text_col)
    pairs = (
        pos.where(F.col("pos") > 1)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .persist()
    )
    uni = (
        pos.groupBy(F.col("cur").alias("word"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist()
    )
    scal = (
        pairs.agg(F.sum("pair_count").alias("__n2"))
        .crossJoin(F.broadcast(uni.agg(F.sum("c1").alias("__n1"))))
    )
    out = (
        pairs.where(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("word").alias("prev"), F.col("c1").alias("__ca")), "prev")
        .join(uni.select(F.col("word").alias("cur"), F.col("c1").alias("__cb")), "cur")
        .crossJoin(F.broadcast(scal))
        .select(
            "prev",
            "cur",
            "pair_count",
            F.log(
                (F.col("pair_count") / F.col("__n2"))
                / (
                    (F.col("__ca") / F.col("__n1"))
                    * (F.col("__cb") / F.col("__n1"))
                )
            ).alias("pmi"),
        )
    )
    return out


def frequent_item_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 2,
) -> DataFrame:
    """Market-basket pair mining (A-Priori, Agrawal & Srikant VLDB 1994):
    all DISTINCT-token pairs co-occurring in ≥ ``min_support`` documents,
    with their support count — term-association mining over a corpus
    (which topics travel together), the level-2 frequent-itemset pass.

    The A-Priori pruning step is what makes this scale: a pair can only
    be frequent if BOTH items are frequent (support is anti-monotone),
    so the per-document pair explode — the quadratic-per-row step — runs
    over each document's FREQUENT tokens only. Infrequent vocabulary
    (the long tail, the overwhelming majority at corpus scale) never
    reaches the pair generator.

    Plan: one explode + hash-agg for item supports → semi-join tokens
    down to frequent ones (equi-join on token; AQE broadcasts the item
    table when small) → per-doc sorted collect_list → in-row pair
    explode (k·(k−1)/2 per doc, k = frequent tokens in that doc) → one
    (a, b)-keyed hash agg with the ≥ min_support HAVING. Map-side
    partial aggregation halves the pair volume before the only
    pair-keyed shuffle. A document stuffed with thousands of distinct
    frequent tokens makes k² blow up — cap it upstream (doc length
    caps / quality gates) as a corpus pipeline already does.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("item"),
    )
    support = toks.groupBy("item").agg(
        F.count(F.lit(1)).alias("__sup")
    )
    frequent = support.filter(F.col("__sup") >= min_support).select("item")
    kept = toks.join(frequent, "item")
    baskets = kept.groupBy("__id").agg(
        F.array_sort(F.collect_list("item")).alias("__items")
    )
    # in-row pair explode over the sorted frequent-item basket:
    # (i, j) index pairs with i < j keep each pair ordered + unique
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("__items"),
                        lambda a, i: F.transform(
                            F.col("__items"),
                            lambda b, j: F.when(
                                j > i, F.struct(a.alias("a"), b.alias("b"))
                            ),
                        ),
                    )
                ),
                lambda s: s.isNotNull(),
            )
        ).alias("__p")
    )
    return (
        pairs.groupBy(
            F.col("__p.a").alias("item_a"), F.col("__p.b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    bucket_col: str = "ntile",
) -> DataFrame:
    """Scale-safe NTILE over a TOTAL order: ``ntile(n) OVER (ORDER BY
    …)`` plans as a single-partition window (every row through one
    task); this derives the identical bucket from ``global_rank`` —
    range exchange + per-partition Arrow counter — with SQL NTILE's
    exact remainder semantics (the first ``N % n`` buckets get
    ``⌈N/n⌉`` rows). Pass a tie-breaking unique key in ``order_cols``
    for a deterministic result, as with any NTILE.
    """
    ranked = global_rank(df, order_cols, rank_col="__gr")
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    base, rem = F.floor(F.col("__n") / n), F.col("__n") % n
    pivot = (base + 1) * rem  # rows in the ⌈N/n⌉-sized buckets
    r0 = F.col("__gr") - 1
    bucket = F.when(
        r0 < pivot, F.floor(r0 / (base + 1))
    ).otherwise(rem + F.floor((r0 - pivot) / base))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(bucket_col, (bucket + 1).cast("long"))
        .drop("__gr", "__n")
    )


def spearman_correlation(
    df: DataFrame,
    col_x: str,
    col_y: str,
    tiebreak_col: str,
) -> DataFrame:
    """Spearman rank correlation between two columns, distributed:
    both columns ranked with ``global_rank`` (never a single-partition
    window), then one Pearson-over-ranks aggregate. ``tiebreak_col``
    (a unique key) makes both rank orders total — this is the
    deterministic row_number convention rather than average-rank tie
    handling; with heavy ties prefer the exact average-rank variant
    (rank + count per value via one extra hash agg).

    Returns a 1-row frame (spearman_rho, n). Two range shuffles + two
    Arrow rank passes + one scalar agg; no joins at all — the second
    rank pass carries the first rank column through. Because both rank
    vectors are tie-free permutations of 1..N, rho uses the exact
    difference formula 1 − 6·Σd²/(N(N²−1)): each d² is int64-exact and
    Σd² accumulates as decimal(38,0) (Spark decimal sums are exact;
    Σd² < N³ overflows int64 past ~2M rows), so the result is one
    double division over exact integers — deterministic across engines
    and partitionings, no floating co-moment accumulation.
    """
    # barrier between the two rank passes (r14): pass 2's range
    # repartitioner SAMPLES its child to pick boundaries, and reservoir
    # sampling executes the full child — without the checkpoint, pass 1's
    # entire chain (range shuffle + sort + Arrow rank pass) runs once for
    # the sampler and AGAIN for the real shuffle, a full duplicated pass
    # at any scale (guide §2.4: don't compute things twice)
    rx = global_rank(df, [col_x, tiebreak_col], rank_col="__rx").localCheckpoint()
    rxy = global_rank(rx, [col_y, tiebreak_col], rank_col="__ry")
    d = F.col("__rx") - F.col("__ry")
    stats = rxy.agg(
        F.sum((d * d).cast("decimal(38,0)")).alias("__sd2"),
        F.count(F.lit(1)).alias("__n"),
    )
    n = F.col("__n").cast("double")
    return stats.select(
        (
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("__sd2").cast("double")
            / (n * (n * n - F.lit(1.0)))
        ).alias("spearman_rho"),
        F.col("__n").cast("long").alias("n"),
    )


def temperature_sample_quotas(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_total: int = 200,
) -> DataFrame:
    """Temperature-based source mixing (α = 0.5): per-source sampling
    quotas ∝ √count, normalized to ``target_total`` docs — the standard
    flattening that keeps huge crawl sources from drowning small curated
    ones (cf. multilingual-LM sampling with T=2).

    Deterministic and float-free where it matters: weights are
    ``floor(√n·10⁶)`` (IEEE sqrt and multiply are exactly rounded, so both
    engines floor the same integer), quotas are integer ``w·T // ΣW``, and
    the per-source selection takes the ``quota`` docs with the smallest
    Knuth-mixed id hash (a seeded pseudorandom draw, stable across
    engines, runs, and repartitions).

    Returns one row per source: ``n_docs``, ``quota``, ``n_kept``
    (n_kept = min(quota, n_docs), realized by the rank filter).

    Scale: a count agg, a 1-row total broadcast, and one per-source window
    over docs — same skew note as :func:`source_quota_sample`.
    """
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    weights = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000))
    )
    # ΣW via a global window over the per-source frame (one row per source
    # — tiny at any corpus scale), which avoids a crossJoin of the frame
    # with its own aggregate (a self-join whose `__w` reference Spark 4's
    # analyzer rejects as ambiguous). Exact integer floor division without
    # SQL `div`: subtract the modulo first, so the double division is of
    # exactly-representable ints with an integer quotient — bit-exact vs
    # the oracle's `//`.
    wt = F.col("__w") * target_total
    quotas = weights.withColumn(
        "__wsum",
        F.sum("__w").over(Window.partitionBy(F.lit(1))),
    ).withColumn(
        "quota", ((wt - wt % F.col("__wsum")) / F.col("__wsum")).cast("long")
    )
    w = Window.partitionBy(source_col).orderBy(
        split_bucket(id_col, 1_000_000_000).asc(), F.col(id_col).asc()
    )
    ranked = docs.withColumn("__rn", F.row_number().over(w))
    kept = ranked.join(
        quotas.select(source_col, "quota"), source_col
    ).filter(F.col("__rn") <= F.col("quota"))
    return (
        kept.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(quotas.select(source_col, "n_docs", "quota"), source_col, "right")
        .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
        .select(source_col, "n_docs", "quota", "n_kept")
    )


def shuffled_position(id_col: str = "doc_id") -> Column:
    """Seeded pseudorandom global ordering key: the Knuth-mixed id hash.
    ``orderBy(shuffled_position(id))`` is a deterministic permutation —
    the reproducible replacement for ``ORDER BY random()`` when shuffling
    training examples. The sort is a range-partition exchange (Spark's
    distributed sort); at corpus scale prefer writing with
    ``repartitionByRange`` on this key + ``sortWithinPartitions``."""
    return split_bucket(id_col, 1_000_000_000)


ES_MULT = 2654435761
ES_MOD = 9007199254740881  # < 2^53: id·mult stays int64-exact cross-engine


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, IPL 2006): item i gets key u_i^(1/w_i)
    with u_i uniform in (0,1); the k largest keys are distributed
    exactly like sequential weighted draws without replacement. We rank
    by the monotone transform ln(u)/w (u < 1 so both are maximized
    together), skipping the pow. This is the principled way to take a
    "quality-weighted" or "length-weighted" subsample of a corpus —
    ``source_quota_sample`` keeps the top-ranked rows, this keeps a
    *randomized* sample whose inclusion probability tracks the weight.

    Deterministic and replayable: u derives from the Knuth-mixed id
    (same family as split_bucket/shuffled_position), not ``rand()``, so
    the sample is stable across runs, partitionings, and engines.
    Non-positive weights are clamped to 1e-12 → effectively never
    sampled (A-ES requires w > 0).

    Scale: global mode (``by=None``) is orderBy+limit, which Spark
    executes as TakeOrderedAndProject — per-partition top-k heaps merged
    once, never a single-partition global sort. Grouped mode is one
    row_number window keyed on ``by`` (heavy-hitter caveat shared with
    source_quota_sample: pre-thin hot groups before ranking)."""
    u = (
        (F.col(id_col) * F.lit(ES_MULT)) % F.lit(ES_MOD) + F.lit(0.5)
    ) / F.lit(float(ES_MOD))
    key = F.log(u) / F.greatest(
        F.col(weight_col).cast("double"), F.lit(1e-12)
    )
    ranked = docs.withColumn("__esk", key)
    if by is None:
        return (
            ranked.orderBy(F.col("__esk").desc(), F.col(id_col))
            .limit(k)
            .drop("__esk")
        )
    w = Window.partitionBy(by).orderBy(F.col("__esk").desc(), F.col(id_col))
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__esk", "__rn")
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    budget: int = 128,
    n_groups: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assigns chunks to packs of ≤ ``budget``
    tokens (first-fit-decreasing), the context-window packing step that
    turns variable-length chunks into dense fixed-budget training
    sequences.

    Packing is inherently iterative, so this is one of the few operators
    that earns ``applyInPandas``: chunks hash-shard into ``n_groups``
    independent groups (Knuth-mixed id hash — deterministic, balanced) and
    FFD runs per group in Arrow batches. Sharding costs at most one
    under-filled pack per group versus a global packer — the waste bound
    production packers accept to stay embarrassingly parallel. An
    oversized chunk (> budget) gets its own pack rather than failing.

    Output: one row per chunk with its ``group_id``, ``pack_id`` (dense
    within group), and the running assignment is deterministic: groups by
    id hash, FFD order by (tokens desc, id, idx)."""
    import pandas as pd

    def packer(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [tokens_col, id_col, idx_col], ascending=[False, True, True]
        ).reset_index(drop=True)
        remaining: list[int] = []
        assigned: list[int] = []
        for n in pdf[tokens_col].astype(int):
            for b, room in enumerate(remaining):
                if room >= n:
                    remaining[b] = room - n
                    assigned.append(b)
                    break
            else:
                remaining.append(max(budget - n, 0))
                assigned.append(len(remaining) - 1)
        pdf["pack_id"] = pd.Series(assigned, dtype="int64")
        return pdf[[ "group_id", id_col, idx_col, tokens_col, "pack_id" ]]

    grouped = chunks.withColumn(
        "group_id",
        (split_bucket(F.col(id_col).cast("string"), 1_000_000_000) % n_groups)
        .cast("long"),
    )
    schema = (
        f"group_id long, {id_col} long, {idx_col} long, "
        f"{tokens_col} long, pack_id long"
    )
    return grouped.select(
        "group_id", id_col, idx_col, tokens_col
    ).groupBy("group_id").applyInPandas(packer, schema=schema)


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Ordered three-step funnel: users whose first ``steps[0]`` precedes a
    ``steps[1]`` which precedes a ``steps[2]`` (strict event-time order,
    earliest-qualifying-event semantics at each stage).
    ``max_span_seconds`` bounds the whole funnel to a conversion window
    measured from the ENTRY event (the standard product-analytics
    parameterization: "converted within 7 days of first view") — later
    steps outside the window don't count; None keeps the unbounded
    funnel.

    Returns one row: entered / reached_2 / reached_3 counts + conversion
    rates. Plan: per-step filters push to the scan; three shuffles on the
    user key (filtered subsets, partial-agg'd); the three 1-row counts
    combine via broadcast crossJoin — nothing collects on the driver.
    """

    def within_span(entry_col):
        if max_span_seconds is None:
            return F.lit(True)
        return F.col(ts_col) <= entry_col + F.expr(
            f"interval {int(max_span_seconds)} seconds"
        )

    s1 = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    s2 = (
        events.filter(F.col(type_col) == steps[1])
        .join(s1, user_col)
        .filter((F.col(ts_col) > F.col("t1")) & within_span(F.col("t1")))
        .groupBy(user_col)
        # t1 is constant per user; carry it for the entry-window bound
        .agg(F.min(ts_col).alias("t2"), F.max("t1").alias("t1"))
    )
    s3 = (
        events.filter(F.col(type_col) == steps[2])
        .join(s2, user_col)
        .filter((F.col(ts_col) > F.col("t2")) & within_span(F.col("t1")))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_step1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_step2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_step3"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            (F.col("n_step2") / F.greatest("n_step1", F.lit(1))).alias(
                "rate_12"
            ),
            (F.col("n_step3") / F.greatest("n_step2", F.lit(1))).alias(
                "rate_23"
            ),
        )
    )


def event_path_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    length: int = 3,
    k: int = 20,
) -> DataFrame:
    """Path analysis: the top-``k`` most common length-``length`` event
    sequences across users (consecutive events in per-user time order) —
    the "what do users do next" primitive behind funnel discovery.

    Plan: one hash shuffle on the user + a lead-window pass builds each
    length-``length`` sliding path IN ROW (no per-user collect_list —
    a heavy user never materializes a giant array), then one
    map-side-combined hash agg on the path string and TakeOrdered for
    the top-k (count desc, path asc — deterministic cutoff). Heavy-key
    caveat is the window one, shared with sessionization.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    paths = events.select(
        F.when(
            steps[-1].isNotNull(), F.concat_ws(">", *steps)
        ).alias("path")
    ).filter(F.col("path").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(k)
    )


def event_transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition model over per-user event streams:
    P(next_state | state) estimated from consecutive event pairs — the
    user-behavior model behind next-action prediction and funnel
    simulation. Output: ``(state, next_state, n_transitions, prob)``
    with per-state probabilities summing to 1.

    Shape: the same keyed lead-window pass as event_path_counts (pairs
    built in-row, no per-user arrays), one hash agg on the pair, and the
    per-state normalizer attached by a broadcast join on the BOUNDED
    state table (cardinality = #event types, never #events).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("state"),
            F.lead(type_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    totals = pairs.groupBy("state").agg(
        F.sum("n_transitions").alias("__tot")
    )
    return (
        pairs.join(F.broadcast(totals), "state")
        .withColumn(
            "prob", F.col("n_transitions") / F.col("__tot")
        )
        .drop("__tot")
    )


def winsorize_stats(
    df: DataFrame,
    col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Percentile winsorization (outlier clipping), the standard numeric
    data-cleaning pass: values below the ``lower_q`` quantile / above
    the ``upper_q`` quantile are clamped to those quantiles. Returns
    per-side clip counts plus the clipped column's min/max — the audit
    row a cleaning pipeline logs.

    Two-pass shape shared with the percentile radius join: one exact
    percentile aggregate (bounded driver traffic — two doubles), bounds
    re-enter the plan as LITERALS, so the clip itself is a stateless
    whole-stage-codegen map with no second shuffle. The clipped column
    expression (``clipped_col``) is also usable directly for a
    write-back pass.
    """
    row = df.agg(
        F.percentile(F.col(col), F.array(F.lit(lower_q), F.lit(upper_q)))
        .alias("b")
    ).first()
    lo, hi = float(row["b"][0]), float(row["b"][1])
    c = F.col(col)
    clipped = F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    return df.agg(
        F.lit(lo).alias("lower_bound"),
        F.lit(hi).alias("upper_bound"),
        F.sum((c < F.lit(lo)).cast("long")).alias("n_clipped_low"),
        F.sum((c > F.lit(hi)).cast("long")).alias("n_clipped_high"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(clipped).alias("clipped_min"),
        F.max(clipped).alias("clipped_max"),
    )


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Within-document repetition signals (the Gopher-family quality
    rules): per doc, the fraction of word-bigram occurrences that are
    repeats (``dup_bigram_frac`` = 1 − distinct/total) and the share of
    the single most frequent bigram (``top_bigram_frac``). Documents with
    fewer than two tokens have no bigrams and are excluded (mirrored in
    the oracle).

    Plan: explode bigrams → count per (doc, gram) → per-doc aggregate.
    Both aggregations are map-side combinable hash aggs on
    well-distributed keys; nothing quadratic, nothing driver-side —
    within-doc repetition at 100 TB is exactly as parallel as word count.
    """
    from .text import word_bigrams

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_bigrams(text_col)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top"),
        )
        .select(
            "doc_id",
            ((F.col("total") - F.col("n_distinct")) / F.col("total")).alias(
                "dup_bigram_frac"
            ),
            (F.col("top") / F.col("total")).alias("top_bigram_frac"),
        )
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global 1-based ranking over a TOTAL order — the
    scale-safe replacement for ``row_number() OVER (ORDER BY ...)``,
    which Catalyst plans as a single-partition window (the classic
    100 TB cliff: every row funnels through one task).

    Shape: range-repartition on the sort key (Spark's sampled range
    exchange keeps partitions balanced and globally ordered), sort within
    partitions, then one tiny job counts rows per partition (map-side
    combined → #partitions rows on the driver) and the exclusive prefix
    sum of those counts is added to each partition's local index in a
    single Arrow pass. The sorted layout is materialized ONCE
    (``localCheckpoint``) before the count job: range partitioning samples
    its boundaries per execution, so letting the count job and the rank
    job each re-execute the exchange can land rows in different
    partitions than the offsets were computed for (observed: ranks offset
    by whole partition chunks). On a multi-executor cluster use reliable
    ``checkpoint()``/``persist(DISK_ONLY)`` for the same barrier.

    The per-partition local index is genuinely imperative (a running
    counter across Arrow batches), which is the documented legitimate use
    of ``mapInPandas``. Rank values depend only on the global order, never
    on the sampled partition boundaries, so the output is deterministic
    when ``order_cols`` is a total order (pass a tie-breaking unique key).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = sorted(
        (r["__pid"], r["__n"])
        for r in parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in sizes:
        offsets[pid] = acc
        acc += cnt
    boff = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        parts.schema.fields + [StructField(rank_col, LongType(), False)]
    )

    def add_rank(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = boff.value[int(pdf["__pid"].iloc[0])]
            start = base + local + 1
            pdf[rank_col] = range(start, start + len(pdf))
            local += len(pdf)
            yield pdf

    return parts.mapInPandas(add_rank, out_schema).drop("__pid")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    sum_col: str = "running_sum",
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum over a TOTAL order — the
    scale-safe replacement for ``sum(x) OVER (ORDER BY …)``, which (like
    its row_number sibling) Catalyst plans as a single-partition window.
    Emits both the running sum of ``value_col`` and the global rank
    (one pass; rank is the running sum of 1s). This is the primitive
    under CDFs, Lorenz curves, KS distances, and quota cutoffs.

    Same shape as ``global_rank`` (which it generalizes): range
    exchange + in-partition sort, ONE materialization barrier
    (localCheckpoint — range boundaries are sampled per execution, see
    global_rank), a bounded per-partition totals collect (#partitions
    rows), and an Arrow pass adding the exclusive partition offsets to
    in-partition cumulative sums. Deterministic when ``order_cols`` is
    a total order; float values accumulate partition-locally then get
    one exact offset add, so the summation ORDER is fixed by the sort,
    not the scheduler — reruns are bit-identical.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", F.col(value_col).cast("double"))
        .localCheckpoint()
    )
    sizes = sorted(
        (r["__pid"], r["__n"], r["__s"])
        for r in parts.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.coalesce("__v", F.lit(0.0))).alias("__s"),
        )
        .collect()
    )
    offsets: dict[int, tuple[int, float]] = {}
    acc_n, acc_s = 0, 0.0
    for pid, cnt, s in sizes:
        offsets[pid] = (acc_n, acc_s)
        acc_n += cnt
        acc_s += s
    boff = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        parts.schema.fields
        + [
            StructField(rank_col, LongType(), False),
            StructField(sum_col, DoubleType(), False),
        ]
    )

    def add_scan(batches):
        local_n, local_s = 0, 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base_n, base_s = boff.value[int(pdf["__pid"].iloc[0])]
            start = base_n + local_n + 1
            pdf[rank_col] = range(start, start + len(pdf))
            cs = pdf["__v"].fillna(0.0).cumsum()
            pdf[sum_col] = cs + (base_s + local_s)
            local_n += len(pdf)
            local_s += float(cs.iloc[-1])
            yield pdf

    return (
        parts.mapInPandas(add_scan, out_schema)
        .drop("__pid", "__v")
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance: ``D = max_v |F_a(v) −
    F_b(v)|`` over the empirical CDFs — the drift / distribution-shift
    detector (is this week's score distribution still last week's?),
    companion to Q-Q calibration.

    Exact tie handling: CDFs are right-continuous, so D is evaluated at
    the LAST union row of each distinct value (one hash agg per value
    after the scan), never at intra-tie partial positions. Shape: one
    distributed prefix scan over the tagged union (global_running_sum)
    + one value-keyed hash agg + a scalar aggregate. Returns one row
    ``(ks_d, n_a, n_b)``.
    """
    a = df_a.select(
        F.col(col).alias("__x"),
        F.lit(1.0).alias("__tag"),
        F.col(tiebreak_col).alias("__tb"),
    )
    b = df_b.select(
        F.col(col).alias("__x"),
        F.lit(0.0).alias("__tag"),
        F.col(tiebreak_col).alias("__tb"),
    )
    # CDFs are over observed values: NULLs drop (mirrored in oracles)
    u = a.unionByName(b).filter(F.col("__x").isNotNull())
    scanned = global_running_sum(
        u, ["__x", "__tag", "__tb"], "__tag", sum_col="__ca"
    )
    per_value = scanned.groupBy("__x").agg(
        F.max("__ca").alias("__ca"), F.max("rank").alias("__r")
    )
    counts = u.agg(
        F.sum("__tag").alias("__na"),
        (F.count(F.lit(1)) - F.sum("__tag")).alias("__nb"),
    )
    d = F.abs(
        F.col("__ca") / F.col("__na")
        - (F.col("__r") - F.col("__ca")) / F.col("__nb")
    )
    return (
        per_value.crossJoin(F.broadcast(counts))
        .agg(
            F.max(d).alias("ks_d"),
            F.max("__na").cast("long").alias("n_a"),
            F.max("__nb").cast("long").alias("n_b"),
        )
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[float],
    tiebreak_col: str,
) -> DataFrame:
    """Exact weighted quantiles (lower-bound convention): for each
    ``q`` the smallest value whose cumulative weight reaches ``q·W`` —
    e.g. the price below which half of all SHIPPED QUANTITY falls,
    rather than half of all rows. The importance-weighted statistic a
    sampling/reweighting pipeline needs (DSIR weights, quality scores),
    which ``percentile(col)`` cannot express.

    Shape: one distributed prefix scan over (value, tiebreak)
    (global_running_sum — never a single-partition window), a 1-row
    total-weight broadcast attach, then per-q one min_by aggregate over
    the rows at-or-past the threshold. Deterministic: the scan order is
    total and the threshold test uses the exact running sums.
    Non-positive weights must be filtered by the caller (they make
    cumulative weight non-monotone, and no quantile convention is
    meaningful over them).
    """
    scanned = global_running_sum(
        df.select(
            F.col(value_col).alias("__x"),
            F.col(weight_col).cast("double").alias("__w"),
            F.col(tiebreak_col).alias("__tb"),
        ),
        ["__x", "__tb"],
        "__w",
        sum_col="__cw",
    )
    total = scanned.agg(F.sum("__w").alias("__tw"))
    j = scanned.crossJoin(F.broadcast(total))
    return j.agg(
        *[
            F.min_by(
                "__x",
                F.when(
                    F.col("__cw") >= F.lit(q) * F.col("__tw"),
                    F.col("rank"),
                ),
            ).alias(f"wq_{str(q).replace('.', '_')}")
            for q in qs
        ],
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group exact weighted median (lower-bound convention): for
    each group, the smallest value whose cumulative weight reaches half
    the group's total. Unlike the global ``weighted_quantile`` (which
    needs the distributed scan), the per-group form is a KEYED
    cumulative window — partitioned by the group, so it parallelizes
    across groups and never funnels through one task. Heavy-hitter
    caveat shared with every keyed window.

    Output: ``(group, weighted_median, total_weight, n_rows)``.

    Profile collapse first (the skyline trick): weights pre-aggregate by
    (group, value) in a map-side-combinable hash agg, so the window runs
    over DISTINCT values per group, not rows — identical result (the
    lower-bound median only reads cumulative weight at value
    boundaries, and collapsing ties lands the same boundary totals).
    Measured on li64 (38.4M rows, 3 groups): 60.9 s → the windowed rows
    drop 22x; few-group inputs otherwise serialize the whole table
    through #groups window tasks (the heavy-hitter caveat made
    concrete — see PERF.md r7g).
    """
    collapsed = (
        df.select(
            F.col(group_col),
            F.col(value_col).alias("__x"),
            F.col(weight_col).cast("double").alias("__w"),
        )
        .groupBy(group_col, "__x")
        .agg(
            F.sum("__w").alias("__w"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__x").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(group_col)
    scanned = collapsed.withColumn(
        "__cw", F.sum("__w").over(w)
    ).withColumn("__tw", F.sum("__w").over(wt))
    return scanned.groupBy(group_col).agg(
        F.min_by(
            "__x",
            F.when(
                F.col("__cw") >= 0.5 * F.col("__tw"), F.col("__x")
            ),
        ).alias("weighted_median"),
        F.max("__tw").alias("total_weight"),
        F.sum("__n").cast("long").alias("n_rows"),
    )


def vocab_heavy_hitters(
    docs: DataFrame,
    support: float = 0.02,
    text_col: str = "text",
) -> DataFrame:
    """Exact term heavy hitters (frequency ≥ support·total) via a
    sketch-prefilter cascade: ``df.stat.freqItems`` (a single-pass
    Karp-Papadimitriou-Shenker-style counter sketch, bounded state) yields
    a SUPERSET of every term above the support threshold; an exact count
    restricted to that candidate set then filters it down to exactly the
    true heavy hitters. Same cascade shape as LSH banding + exact verify:
    the approximate stage bounds the work, the exact stage restores
    precision — so the output is oracle-checkable against the plain
    GROUP BY ... HAVING despite the sketch in the plan.

    Scale: the full-vocabulary groupBy (cardinality = vocab) is replaced
    by one bounded-state sketch pass plus a count over candidate-matching
    term instances only (candidates ≤ 1/support regardless of corpus
    size, broadcast by construction).
    """
    terms = docs.select(F.explode(tokens(text_col)).alias("term"))
    spark = docs.sparkSession
    total = terms.count()
    floor = support * total

    def exact_tail(cands: list[str] | None) -> DataFrame:
        scoped = (
            terms if cands is None else terms.filter(F.col("term").isin(cands))
        )
        return (
            scoped.groupBy("term")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") >= floor)
            .withColumn(
                "frequency", F.col("n_occurrences") / F.lit(float(total))
            )
            .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        )

    # The sketch prefilter runs at support/2: freqItems only guarantees a
    # superset of terms STRICTLY above its argument, and the exact stage
    # filters with >= floor — at support itself a boundary term could
    # legally be dropped by the sketch. freqItems enforces a 1e-4 minimum
    # (raises below it), and running it ABOVE support/2 would break the
    # superset contract (terms with true frequency in [support, 2·arg)
    # may be dropped silently) — so sub-floor supports skip the sketch and
    # take the plain exact groupBy-HAVING over the full vocabulary. That
    # loses the bounded-candidate guarantee, which is honest: no one-pass
    # bounded-state sketch can isolate < 10^4-frequency heavy hitters
    # here, and the full groupBy is the exact cost such a support implies.
    if support / 2 < 1e-4:
        return exact_tail(None)
    cand_row = terms.stat.freqItems(["term"], support / 2).first()
    cands = [t for t in cand_row[0] if t is not None]
    if not cands:
        return spark.createDataFrame(
            [], "term string, n_occurrences long, frequency double"
        )
    return exact_tail(cands)


def token_js_divergence(
    docs: DataFrame,
    label_col: str,
    label_a: str,
    label_b: str,
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence (base-2: bounded in [0, 1]) between the
    unigram token distributions of two corpus slices — the symmetric,
    zero-safe drift statistic for "did source/split A's vocabulary shift
    from B's" (data-mixing and contamination dashboards use it where the
    numeric columns use the KS distance, `ks_statistic`).

    Shape: one scan of the two slices' token instances into ONE hash agg
    keyed on the term with conditional per-side sums (map-side partials
    absorb in-doc repetition), a 1-row broadcast attach of the two
    totals, and a scalar agg of the per-term JS contributions — zero
    joins beyond the 1-row attach, work linear in token count, state
    bounded by vocabulary. Terms absent on one side contribute only the
    present side's half (p·log2(p/m)), the standard JS zero-handling —
    no smoothing constant to tune, unlike KL.

    Returns 1 row: (js_divergence, n_terms_a, n_terms_b, tokens_a,
    tokens_b), the divergence stable-rounded to 6.
    """
    lab = F.col("__lab")
    terms = docs.filter(
        F.col(label_col).isin([label_a, label_b])
    ).select(
        F.col(label_col).alias("__lab"),
        F.explode(tokens(text_col)).alias("__term"),
    )
    counts = terms.groupBy("__term").agg(
        F.sum(F.when(lab == label_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(lab == label_b, 1).otherwise(0)).alias("__cb"),
    )
    totals = counts.agg(
        F.sum("__ca").alias("__ta"), F.sum("__cb").alias("__tb")
    )
    with_tot = counts.crossJoin(F.broadcast(totals))
    p = F.col("__ca") / F.col("__ta")
    q = F.col("__cb") / F.col("__tb")
    m = (p + q) / 2
    contrib = F.lit(0.5) * (
        F.when(F.col("__ca") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("__cb") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    )
    return with_tot.agg(
        stable_round(F.sum(contrib), 6).alias("js_divergence"),
        F.count(F.when(F.col("__ca") > 0, 1)).cast("long").alias("n_terms_a"),
        F.count(F.when(F.col("__cb") > 0, 1)).cast("long").alias("n_terms_b"),
        F.sum("__ca").cast("long").alias("tokens_a"),
        F.sum("__cb").cast("long").alias("tokens_b"),
    )


def token_label_chi2(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 25,
) -> DataFrame:
    """Chi-square feature scoring: for each term, the χ² statistic of the
    (term present in doc) × (doc label) contingency table — the classic
    supervised feature-selection ranking ("which tokens identify a
    source/domain"), the discrete-label counterpart of the numeric MAD /
    KS family.

    The full table per term is 2×L (present/absent × label) and the
    absent row plus the all-zero cells are NEVER materialized: with
    E_tℓ = n_t·n_ℓ/N, the present-row sum Σ_ℓ(O−E)²/E telescopes to
    Σ_ℓ n_tℓ²·N/(n_t·n_ℓ) − n_t (zero cells vanish inside the O² sum),
    and the absent row to Σ_obs[((n_ℓ−n_tℓ)²−n_ℓ²)·N/((N−n_t)·n_ℓ)]
    + N²/(N−n_t) − (N−n_t), because the unobserved-ℓ remainder sums in
    closed form over Σ_ℓ n_ℓ = N. So the whole statistic reads off the
    OBSERVED (term, label) doc-count table: one explode of per-doc
    DISTINCT terms, one hash agg on (term, label), one broadcast attach
    of the L label totals, one per-term agg, one 1-row N attach. Work is
    linear in corpus token count; state is bounded by vocab × L.

    A term present in EVERY doc has an empty absent row (N−n_t = 0); its
    χ² is the present-row sum alone — the guard keeps the division out.

    Returns the top_k terms by (χ² stable-rounded to 4, term asc — the
    deterministic cutoff convention): (term, n_docs, chi2).
    """
    n_total = docs.agg(F.count(F.lit(1)).cast("double").alias("__N"))
    presence = docs.select(
        F.col(label_col).alias("__lab"),
        F.explode(F.array_distinct(tokens(text_col))).alias("__term"),
    )
    ntl = presence.groupBy("__term", "__lab").agg(
        F.count(F.lit(1)).cast("double").alias("__ntl")
    )
    nl = docs.groupBy(F.col(label_col).alias("__lab")).agg(
        F.count(F.lit(1)).cast("double").alias("__nl")
    )
    cells = ntl.join(F.broadcast(nl), "__lab")
    per_term = cells.groupBy("__term").agg(
        F.sum(F.col("__ntl") * F.col("__ntl") / F.col("__nl")).alias("__s1"),
        F.sum(
            (
                (F.col("__nl") - F.col("__ntl"))
                * (F.col("__nl") - F.col("__ntl"))
                - F.col("__nl") * F.col("__nl")
            )
            / F.col("__nl")
        ).alias("__s2"),
        F.sum("__ntl").alias("__nt"),
    )
    nn = F.col("__N")
    nt = F.col("__nt")
    present_row = nn * F.col("__s1") / nt - nt
    absent_row = F.when(
        nt < nn,
        nn * F.col("__s2") / (nn - nt) + nn * nn / (nn - nt) - (nn - nt),
    ).otherwise(F.lit(0.0))
    scored = per_term.crossJoin(F.broadcast(n_total)).select(
        F.col("__term").alias("term"),
        F.col("__nt").cast("long").alias("n_docs"),
        stable_round(present_row + absent_row, 4).alias("chi2"),
    )
    return scored.orderBy(F.col("chi2").desc(), F.col("term").asc()).limit(
        top_k
    )


def vocab_growth(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 10,
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law: V ≈ K·Nᵝ): cumulative
    distinct-term count vs cumulative token count at ``n_checkpoints``
    equal-document checkpoints of the corpus in ``id_col`` order — the
    diagnostic for "is the corpus still contributing new vocabulary or
    has it gone repetitive", and the empirical basis for tokenizer vocab
    sizing.

    Shape: ONLY the doc ids go through `global_ntile`'s range exchange
    (range exchange + Arrow rank — never a single-partition window over
    the corpus, and never the text: the assignment frame is two integer
    columns, so the sort shuffles id-width rows, not documents); per-doc
    token counts and each term's FIRST document (one min-agg per term)
    join the bucket assignment back by doc id — equi-joins AQE plans
    freely. The cumulative rollup runs in a window over the AGGREGATED
    k-row frame — bounded by n_checkpoints, the same tiny-aggregate
    exemption as the per-group median broadcasts.

    Returns one row per checkpoint: (checkpoint, n_docs, n_tokens,
    vocab_size) — all cumulative, exact integers.
    """
    buckets = global_ntile(
        docs.select(F.col(id_col).alias("__doc")),
        ["__doc"],
        n_checkpoints,
        bucket_col="__cp",
    )
    toks = docs.select(
        F.col(id_col).alias("__doc"), tokens(text_col).alias("__toks")
    )
    per_doc = toks.select("__doc", F.size("__toks").alias("__n_toks"))
    per_bucket = (
        per_doc.join(buckets, "__doc")
        .groupBy("__cp")
        .agg(
            F.count(F.lit(1)).alias("__docs"),
            F.sum("__n_toks").alias("__tokens"),
        )
    )
    first_doc = (
        toks.select("__doc", F.explode("__toks").alias("__term"))
        .groupBy("__term")
        .agg(F.min("__doc").alias("__first"))
    )
    new_terms = (
        first_doc.join(
            buckets.select(F.col("__doc").alias("__first"), "__cp"),
            "__first",
        )
        .groupBy("__cp")
        .agg(F.count(F.lit(1)).alias("__new_terms"))
    )
    k_rows = per_bucket.join(new_terms, "__cp", "left").na.fill(
        0, ["__new_terms"]
    )
    w = (
        Window.orderBy("__cp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return k_rows.select(
        F.col("__cp").alias("checkpoint"),
        F.sum("__docs").over(w).cast("long").alias("n_docs"),
        F.sum("__tokens").over(w).cast("long").alias("n_tokens"),
        F.sum("__new_terms").over(w).cast("long").alias("vocab_size"),
    ).orderBy("checkpoint")


def association_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 2,
    top_k: int = 25,
) -> DataFrame:
    """Association-rule metrics over the frequent pairs (the level-3
    output of the A-Priori pass): confidence in both directions and
    lift for every pair `frequent_item_pairs` surfaces — "docs with a
    also have b" with the base-rate correction that separates real
    association from popularity.

    Shape: the pair table from the pruned explode (bounded by the
    frequent vocabulary), per-item document frequencies from one hash
    agg over distinct (doc, item) — already computed once for the
    pruning, recomputed here keyed only on the frequent items — and a
    1-row N attach. lift = P(ab)/(P(a)·P(b)) over document probability;
    deterministic cutoff: (lift rounded to 6 desc, item_a, item_b).
    """
    pairs = frequent_item_pairs(docs, text_col, id_col, min_support)
    presence = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(tokens(text_col))).alias("__item"),
    )
    item_df = presence.groupBy("__item").agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    n_total = docs.agg(F.count(F.lit(1)).cast("double").alias("__N"))
    a = item_df.select(
        F.col("__item").alias("item_a"), F.col("__n_docs").alias("supp_a")
    )
    b = item_df.select(
        F.col("__item").alias("item_b"), F.col("__n_docs").alias("supp_b")
    )
    out = (
        pairs.join(a, "item_a")
        .join(b, "item_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            F.col("supp_a").cast("long").alias("supp_a"),
            F.col("supp_b").cast("long").alias("supp_b"),
            stable_round(
                F.col("pair_support") / F.col("supp_a"), 6
            ).alias("confidence_ab"),
            stable_round(
                F.col("pair_support") / F.col("supp_b"), 6
            ).alias("confidence_ba"),
            stable_round(
                F.col("pair_support")
                * F.col("__N")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(top_k)


#: water-fill iteration count shared by the driver solve and the oracle's
#: unrolled CTE chain — the capped set grows monotonically, so any count
#: ≥ #sources is exact; 24 covers the fixture's 20 sources with margin
MIXTURE_ITERS = 24
#: epoch cap as the exact rational 11/5 (= 2.2 epochs): working in
#: "token-fifths" keeps every running sum an exact int64, so summation
#: ORDER cannot flip a cap comparison between engines
MIXTURE_CAP5 = 11  # cap in fifths-of-a-token per token (11/5 epochs)
MIXTURE_BUDGET5 = 10  # budget in fifths per corpus token (= 2.0 epochs)


def mixture_waterfill(
    counts: list[tuple[str, int]],
    *,
    budget5_per_token: int = MIXTURE_BUDGET5,
    cap5_per_token: int = MIXTURE_CAP5,
    iters: int = MIXTURE_ITERS,
) -> list[dict]:
    """Temperature-weighted token-budget allocation with per-source epoch
    caps — the pretraining "data recipe" calculation (cf. the sampling-
    temperature mixtures of multilingual LMs and the per-source epoch
    caps of open pretraining recipes): distribute ``budget`` tokens over
    sources ∝ √tokens (temperature 0.5 flattening), but never sample any
    source beyond ``cap`` epochs; surplus from capped sources water-fills
    back onto the uncapped ones.

    Determinism + cross-engine float contract: weights are
    floor(√t·10⁶) (IEEE sqrt/multiply are exactly rounded → identical
    integers in Spark driver and DuckDB); the budget and all caps live in
    integer token-FIFTHS so every running sum is an exact int64 —
    summation order cannot flip a comparison; the only doubles are the
    final share divisions, written with the same operand order the oracle
    SQL uses. The capped set grows monotonically, so ``iters`` ≥ #sources
    replays exactly (extra iterations are no-ops); fixed iteration count
    keeps the oracle a finite CTE chain.

    Returns per source: n_tokens, weight, alloc_tokens, epochs, capped.
    """
    import math

    rows = [
        (s, int(t), int(math.floor(math.sqrt(t) * 1_000_000.0)))
        for s, t in counts
    ]
    if any(t <= 0 for _, t, _ in rows):
        raise ValueError("mixture_waterfill: every source needs tokens > 0")
    if len(rows) > int(iters):
        # the fixed iteration count only guarantees the capped-set
        # fixpoint for ≤ iters sources (at worst one source caps per
        # pass); silently stopping early would yield allocations above
        # the epoch cap and break budget conservation — and the oracle's
        # finite CTE chain replays exactly `iters` passes (ADVICE r11)
        raise ValueError(
            f"mixture_waterfill: {len(rows)} sources exceed iters={iters} "
            "— the fixpoint is only guaranteed for ≤ iters sources; raise "
            "iters (and regenerate the oracle CTE chain to match)"
        )
    b5 = budget5_per_token * sum(t for _, t, _ in rows)
    capped: dict[str, bool] = {s: False for s, _, _ in rows}
    for _ in range(int(iters)):
        c5 = sum(cap5_per_token * t for s, t, _ in rows if capped[s])
        wu = sum(w for s, _, w in rows if not capped[s])
        if wu == 0:
            break
        rem5 = b5 - c5
        for s, t, w in rows:
            if not capped[s]:
                share5 = float(rem5) * w / wu
                if share5 >= float(cap5_per_token * t):
                    capped[s] = True
    c5 = sum(cap5_per_token * t for s, t, _ in rows if capped[s])
    wu = sum(w for s, _, w in rows if not capped[s])
    rem5 = b5 - c5
    out = []
    for s, t, w in rows:
        if capped[s]:
            alloc = float(cap5_per_token * t) / 5.0
        else:
            alloc = (float(rem5) * w / wu) / 5.0
        out.append(
            {
                "source": s,
                "n_tokens": t,
                "weight": w,
                "alloc_tokens": alloc,
                "epochs": alloc / t,
                "capped": int(capped[s]),
            }
        )
    return out
