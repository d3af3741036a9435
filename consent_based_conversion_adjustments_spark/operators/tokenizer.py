"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The production shape every real BPE trainer uses at scale (SentencePiece,
HuggingFace tokenizers, GPT-2's original trainer): the corpus is scanned
ONCE into a distinct-word vocabulary table with occurrence counts, and all
``k`` merge iterations run against that vocab table — which is orders of
magnitude smaller than the corpus (distinct words vs total tokens). Here
that becomes:

- ``word_vocab``: one exploded-token hash aggregation over the corpus
  (map-side combinable) → ``(word, n, syms)`` with ``syms`` the
  character-split symbol sequence.
- per iteration: adjacent-pair counts are a ``transform``+``explode`` over
  ``syms`` weighted by ``n`` into a second hash aggregation; the argmax
  pair is ONE row of driver traffic (``count DESC, left, right`` — fully
  deterministic tie-break); the merge rewrite is a pure-Catalyst
  ``aggregate`` fold over each symbol array — no Python in the row path.

Greedy left-to-right non-overlapping merge via a fold: scan symbols
accumulating into ``acc``; if ``last(acc) == left`` and the current symbol
``== right``, replace ``last(acc)`` with ``left||right``, else append.
This is EXACTLY greedy LTR because a just-merged element can never
re-trigger (``left||right != left`` whenever ``right`` is non-empty).
The DuckDB oracle twin replays the same fold in the string domain with
``list_reduce`` over a unit-separator-joined representation
(plans.corpus_queries.bpe_sql), so sequences match symbol-for-symbol.

100 TB scale: corpus touched once; per-iteration cost is proportional to
the VOCAB (even web-scale corpora have ~1e8 distinct words — a routine
distributed agg), driver traffic is one row per merge. With
``checkpoint_every=None`` the k merge folds stack as Catalyst expressions
over the persisted vocab (iteration i re-evaluates i folds: O(k²) fold
work total — trivial for tokenizer-sized k on a vocab table); for large k
set ``checkpoint_every`` to cut the expression chain with a
``localCheckpoint`` every m merges instead.

Beyond-reference operator: the reference pipeline has no tokenizer
induction; this follows the published BPE algorithm (Sennrich et al. 2016)
re-expressed as Spark aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["word_vocab", "merge_pair", "bpe_learn", "encoded_lengths"]


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word vocabulary with corpus occurrence counts and
    character-level symbol sequences: ``(word, n, syms)``.

    One explode + one hash aggregation (map-side combinable); blank
    documents contribute nothing (text.tokens filters empty tokens, so
    every ``syms`` is non-empty).
    """
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of ``(left, right)`` →
    ``left||right`` as a pure-Catalyst fold (see module docstring for the
    correctness argument)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair occurrence counts over the vocab, weighted by word
    frequency. ``sequence`` is guarded by the ``size >= 2`` filter
    (Spark's sequence(1, 0) would be DESCENDING, not empty)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("la"),
            F.element_at("syms", i + 1).alias("rb"),
        ),
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.la", "p.rb")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    *,
    checkpoint_every: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges; returns ``(merges, vocab)``.

    ``merges``: ``(step, la, rb, merged, cnt)`` — the learned merge table
    in application order. ``vocab``: ``(word, n, syms)`` with every merge
    applied — joining corpus tokens against it IS the encoder.

    Raises ValueError if the vocabulary runs out of adjacent pairs before
    ``n_merges`` — a fixed-k contract keeps the cross-engine replay oracle
    exact (and a tokenizer trained past exhaustion is a config error worth
    failing loudly on, matching the repo's validation style).
    """
    spark = docs.sparkSession
    vocab_base = word_vocab(docs, text_col).persist()
    vocab_base.count()  # materialize; iterations re-read the cached vocab
    vocab = vocab_base
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("la"), F.asc("rb"))
            .first()
        )
        if best is None:
            raise ValueError(
                f"vocabulary exhausted after {step - 1} merges; "
                f"asked for {n_merges}"
            )
        merges.append((step, best.la, best.rb, best.la + best.rb, best.cnt))
        vocab = vocab.withColumn(
            "syms", merge_pair(F.col("syms"), best.la, best.rb)
        )
        if checkpoint_every and step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "step int, la string, rb string, merged string, cnt long"
    )
    # The merge table is driver-side literals by now; release the cached
    # base vocab so repeated calls don't accumulate executor storage. A
    # later action on the returned vocab recomputes the (single) corpus
    # scan + k folds lazily — one extra pass, no correctness impact.
    vocab_base.unpersist()
    return merges_df, vocab


def encoded_lengths(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword statistics under a learned BPE vocab:
    ``(id_col, n_tokens, n_subwords)``.

    Explode + hash equi-join on ``word`` + hash aggregation — the join is
    broadcastable when the vocab is small but NOT forced (AQE decides;
    web-scale vocabs exceed broadcast). Documents with zero tokens drop
    out (no join rows), mirrored by the SQL twin.
    """
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .join(vocab.select("word", F.size("syms").alias("n_syms")), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_subwords"),
        )
    )
