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


# -- unigram LM tokenizer (SentencePiece-style, Kudo 2018) --------------------

UNIGRAM_MAX_PIECE_LEN = 6


def _viterbi(word: str, logp: dict, max_len: int = UNIGRAM_MAX_PIECE_LEN):
    """Best segmentation of ``word`` under piece log-probs: maximize the
    sum of piece log-probs; ties break to FEWER pieces, then to the
    longer last piece — a total, deterministic rule shared verbatim by
    the Arrow kernel and the pure-Python parity test. Returns the piece
    list (always succeeds when every character is in ``logp``)."""
    n = len(word)
    neg = float("-inf")
    best = [(neg, 0, 0)] * (n + 1)
    best[0] = (0.0, 0, 0)
    for i in range(1, n + 1):
        for length in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - length : i])
            if lp is None:
                continue
            s0, k0, _ = best[i - length]
            if s0 == neg:
                continue
            cand = (s0 + lp, k0 + 1, length)
            cur = best[i]
            if cand[0] > cur[0] or (
                cand[0] == cur[0]
                and (
                    cand[1] < cur[1]
                    or (cand[1] == cur[1] and length > cur[2])
                )
            ):
                best[i] = cand
    pieces = []
    i = n
    while i > 0:
        length = best[i][2]
        if length == 0:
            return None  # unreachable word (a char missing from logp)
        pieces.append(word[i - length : i])
        i -= length
    return pieces[::-1]


def _usage_counts(vocab: DataFrame, logp: dict, max_len: int) -> list:
    """E-step, distributed: Viterbi-segment every DISTINCT word (the
    reduced table — law 4: iterations never touch the corpus) in an
    Arrow kernel with the bounded piece table captured in the closure;
    emit per-batch PARTIAL (piece, usage) rows, hash-agg, collect the
    bounded result (rows ≤ |pieces|)."""
    import pandas as pd

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            c: Counter = Counter()
            for w, n in zip(pdf["word"], pdf["n"]):
                for p in _viterbi(w, logp, max_len):
                    c[p] += int(n)
            if c:
                yield pd.DataFrame(
                    {"piece": list(c.keys()), "usage": list(c.values())}
                )

    return (
        vocab.mapInPandas(kernel, "piece string, usage long")
        .groupBy("piece")
        .agg(F.sum("usage").alias("usage"))
        .collect()
    )


def unigram_learn(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    n_rounds: int = 3,
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    seed_multiplier: int = 4,
) -> DataFrame:
    """Unigram-LM tokenizer training (the SentencePiece algorithm family,
    Kudo 2018), hard-EM variant: pieces are scored by how often the
    CURRENT best (Viterbi) segmentations of the corpus use them, and the
    vocabulary shrinks toward ``vocab_size``. Two documented
    simplifications vs the paper: the E-step uses the Viterbi
    segmentation (hard counts) rather than full forward-backward
    expectations, and pruning is lowest-usage-first rather than
    likelihood-loss-ranked — the distributed SHAPE (which is what this
    engine demonstrates) is identical either way, since both E-step
    variants are one kernel pass over the same reduced table.

    Scale shape (law 4 — iterate over the REDUCED table): the corpus is
    scanned ONCE into the distinct-word vocab table; seed pieces come
    from one substring explode + hash agg over that table (≤ len²/2
    rows per distinct word); every EM round is one Arrow kernel pass
    over the words with the bounded piece table in the closure, one
    hash agg of partial usage counts, and a bounded driver collect.
    Single characters are pinned in the vocabulary (with an add-½
    usage floor so an unused char keeps a finite log-prob), which
    guarantees every word stays segmentable — the standard coverage
    invariant.

    Deterministic by construction: seed and final cuts order by
    (count desc, piece asc); Viterbi ties break structurally. Returns
    (piece, prob, rank) with prob stable-rounded to 8.
    """
    import math

    from ..functions.rounding import stable_round

    vocab = word_vocab(docs, text_col).drop("syms").localCheckpoint()
    subs = (
        vocab.select(
            F.explode(
                F.flatten(
                    F.expr(
                        f"""transform(sequence(1, length(word)), i ->
                        transform(sequence(1, least({int(max_piece_len)},
                                                    length(word) - i + 1)),
                                  l -> substring(word, i, l)))"""
                    )
                )
            ).alias("piece"),
            F.col("n"),
        )
        .groupBy("piece")
        .agg(F.sum("n").alias("w"))
    )
    chars = {
        r["piece"]: r["w"]
        for r in subs.filter(F.length("piece") == 1).collect()
    }
    n_seed = max(vocab_size * seed_multiplier - len(chars), 0)
    multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.col("w").desc(), F.col("piece").asc())
        .limit(n_seed)
        .collect()
    )
    weights = {**chars, **{r["piece"]: r["w"] for r in multi}}

    def normalize(usage: dict) -> dict:
        # pin single chars with an add-1/2 floor; everything else needs
        # usage > 0 to survive
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
    for _ in range(n_rounds):
        usage = {r["piece"]: r["usage"] for r in _usage_counts(
            vocab, logp, max_piece_len
        )}
        logp = normalize(usage)

    # final cut: top vocab_size by (prob desc, piece asc), chars pinned
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    final = [p for p, _ in ranked[: max(vocab_size, len(chars))]]
    keep = set(final) | set(chars)
    total = sum(math.exp(logp[p]) for p in keep)
    spark = docs.sparkSession
    rows = sorted(
        ((p, math.exp(logp[p]) / total) for p in keep),
        key=lambda kv: (-kv[1], kv[0]),
    )
    out = spark.createDataFrame(
        [(p, pr, i + 1) for i, (p, pr) in enumerate(rows)],
        "piece string, prob double, rank long",
    )
    return out.select(
        "piece", stable_round(F.col("prob"), 8).alias("prob"), "rank"
    ).orderBy("rank")


def unigram_encoded_lengths(
    docs: DataFrame,
    piece_probs: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
) -> DataFrame:
    """Per-document piece counts under a learned unigram vocabulary.

    Spark-first encode: the Viterbi DP runs ONCE PER DISTINCT WORD (a
    bounded Arrow pass over the vocab table mapping word → piece count),
    and documents encode via one equi-join of their exploded words onto
    that map + a per-doc hash agg — per-occurrence work is a join probe,
    never a DP. ``piece_probs`` is the (piece, prob) list from
    ``unigram_learn`` (bounded, closure-captured).
    """
    import math

    import pandas as pd

    logp = {p: math.log(pr) for p, pr in piece_probs}

    def n_pieces(w):
        # A word outside the training corpus may contain a character with
        # no vocab piece; _viterbi returns None for it (it used to crash
        # the kernel with len(None)). SentencePiece maps such characters
        # to <unk>: segment each maximal known-character span normally and
        # count one <unk> piece per unknown character.
        pieces = _viterbi(w, logp, max_piece_len)
        if pieces is not None:
            return len(pieces)
        total, span = 0, []
        for ch in w:
            if ch in logp:
                span.append(ch)
            else:
                if span:
                    total += len(_viterbi("".join(span), logp, max_piece_len))
                    span = []
                total += 1  # <unk>
        if span:
            total += len(_viterbi("".join(span), logp, max_piece_len))
        return total

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [n_pieces(w) for w in pdf["word"]],
                }
            )

    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .distinct()
    )
    word_len = words.mapInPandas(kernel, "word string, n_pieces long")
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .join(word_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n_pieces").cast("long").alias("n_pieces"))
        .orderBy(id_col)
    )
