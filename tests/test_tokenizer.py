"""BPE merge learning: parity with a pure-Python reference trainer, greedy
left-to-right fold semantics, encoder invariants, and the exhaustion guard."""

import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators import tokenizer as T


def python_bpe(word_counts, n_merges):
    """Reference BPE trainer (Sennrich et al. 2016 pseudocode, greedy
    left-to-right merge, deterministic cnt-DESC/la/rb tie-break)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            return merges, vocab
        (la, rb), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, la, rb, la + rb, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low lower lowest",
    "new newer newest new new",
    "wide wider widest low new",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def word_counts():
    wc = {}
    for t in CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_matches_python_reference(spark, docs):
    merges, vocab = T.bpe_learn(docs, "text", n_merges=6)
    got = [tuple(r) for r in merges.orderBy("step").collect()]
    want, pyvocab = python_bpe(word_counts(), 6)
    assert got == want
    got_vocab = {r.word: list(r.syms) for r in vocab.collect()}
    assert got_vocab == pyvocab


def test_merge_pair_is_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("aaba",), ("abab",)], ["w"]
    ).withColumn("syms", F.split("w", ""))
    out = {
        r.w: list(r.m)
        for r in df.select(
            "w", T.merge_pair(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]  # non-overlapping: NOT [aa, aa, a...]
    assert out["aaba"] == ["aa", "b", "a"]
    out2 = {
        r.w: list(r.m)
        for r in df.select(
            "w", T.merge_pair(F.col("syms"), "a", "b").alias("m")
        ).collect()
    }
    assert out2["abab"] == ["ab", "ab"]
    assert out2["aaba"] == ["a", "ab", "a"]


def test_encoded_lengths_invariants(spark, docs):
    merges, vocab = T.bpe_learn(docs, "text", n_merges=4)
    enc = {
        r.doc_id: (r.n_tokens, r.n_subwords)
        for r in T.encoded_lengths(docs, vocab).collect()
    }
    for i, t in enumerate(CORPUS):
        words = t.split()
        n_chars = sum(len(w) for w in words)
        n_tok, n_sub = enc[i]
        assert n_tok == len(words)
        # each merge only ever shortens sequences; bounds are exact
        assert n_tok <= n_sub <= n_chars


def test_bpe_exhaustion_raises(spark):
    tiny = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="exhausted"):
        T.bpe_learn(tiny, "text", n_merges=3)  # only 1 pair exists


def test_checkpoint_every_same_result(spark, docs):
    m1, _ = T.bpe_learn(docs, "text", n_merges=5)
    m2, _ = T.bpe_learn(docs, "text", n_merges=5, checkpoint_every=2)
    assert [tuple(r) for r in m1.collect()] == [tuple(r) for r in m2.collect()]


class TestUnigram:
    def test_viterbi_golden_and_ties(self):
        import math

        from consent_based_conversion_adjustments_spark.operators.tokenizer import (
            _viterbi,
        )

        logp = {p: math.log(v) for p, v in
                {"a": 0.1, "b": 0.1, "ab": 0.3, "ba": 0.3, "aba": 0.02}.items()}
        # whole-word 0.02 loses to the 2-piece splits (0.3*0.1 = 0.03);
        # ab+a ties a+ba exactly -> same piece count -> the longer LAST
        # piece wins: a+ba
        assert _viterbi("aba", logp) == ["a", "ba"]
        # higher-prob whole piece wins over char splits
        assert _viterbi("ab", logp) == ["ab"]
        # unreachable piece never chosen when chars cover
        assert _viterbi("bb", logp) == ["b", "b"]

    def test_pure_python_em_parity(self, spark):
        """The distributed trainer must equal a pure-Python replica of
        the same seed + hard-EM rounds on a small corpus, exactly."""
        import math
        from collections import Counter

        from consent_based_conversion_adjustments_spark.operators.tokenizer import (
            UNIGRAM_MAX_PIECE_LEN,
            _viterbi,
            unigram_learn,
        )

        texts = [
            "the cat sat on the mat",
            "the cat ate the rat",
            "a mat a rat a cat",
            "the the the cat cat",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        vocab_size, n_rounds, seed_mult = 20, 3, 4
        got = {
            r["piece"]: (r["prob"], r["rank"])
            for r in unigram_learn(
                docs, vocab_size=vocab_size, n_rounds=n_rounds
            ).collect()
        }

        # ---- pure-Python replica --------------------------------------
        words = Counter(w for t in texts for w in t.split())
        subs: Counter = Counter()
        for w, n in words.items():
            for i in range(len(w)):
                for ln in range(1, min(UNIGRAM_MAX_PIECE_LEN, len(w) - i) + 1):
                    subs[w[i : i + ln]] += n
        chars = {p: c for p, c in subs.items() if len(p) == 1}
        n_seed = max(vocab_size * seed_mult - len(chars), 0)
        multi = sorted(
            ((p, c) for p, c in subs.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:n_seed]
        weights = {**chars, **dict(multi)}

        def normalize(usage):
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
            usage: Counter = Counter()
            for w, n in words.items():
                for p in _viterbi(w, logp):
                    usage[p] += n
            logp = normalize(usage)
        ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
        final = [p for p, _ in ranked[: max(vocab_size, len(chars))]]
        keep = set(final) | set(chars)
        total = sum(math.exp(logp[p]) for p in keep)
        want = {
            p: round(math.exp(logp[p]) / total - 1e-9, 8) + 0.0
            for p in keep
        }
        assert set(got) == set(want)
        for p in want:
            assert got[p][0] == pytest.approx(want[p], abs=1e-8), p

    def test_coverage_and_encode_bounds(self, spark):
        from consent_based_conversion_adjustments_spark.operators.tokenizer import (
            unigram_encoded_lengths,
            unigram_learn,
        )
        from consent_based_conversion_adjustments_spark.sources.io import read_table

        docs = read_table(spark, "/root/testdata/sf0.001", "documents")
        pieces = [
            (r["piece"], r["prob"])
            for r in unigram_learn(docs, vocab_size=32, n_rounds=2).collect()
        ]
        assert all(pr > 0 for _, pr in pieces)
        lengths = {
            r["doc_id"]: r["n_pieces"]
            for r in unigram_encoded_lengths(docs, pieces).collect()
        }
        import pyspark.sql.functions as F

        stats = docs.select(
            "doc_id",
            F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
            .alias("n_words"),
            F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
        ).collect()
        for r in stats:
            # every doc encodable; pieces between n_words and n_chars
            assert r["n_words"] <= lengths[r["doc_id"]] <= r["n_chars"]

    def test_unseen_characters_fall_back_to_unk(self, spark):
        """Regression (round-9 advice): a doc outside the training corpus
        whose word contains a character absent from the vocab used to
        crash the Arrow kernel with len(None); now each unknown char
        counts as one <unk> piece and known spans Viterbi normally."""
        from consent_based_conversion_adjustments_spark.operators.tokenizer import (
            unigram_encoded_lengths,
        )

        # vocab knows a, b, ab — nothing else
        import math

        pieces = [("ab", 0.5), ("a", 0.3), ("b", 0.2)]
        docs = spark.createDataFrame(
            [(1, "abab"), (2, "aXb"), (3, "XY")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_pieces"]
            for r in unigram_encoded_lengths(docs, pieces).collect()
        }
        assert got[1] == 2          # ab + ab
        assert got[2] == 3          # a, <unk>, b
        assert got[3] == 2          # <unk>, <unk>
        assert math.isfinite(got[2])
