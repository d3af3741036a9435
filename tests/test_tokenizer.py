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
