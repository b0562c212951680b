"""Golden tests for the scalar text layer, ported from the reference's
tests/test_text.py (values asserted there are the spec; our missing-value
convention is NULL where the reference returns NaN)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.functions import text as T


def one(spark, col):
    """Evaluate a single column expression against a 1-row frame."""
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("TeXt",), ("te'xt",), ("José  Müller-9",)],
        ["s"],
    )
    out = [r["n"] for r in df.select(T.normalize_text(F.col("s")).alias("n")).collect()]
    assert out == ["", "", "text", "te xt", "jose muller"]
    out2 = [
        r["n"]
        for r in df.select(T.normalize_text(F.col("s"), True).alias("n")).collect()
    ]
    assert out2[3] == "text"  # apostrophe special case (reference test line 19)


def test_char_ngrams_counter_golden():
    # reference tests/test_text.py:37-45
    assert Counter() == T.char_ngrams_counter(None)
    assert Counter() == T.char_ngrams_counter("the")
    assert Counter(
        ["hell", "ello", "hel", "ell", "llo", "he", "el", "ll", "lo", "wor", "wo", "or"]
    ) == T.char_ngrams_counter("hello wor")
    assert Counter(
        ["hell", "ello", "hel", "ell", "llo", "he", "el", "ll", "lo", "wor",
         "wo", "or", "h", "e", "l", "l", "o", "w", "o", "r"]
    ) == T.char_ngrams_counter("hello wor", use_unigrams=True)


def test_word_ngrams_counter_golden():
    # reference tests/test_text.py:47-50
    assert Counter() == T.word_ngrams_counter(None)
    assert Counter() == T.word_ngrams_counter("the")
    assert Counter(
        ["quick green fox", "green fox jumped", "quick green", "green fox",
         "fox jumped", "quick", "green", "fox", "jumped"]
    ) == T.word_ngrams_counter("the quick green fox jumped")


def test_ngram_counter_max_union_not_sum():
    # Counter | is element-wise max (reference s2and/text.py:443): 'aaaa'
    # yields bigram 'aa' x3, trigram 'aaa' x2 — union keeps maxima.
    c = T.char_ngrams_counter("aaaa", stopwords=None)
    assert c["aa"] == 3 and c["aaa"] == 2 and c["aaaa"] == 1


def test_equal(spark):
    lit = F.lit
    assert one(spark, T.equal(lit(None), lit(None))) is None
    assert one(spark, T.equal(lit(""), lit(""))) is None
    assert one(spark, T.equal(lit("-"), lit("text"))) is None
    assert one(spark, T.equal(lit("text"), lit("text"))) == 1
    assert one(spark, T.equal(lit("text"), lit("hi"))) == 0


def test_equal_middle(spark):
    lit = F.lit
    assert one(spark, T.equal_middle(lit(None), lit(None))) is None
    assert one(spark, T.equal_middle(lit(""), lit(""))) is None
    assert one(spark, T.equal_middle(lit("a"), lit(""))) is None
    assert one(spark, T.equal_middle(lit("a"), lit("b"))) == 0
    assert one(spark, T.equal_middle(lit("a"), lit("a"))) == 1
    assert one(spark, T.equal_middle(lit("a"), lit("as"))) == 1
    assert one(spark, T.equal_middle(lit("as"), lit("af"))) == 0
    assert one(spark, T.equal_middle(lit("as"), lit("as"))) == 1


def test_equal_initial(spark):
    lit = F.lit
    assert one(spark, T.equal_initial(lit(None), lit(None))) is None
    assert one(spark, T.equal_initial(lit(""), lit(""))) is None
    assert one(spark, T.equal_initial(lit("a"), lit("b"))) == 0
    assert one(spark, T.equal_initial(lit("a"), lit("a"))) == 1
    assert one(spark, T.equal_initial(lit("a"), lit("as"))) == 1


def test_counter_jaccard(spark):
    def cj(d1, d2, **kw):
        df = spark.createDataFrame([(d1, d2)], "m1 map<string,int>, m2 map<string,int>")
        return df.select(
            T.counter_jaccard(F.col("m1"), F.col("m2"), **kw).alias("v")
        ).collect()[0]["v"]

    assert cj({}, {}) is None
    # reference tests/test_text.py:79-80
    c1 = dict(Counter(["1", "2", "3", "4", "5"]))
    c2 = dict(Counter(["1", "2", "3", "4", "6"]))
    assert cj(c1, c2) == pytest.approx(4 / 6)
    c1b = dict(Counter(["1", "2", "3", "4", "5", "5"]))
    assert cj(c1b, c2) == pytest.approx(4 / 7)
    # denominator_max clamp + min(score, 1) (reference s2and/text.py:598-601)
    assert cj(c1, c1, denominator_max=3) == 1.0


def test_set_jaccard(spark):
    def sj(a, b):
        df = spark.createDataFrame([(a, b)], "a1 array<string>, a2 array<string>")
        return df.select(T.set_jaccard(F.col("a1"), F.col("a2")).alias("v")).collect()[0]["v"]

    assert sj([], []) is None
    assert sj(["1", "2", "3", "4", "5"], ["1", "2", "3", "4", "6"]) == pytest.approx(4 / 6)
    # duplicates are deduped (set semantics, reference tests/test_text.py:86)
    assert sj(["1", "2", "3", "4", "5", "5"], ["1", "2", "3", "4", "6"]) == pytest.approx(4 / 6)


def test_compute_block(spark):
    df = spark.createDataFrame([("",), ("text",), ("tony text",)], ["n"])
    out = [r["b"] for r in df.select(T.compute_block_key(F.col("n")).alias("b")).collect()]
    # reference tests/test_text.py:88-91
    assert out == ["", "text", "t text"]


def test_diff(spark):
    lit = F.lit
    assert one(spark, T.abs_diff(lit(None), lit(None))) is None
    assert one(spark, T.abs_diff(lit(10), lit(5))) == 5
    assert one(spark, T.abs_diff(lit(5), lit(10))) == 5
    assert one(spark, T.abs_diff(lit(0), lit(99), cap=50)) == 50


def test_name_counts_min_max(spark):
    # reference tests/test_text.py:98-101
    df = spark.createDataFrame(
        [((5, 100, 10, 200), (4, 99, 11, 201))],
        "nc1 struct<first:int,first_last:int,last:int,last_first_initial:int>, "
        "nc2 struct<first:int,first_last:int,last:int,last_first_initial:int>",
    )
    row = df.select(*T.name_counts_min_max(F.col("nc1"), F.col("nc2"))).collect()[0]
    assert list(row) == [4, 99, 10, 200, 5, 100]
    # nanmin skips NULL, max propagates NULL (reference s2and/text.py:716-719)
    df2 = spark.createDataFrame(
        [((None, 100, 10, 200), (4, None, 11, 201))],
        "nc1 struct<first:int,first_last:int,last:int,last_first_initial:int>, "
        "nc2 struct<first:int,first_last:int,last:int,last_first_initial:int>",
    )
    row2 = df2.select(*T.name_counts_min_max(F.col("nc1"), F.col("nc2"))).collect()[0]
    assert list(row2) == [4, 100, 10, 200, None, None]


def test_cosine_sim(spark):
    from ent_res_feedback_spark.functions.vectors import cosine_sim

    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 3.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()]
    expected = (1 * 2 + 2 * 3) / (math.sqrt(5) * math.sqrt(13))
    assert vals[0] == pytest.approx(expected)
    assert vals[1] == 0.0  # zero vector -> 0 (reference s2and/text.py:391)


# ---------------------------------------------------------------------------
# winnowing fingerprints (functions/hashing.py)
# ---------------------------------------------------------------------------

def test_winnowing_matches_python_mirror(spark):
    import hashlib

    from pyspark.sql import functions as F

    from ent_res_feedback_spark.functions.hashing import winnowing_fingerprints

    def py_winnow(s, k=5, w=4):
        grams = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(s) - k + 1)
        ]
        if not grams:
            return []
        if len(grams) < w:
            return sorted({min(grams)})
        sel = {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
        return sorted(sel)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abcdefgh",
        "abcd",        # shorter than k: no grams
        "abcde",       # exactly one gram
        "aaaaaaaaaa",  # constant text: one distinct hash
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: sorted(r["fps"])
        for r in df.select(
            "text", winnowing_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    for t in texts:
        assert got[t] == py_winnow(t), f"mismatch for {t!r}"


def test_winnowing_edit_robust(spark):
    from pyspark.sql import functions as F

    from ent_res_feedback_spark.functions.hashing import winnowing_fingerprints

    base = "entity resolution at scale requires blocking and careful scoring"
    edited = base.replace("careful", "carefux")
    df = spark.createDataFrame([(base,), (edited,)], "text string")
    rows = df.select(winnowing_fingerprints(F.col("text")).alias("f")).collect()
    a, b = set(rows[0]["f"]), set(rows[1]["f"])
    # a one-char edit perturbs only windows near the edit: most survive
    assert len(a & b) / len(a | b) >= 0.5
    assert a != b


def test_winnowing_randomized_parity(spark):
    """100 random strings (fixed seed): Spark expression == python mirror,
    including short/empty/repetitive edge shapes."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from ent_res_feedback_spark.functions.hashing import winnowing_fingerprints

    def py_winnow(s, k=5, w=4):
        grams = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(s) - k + 1)
        ]
        if not grams:
            return []
        if len(grams) < w:
            return sorted({min(grams)})
        return sorted(
            {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
        )

    rng = random.Random(1234)
    alphabet = "ab cd"  # tiny alphabet: maximizes duplicate k-grams/ties
    texts = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(99)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: sorted(r["fps"])
        for r in df.select(
            "i", winnowing_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_winnow(t), f"mismatch for {t!r}"
