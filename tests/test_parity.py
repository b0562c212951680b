"""Reference-parity featurizer: the 39-dim vector over a hand-computed
signatures+papers fixture (semantics cited to s2and/featurizer.py:301-517;
expected values derived by hand + via the golden-tested python kernels)."""

import math

import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.functions.text import (
    AFFILIATIONS_STOP_WORDS,
    char_ngrams_counter,
    word_ngrams_counter,
)
from ent_res_feedback_spark.operators.parity import (
    FEATURE_NAMES_39,
    feature_vector_39,
    pair_features_39,
    preprocess_papers,
    preprocess_signatures,
)

SIG_SCHEMA = (
    "signature_id string, paper_id long, "
    "author_info struct<first:string, middle:string, last:string, "
    "suffix:string, position:int, email:string, affiliations:array<string>>"
)
PAPER_SCHEMA = (
    "paper_id long, title string, abstract string, journal_name string, "
    "venue string, year int, "
    "authors array<struct<position:int, author_name:string>>, "
    "references array<long>"
)


@pytest.fixture(scope="module")
def fixture_frames(spark):
    sigs = spark.createDataFrame(
        [
            ("s1", 1, ("Alan", "B", "Smith", None, 0, "alan@uni.edu", ["MIT CSAIL"])),
            ("s2", 2, ("A.", "", "Smith", None, 0, "alan@uni.edu", ["MIT CSAIL"])),
        ],
        SIG_SCHEMA,
    )
    papers = spark.createDataFrame(
        [
            (1, "Deep Learning Methods", "an abstract", None, "NeurIPS Conference",
             2020, [(0, "Alan Smith"), (1, "Bob Jones")], [3]),
            (2, "Deep Learning Approaches", None, None, "NeurIPS Conference",
             2022, [(0, "A. Smith"), (1, "Carol White")], [3]),
            (3, "Old Classic", None, None, "Old Journal", 1999,
             [(0, "Zed Zulu")], []),
        ],
        PAPER_SCHEMA,
    )
    return sigs, papers


@pytest.fixture(scope="module")
def feature_row(spark, fixture_frames):
    sigs, papers = fixture_frames
    sp = preprocess_signatures(sigs, papers)
    pp = preprocess_papers(papers)
    m = sp.join(pp, "paper_id")
    # embeddings (SPECTER analog) joined by paper_id
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1.0])], "paper_id long, embedding array<double>"
    )
    m = m.join(emb, "paper_id", "left")
    left = m.where(F.col("signature_id") == "s1").select(
        *[F.col(c).alias(c + "_1") for c in m.columns]
    )
    right = m.where(F.col("signature_id") == "s2").select(
        *[F.col(c).alias(c + "_2") for c in m.columns]
    )
    pairs = left.crossJoin(right)
    out = feature_vector_39(pair_features_39(pairs))
    rows = out.collect()
    assert len(rows) == 1
    return rows[0]


def test_preprocessing_normalization(spark, fixture_frames):
    sigs, papers = fixture_frames
    sp = preprocess_signatures(sigs, papers)
    got = {r["signature_id"]: r for r in sp.collect()}
    assert got["s1"]["first_norm_na"] == "alan"
    assert got["s1"]["middle_norm_na"] == "b"
    assert got["s2"]["first_norm_na"] == "a"
    assert got["s2"]["middle_norm_na"] == ""
    assert got["s1"]["last_norm"] == "smith"
    assert set(got["s1"]["coauthors"]) == {"bob jones"}
    assert set(got["s1"]["coauthor_blocks"]) == {"b jones"}
    assert got["s1"]["email_prefix"] == "alan"


def test_39_features_hand_computed(feature_row):
    r = feature_row
    # name similarity (featurizer.py:333-374)
    assert r["first_names_equal"] == 0.0          # 'alan' != 'a'
    assert r["middle_initials_overlap"] is None   # one side empty -> NaN/NULL
    assert r["middle_names_equal"] is None
    assert r["middle_one_missing"] == 1.0
    assert r["single_char_first"] == 1.0
    assert r["single_char_middle"] == 1.0
    # affiliation (identical) / email (identical)
    assert r["affiliation_overlap"] == 1.0
    assert r["email_prefix_equal"] == 1.0
    assert r["email_suffix_equal"] == 1.0
    # coauthors: disjoint names
    assert r["coauthor_overlap"] == 0.0
    assert r["coauthor_match"] == 0.0
    expected_co = _counter_jaccard_py(
        char_ngrams_counter("bob jones", stopwords=None),
        char_ngrams_counter("carol white", stopwords=None),
        denominator_max=5000,
    )
    assert r["coauthor_similarity"] == pytest.approx(expected_co)
    # venue identical
    assert r["venue_overlap"] == 1.0
    assert r["year_diff"] == 2.0
    # titles via the golden-tested kernels
    tw = _counter_jaccard_py(
        word_ngrams_counter("deep learning methods"),
        word_ngrams_counter("deep learning approaches"),
    )
    assert r["title_overlap_words"] == pytest.approx(tw)
    tc = _counter_jaccard_py(
        char_ngrams_counter("deep learning methods"),
        char_ngrams_counter("deep learning approaches"),
    )
    assert r["title_overlap_chars"] == pytest.approx(tc)
    # references: both cite paper 3 only
    assert r["references_authors_overlap"] == 1.0
    assert r["references_titles_overlap"] == 1.0
    assert r["references_venues_overlap"] == 1.0
    assert r["references_author_blocks_jaccard"] == 1.0
    assert r["references_self_citation"] == 0.0
    assert r["references_overlap"] == 1.0
    # misc
    assert r["position_diff"] == 0.0
    assert r["abstract_count"] == 1.0
    assert r["english_count"] == 2.0   # both 'un' (heuristic on short titles)
    assert r["same_language"] == 1.0
    assert r["language_reliability_count"] == 0.0
    # name counts: no table -> NULL
    for n in ["first_name_count_min", "last_first_name_count_min",
              "last_name_count_min", "last_first_initial_count_min",
              "first_name_count_max", "last_first_name_count_max"]:
        assert r[n] is None
    # specter: cos([1,0],[1,1]) + 1
    assert r["specter_cosine_sim"] == pytest.approx(1.0 / math.sqrt(2) + 1.0)
    # journal: both missing -> NULL
    assert r["journal_overlap"] is None
    # advanced name sims: 'a' is len 1 -> all NULL (text.py:363)
    for n in ["levenshtein", "prefix", "lcs", "jaro"]:
        assert r[n] is None
    # assembled vector order
    assert len(r["features"]) == 39
    assert r["features"][0] == r["first_names_equal"]
    assert r["features"][38] == r["jaro"]
    assert FEATURE_NAMES_39[13] == "year_diff" and r["features"][13] == 2.0


def test_name_counts_join(spark, fixture_frames):
    sigs, papers = fixture_frames
    counts = spark.createDataFrame(
        [
            ("first", "alan", 50),
            ("last", "smith", 1000),
            ("first_last", "alan smith", 7),
            ("last_first_initial", "smith alan", 9),
            ("last_first_initial", "smith a", 3),
        ],
        "kind string, key string, count long",
    )
    sp = preprocess_signatures(sigs, papers, name_counts=counts)
    got = {r["signature_id"]: r["name_counts"] for r in sp.collect()}
    assert tuple(got["s1"]) == (50, 7, 1000, 9)
    # initial-only first -> first/first_last NULL (reference data.py:619-625)
    assert got["s2"]["first"] is None
    assert got["s2"]["first_last"] is None
    assert got["s2"]["last"] == 1000
    assert got["s2"]["last_first_initial"] == 3


def _counter_jaccard_py(c1, c2, denominator_max=None):
    if not c1 or not c2:
        return None
    inter = sum((c1 & c2).values())
    union = sum(c1.values()) + sum(c2.values()) - inter
    denom = min(union, denominator_max) if denominator_max else union
    return min(inter / denom, 1.0)
