"""C3 golden tests — expected values taken verbatim from the reference's
/root/reference/tests/test_s2_funcs.py run over its dummy fixture
(/root/reference/tests/dummy/signatures.json + papers.json), re-created
here as an in-memory signatures frame with the same field values."""

import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.merge_rules import (
    cluster_profiles,
    cluster_pair_rules,
    has_year_gap,
)

SIG_SCHEMA = (
    "sig_id string, first string, middle string, last string, "
    "affiliations array<string>, email string, source string, "
    "source_ids array<string>, year int"
)

# mirror of the reference dummy signatures (sig_id: first/middle/last/
# affiliations/email/source/source_ids + the linked paper's year)
SIGS = [
    ("0", "Dr A'bdul", None, "Sattar", ["Bridgewater State University"], None,
     "ORCID", ["1"], 2006),
    ("1", "Abdul", None, "Sattar", ["Bridgewater State University"], None,
     "DBLP", ["1"], 2008),
    ("2", "Abdul", None, "Sattar", ["Bridgewater State University"], None,
     "ORCID", ["2"], 2008),
    ("3", "Alexander", None, "Konovalov", ["Moscow State University"], None,
     "ORCID", ["2"], 2002),
    ("4", "Alexander", None, "Konovalov", ["Esri"], "konovalov@gmail.com",
     "Extracted", ["A Konovalov"], 2001),
    ("5", "Alexander", None, "Konovalov", ["Moscow State University"],
     "konovalov@gmail.com", "ORCID", ["3"], 2002),
    ("6", "Alexander", "Jones", "Konovalov", ["Moscow State University"],
     "konovalov2@gmail.com", "Extracted", ["A Konovalov"], 1950),
    ("7", "Alexander", "J.", "Konovalov", ["Moscow State University"],
     "konovalov2@gmail.com", "Extracted", ["A Konovalov"], 1950),
    ("8", "Alexander", "James", "Konovalov", ["Moscow State University"],
     "konovalov2@gmail.com", "Extracted", ["A Konovalov"], 1950),
]


def _rules_row(spark, ids_1, ids_2):
    rows = [s for s in SIGS if s[0] in set(ids_1) | set(ids_2)]
    cluster_of = {i: "c1" for i in ids_1} | {i: "c2" for i in ids_2}
    mapping = F.create_map(
        *[F.lit(x) for kv in cluster_of.items() for x in kv]
    )
    df = spark.createDataFrame(rows, SIG_SCHEMA).withColumn(
        "cluster_id", F.element_at(mapping, F.col("sig_id"))
    )
    profs = cluster_profiles(df)
    # candidate_key=None: the goldens deliberately pair cross-name
    # clusters (Sattar vs Konovalov) to pin rule VALUES, which the
    # safe-by-default candidate join would (correctly) never generate
    out = cluster_pair_rules(
        profs.where(F.col("cluster_id") == "c1"),
        profs.where(F.col("cluster_id") == "c2"),
        candidate_key=None,
    ).collect()
    assert len(out) == 1
    return out[0]


def test_year_gap_is_small(spark):
    assert _rules_row(spark, ["0", "1"], ["4", "3"])["year_gap_is_small"] is True
    assert _rules_row(spark, ["0"], ["6"])["year_gap_is_small"] is False


def test_affiliation_fuzzy_match(spark):
    assert _rules_row(spark, ["0", "1"], ["4", "3"])[
        "affiliation_jaccard"
    ] == pytest.approx(0.25)
    assert _rules_row(spark, ["0"], ["6"])["affiliation_jaccard"] == pytest.approx(
        1 / 3
    )


def test_trusted_ids_are_compatible(spark):
    assert _rules_row(spark, ["0", "1", "2"], ["3", "4"])[
        "trusted_ids_are_compatible"
    ] is True
    assert _rules_row(spark, ["0", "2"], ["3", "5"])[
        "trusted_ids_are_compatible"
    ] is False


def test_trusted_ids_match_exactly(spark):
    assert _rules_row(spark, ["2"], ["3"])["trusted_ids_match_exactly"] is True
    assert _rules_row(spark, ["2", "1"], ["3"])["trusted_ids_match_exactly"] is False
    assert _rules_row(spark, ["0"], ["2"])["trusted_ids_match_exactly"] is False


def test_emails_match_exactly(spark):
    assert _rules_row(spark, ["4"], ["5"])["emails_match_exactly"] is True
    assert _rules_row(spark, ["5"], ["6"])["emails_match_exactly"] is False


def test_names_are_compatible(spark):
    assert _rules_row(spark, ["1"], ["2"])["names_are_compatible"] is True
    assert _rules_row(spark, ["0"], ["3"])["names_are_compatible"] is False
    assert _rules_row(spark, ["6"], ["7"])["names_are_compatible"] is True
    assert _rules_row(spark, ["6"], ["8"])["names_are_compatible"] is False


def test_sergeys_rule(spark):
    # all-prefix cross pairs pass; 'dr abdul' vs 'alexander' fails
    assert _rules_row(spark, ["1"], ["2"])["sergeys_rule"] is True
    assert _rules_row(spark, ["1"], ["3"])["sergeys_rule"] is False


def test_has_year_gap(spark):
    df = spark.createDataFrame(
        [("a", [1990, 1991, 2005]), ("b", [2001, 2002]), ("c", [2000])],
        "cluster_id string, years array<int>",
    )
    got = {
        r["cluster_id"]: r["gap"]
        for r in df.select(
            "cluster_id", has_year_gap(F.col("years")).alias("gap")
        ).collect()
    }
    assert got == {"a": True, "b": False, "c": False}


def _all_profiles(spark):
    cluster_of = {  # Sattar-ish ids -> s1/s2, Konovalov ids -> k1/k2
        "0": "s1", "1": "s1", "2": "s2",
        "3": "k1", "4": "k1", "5": "k2", "6": "k2", "7": "k2", "8": "k2",
    }
    mapping = F.create_map(
        *[F.lit(x) for kv in cluster_of.items() for x in kv]
    )
    df = spark.createDataFrame(SIGS, SIG_SCHEMA).withColumn(
        "cluster_id", F.element_at(mapping, F.col("sig_id"))
    )
    return cluster_profiles(df)


def test_candidate_key_default_no_cartesian(spark):
    """The default path must compile to an equi-join: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    profs = _all_profiles(spark)
    out = cluster_pair_rules(profs, profs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_candidate_key_matches_filtered_cross(spark):
    """Default candidate-join output == explicit cross output restricted
    to pairs sharing at least one last-first-initial (same rule values,
    nothing else)."""
    profs = _all_profiles(spark)
    got = {
        (r["cluster_id_1"], r["cluster_id_2"]): r.asDict()
        for r in cluster_pair_rules(profs, profs).collect()
    }
    cross = cluster_pair_rules(profs, profs, candidate_key=None)
    lfi = {
        r["cluster_id"]: set(r["last_first_initials"])
        for r in profs.collect()
    }
    want = {
        (r["cluster_id_1"], r["cluster_id_2"]): r.asDict()
        for r in cross.collect()
        if lfi[r["cluster_id_1"]] & lfi[r["cluster_id_2"]]
    }
    assert set(got) == set(want)
    assert got == want
    # cross-name pairs (disjoint lfi) are correctly absent
    assert ("s1", "k1") not in got and len(got) > 0
