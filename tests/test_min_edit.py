"""A8 min_pair_edit golden tests (reference s2and/eval.py:1064-1160)."""

import pandas as pd

from ent_res_feedback_spark.operators.min_edit import (
    _min_pair_edit_py,
    min_pair_edit,
)


def test_no_mistakes_is_zero():
    assign = {"a": "c1", "b": "c1", "c": "c2"}
    pairs = [("a", "b", True), ("a", "c", False)]
    assert _min_pair_edit_py(assign, pairs) == (0.0, 0, 0)


def test_single_misplaced_id_one_flip():
    # d sits in c2 but gold says it belongs with a,b in c1: wrong pairs
    # (a,d,T),(b,d,T),(d,e,F) -> d is the most-frequent mistaken id and a
    # single flip of d to c1 repairs everything
    assign = {"a": "c1", "b": "c1", "d": "c2", "e": "c2"}
    pairs = [
        ("a", "b", True),
        ("a", "d", True),
        ("b", "d", True),
        ("d", "e", False),
        ("a", "e", False),
    ]
    score, steps, n = _min_pair_edit_py(assign, pairs)
    assert steps == 1
    assert n == 4  # a, b, d, e each touch at least one wrong pair
    assert abs(score - 1 / 3) < 1e-12




def test_split_needed_uses_dummy():
    # a and b predicted together but gold says apart, and neither fits any
    # other cluster -> greedy must move one of them to "dummy"
    assign = {"a": "c1", "b": "c1"}
    pairs = [("a", "b", False)]
    score, steps, n = _min_pair_edit_py(assign, pairs)
    assert steps == 1
    assert n == 2
    assert score == 1.0  # 1 / (2 - 1)


def test_two_swapped_ids():
    # two ids each in the other's gold cluster: greedy fixes in 2 flips
    assign = {"a": "c1", "x": "c1", "b": "c2", "y": "c2"}
    pairs = [
        ("a", "x", False), ("a", "y", True),
        ("b", "y", False), ("b", "x", True),
        ("x", "y", False),
    ]
    score, steps, n = _min_pair_edit_py(assign, pairs)
    assert steps == 2
    assert n == 4
    assert abs(score - 2 / 3) < 1e-12


def test_spark_matches_python_kernel_per_block(spark):
    assignments = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b", "d", "e", "p", "q"],
                "cluster_id": ["c1", "c1", "c2", "c2", "k1", "k1"],
            }
        )
    )
    labeled = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id_1": ["a", "a", "b", "d", "a", "p"],
                "doc_id_2": ["b", "d", "d", "e", "e", "q"],
                "label": [1, 1, 1, 0, 0, 0],
                "block_key": ["B1"] * 5 + ["B2"],
            }
        )
    )
    got = {
        r["block_key"]: (r["min_edit_score"], r["min_edit_count"], r["n_mistaken_ids"])
        for r in min_pair_edit(assignments, labeled).collect()
    }
    # B1 mirrors test_single_misplaced_id_one_flip (1 flip, 4 mistaken ids);
    # B2 has one wrong pair (p,q predicted together, gold apart) -> one
    # dummy flip, n=2
    assert got["B1"] == (1 / 3, 1, 4)
    assert got["B2"] == (1.0, 1, 2)
