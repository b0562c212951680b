"""Metric aggregations: B3 goldens ported from the reference
tests/test_eval.py:7-38 (its b3 returns 3-decimal-rounded values — we
round for comparison) plus pairwise-PRF sanity."""

import pytest


def _clusters_df(spark, clusters: dict):
    rows = [(str(i), str(c)) for c, ids in clusters.items() for i in ids]
    return spark.createDataFrame(rows, "doc_id string, cluster_id string")


@pytest.mark.parametrize(
    "gold,pred,want",
    [
        (
            {"dark": [1, 2, 3, 4, 5], "light": [6, 7, 9, 12, 13, 14],
             "line": [8], "purple": [10], "spotted": [11]},
            {"1": [1, 2, 3, 4], "2": [5, 6, 7], "3": [8, 9, 10, 11, 12, 13, 14]},
            (0.599, 0.695, 0.643),
        ),
        (
            {"dark": [1, 2, 3, 4, 5], "light": [6, 7, 9, 12, 13, 14],
             "line": [8], "purple": [10], "spotted": [11]},
            {"1": [1, 2, 3, 4], "2": [5], "3": [6, 7], "4": [8, 9, 10, 11, 12, 13, 14]},
            (0.694, 0.695, 0.695),
        ),
        (
            {"dark": [1, 2, 3, 4, 5], "light": [6, 7], "line1": [8, 9],
             "line2": [10, 11], "line3": [12, 13]},
            {"1": [1, 2, 3, 4, 5], "2": [6], "3": [7], "4": [8], "5": [9],
             "6": [10], "7": [11], "8": [12], "9": [13]},
            (1.0, 0.692, 0.818),
        ),
        (
            {"dark": [1, 2, 3, 4, 5], "light": [6, 7], "line1": [8, 9],
             "line2": [10, 11], "line3": [12, 13]},
            {"1": [1, 2, 3, 4], "2": [5], "3": [6, 7], "4": [8, 9],
             "5": [10, 11], "6": [12, 13]},
            (1.0, 0.877, 0.934),
        ),
    ],
)
def test_b3_goldens(spark, gold, pred, want):
    from ent_res_feedback_spark.operators.metrics import b3

    got = b3(_clusters_df(spark, pred), _clusters_df(spark, gold))
    assert round(got["precision"], 3) == pytest.approx(want[0], abs=5e-4)
    assert round(got["recall"], 3) == pytest.approx(want[1], abs=5e-4)
    assert round(got["f1"], 3) == pytest.approx(want[2], abs=5e-4)


def test_pairwise_prf(spark):
    from ent_res_feedback_spark.operators.metrics import pairwise_prf

    assignments = _clusters_df(spark, {"a": [1, 2, 3], "b": [4, 5]})
    labeled = spark.createDataFrame(
        [("1", "2", 1), ("1", "4", 0), ("2", "4", 1), ("4", "5", 1), ("3", "5", 0)],
        "doc_id_1 string, doc_id_2 string, label int",
    )
    got = pairwise_prf(labeled, assignments)
    # predicted same: (1,2) tp, (1,4) diff tn? label0 & diff -> tn;
    # (2,4) label1 but diff -> fn; (4,5) tp; (3,5) label0 diff -> tn
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (2, 0, 1, 2)
    assert got["precision"] == 1.0
    assert got["recall"] == pytest.approx(2 / 3)


def test_pairwise_cluster_prf_identical_is_one(spark):
    from ent_res_feedback_spark.operators.metrics import pairwise_cluster_prf

    pred = _clusters_df(spark, {"a": [1, 2], "b": [3]})
    got = pairwise_cluster_prf(pred, pred)
    assert got == {"precision": 1.0, "recall": 1.0, "f1": 1.0}
