"""FE4/M2/M3 (nameless view + blend), FE6 (StandardScaler), A5 (AUROC/AP).

Goldens are computed independently in-test: numpy for the scaler, a pure-
Python replica of sklearn's roc_auc_score / average_precision_score for
the metrics (pairwise counting + step integral on ~10 rows), and manual
sigmoid averages for the blend."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.metrics import auroc_ap
from ent_res_feedback_spark.operators.parity import (
    FEATURE_NAMES_39,
    NAMELESS_FEATURE_NAMES,
    nameless_feature_view,
    score_pairs_blended,
)
from ent_res_feedback_spark.operators.scoring import (
    apply_standard_scaler,
    fit_standard_scaler,
)


def test_nameless_view_drops_exactly_the_name_groups():
    # reference featurizer.py:76-90 feature_group_to_index with
    # name_similarity [0-5], name_counts [27-32], advanced_name [35-38]
    # removed -> [6..26, 33, 34]
    expected = [FEATURE_NAMES_39[i] for i in list(range(6, 27)) + [33, 34]]
    assert NAMELESS_FEATURE_NAMES == expected


def test_nameless_view_projection(spark):
    df = spark.createDataFrame(
        [tuple(["a", "b"] + [float(i) for i in range(39)])],
        ["doc_id_1", "doc_id_2"] + FEATURE_NAMES_39,
    )
    view = nameless_feature_view(df)
    assert view.columns == ["doc_id_1", "doc_id_2"] + NAMELESS_FEATURE_NAMES
    row = view.collect()[0]
    assert row["affiliation_overlap"] == 6.0  # index 6 survives
    assert "jaro" not in view.columns  # index 38 dropped


def test_blended_score_is_mean_of_two_logistics(spark):
    df = spark.createDataFrame(
        [(0.8, 0.2), (0.1, 0.9)], "f_main double, f_nameless double"
    )
    out = score_pairs_blended(
        df,
        weights_main={"f_main": 2.0, "bias": -1.0},
        weights_nameless={"f_nameless": 3.0, "bias": -0.5},
    ).collect()

    def sig(z):
        return 1.0 / (1.0 + math.exp(-z))

    for r in out:
        want = (sig(-1.0 + 2.0 * r["f_main"]) + sig(-0.5 + 3.0 * r["f_nameless"])) / 2
        assert r["score"] == pytest.approx(want)


def test_standard_scaler_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(3.0, 2.5, size=(200, 2))
    X[:, 1] = 5.0  # constant feature -> std guard
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in X], "fa double, fb double"
    )
    scaler = fit_standard_scaler(df, ["fa", "fb"])
    assert scaler["fa"][0] == pytest.approx(X[:, 0].mean())
    assert scaler["fa"][1] == pytest.approx(X[:, 0].std())  # ddof=0
    assert scaler["fb"] == (pytest.approx(5.0), 1.0)

    got = np.array(
        [r["fa"] for r in apply_standard_scaler(df, scaler).collect()]
    )
    want = (X[:, 0] - X[:, 0].mean()) / X[:, 0].std()
    assert np.allclose(sorted(got), sorted(want))


def _roc_auc_py(y, s):
    pos = [si for yi, si in zip(y, s) if yi == 1]
    neg = [si for yi, si in zip(y, s) if yi == 0]
    u = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return u / (len(pos) * len(neg))


def _ap_py(y, s):
    order = sorted(range(len(s)), key=lambda i: -s[i])
    thresholds = sorted(set(s), reverse=True)
    P = sum(y)
    ap, prev_r = 0.0, 0.0
    for t in thresholds:
        tp = sum(1 for i in order if s[i] >= t and y[i] == 1)
        fp = sum(1 for i in order if s[i] >= t and y[i] == 0)
        r = tp / P
        ap += (r - prev_r) * (tp / (tp + fp))
        prev_r = r
    return ap


@pytest.mark.parametrize("seed", [1, 2])
def test_auroc_ap_match_reference_impl(spark, seed):
    rng = np.random.default_rng(seed)
    y = [int(v) for v in rng.integers(0, 2, 12)]
    if sum(y) in (0, 12):
        y[0] = 1 - y[0]
    # include ties to exercise the tie-correction
    s = [round(float(v), 1) for v in rng.uniform(0, 1, 12)]
    df = spark.createDataFrame(
        list(zip(y, s)), "label int, score double"
    )
    got = auroc_ap(df)
    assert got["auroc"] == pytest.approx(_roc_auc_py(y, s))
    assert got["average_precision"] == pytest.approx(_ap_py(y, s))
