"""M1 hyper search: deterministic under seed, and the selected config's
validation AUROC must be >= the default-hyper fit's (the search can
always rediscover the default regime, so it never does worse on val)."""

import numpy as np
import pytest

from ent_res_feedback_spark.operators.metrics import auroc_ap
from ent_res_feedback_spark.operators.scoring import (
    fit_logistic,
    logistic_score_col,
    tune_logistic,
)

COLS = ["f1", "f2"]


def _frames(spark, n=400, seed=5):
    """Noisily separable 2-feature pair data, split train/val."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    f1 = y * 0.8 + rng.normal(0, 0.45, n)
    f2 = y * 0.3 + rng.normal(0, 0.6, n)
    rows = [(float(a), float(b), int(c)) for a, b, c in zip(f1, f2, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, label int")
    train, val = df.randomSplit([0.6, 0.4], seed=seed)
    return train, val


def test_tune_deterministic_and_not_worse_than_default(spark):
    train, val = _frames(spark)
    res = tune_logistic(
        train, val, "label", COLS, n_iter=6, seed=42,
        space={"iters": (50, 100)},
    )
    res2 = tune_logistic(
        train, val, "label", COLS, n_iter=6, seed=42,
        space={"iters": (50, 100)},
    )
    assert res["params"] == res2["params"]
    assert res["val_auroc"] == pytest.approx(res2["val_auroc"])
    assert len(res["trials"]) == 6

    # default-hyper baseline on the same splits
    from ent_res_feedback_spark.operators.scoring import collect_training_sample

    X, y = collect_training_sample(train, "label", COLS, seed=42)
    w_default = fit_logistic(X, y, COLS)
    base = auroc_ap(
        val.withColumn("__score", logistic_score_col(w_default, COLS)),
        label_col="label", score_col="__score",
    )["auroc"]
    assert res["val_auroc"] >= base - 1e-9
    assert res["val_auroc"] > 0.5  # genuinely learned signal


def test_tune_different_seed_changes_draws(spark):
    train, val = _frames(spark)
    a = tune_logistic(train, val, "label", COLS, n_iter=3, seed=1,
                      space={"iters": (50,)})
    b = tune_logistic(train, val, "label", COLS, n_iter=3, seed=2,
                      space={"iters": (50,)})
    assert [t["params"] for t in a["trials"]] != [t["params"] for t in b["trials"]]
