"""Pairwise match scoring (SURVEY.md §2.7).

The reference trains LightGBM driver-side and serves it per-batch
(model.py:744-876); the rebuild's north-star score is a logistic fusion
of the name/affiliation features. Training happens driver-side on a
collected labeled sample (numpy gradient descent — training sets are
small by design); inference is a pure column expression (JVM-side,
whole-stage codegen) with the weights inlined as literals — the Spark
analog of broadcasting a fitted model.

Distance semantics: distance = 1 - match_probability
(reference model.py:283-284); deterministic constraints override via
``coalesce(constraint_dist, 1 - score)`` (model.py:297-298).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ent_res_feedback_spark.oracle import DEFAULT_WEIGHTS
from ent_res_feedback_spark.operators.features import FEATURE_COLS


def logistic_score_col(weights: dict | None = None, feature_cols=None) -> Column:
    """score = sigmoid(bias + sum_i w_i * f_i) as a column expression."""
    w = weights or DEFAULT_WEIGHTS
    cols = feature_cols or FEATURE_COLS
    z = F.lit(float(w["bias"]))
    for c in cols:
        z = z + F.lit(float(w[c])) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_pairs(
    features_df: DataFrame,
    weights: dict | None = None,
    feature_cols=None,
    out: str = "score",
) -> DataFrame:
    return features_df.withColumn(out, logistic_score_col(weights, feature_cols))


def final_distance(df: DataFrame, out: str = "dist") -> DataFrame:
    """coalesce(constraint, 1 - score): constraints override the model
    (reference model.py:297-298)."""
    return df.withColumn(
        out, F.coalesce(F.col("constraint_dist"), 1.0 - F.col("score"))
    )


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    feature_cols=None,
    l2: float = 1e-3,
    lr: float = 0.5,
    iters: int = 400,
    sample_weight: np.ndarray | None = None,
    seed: int = 42,
) -> dict:
    """Driver-side logistic regression (batch gradient descent, numpy).

    Used by the feedback loop to re-weight scoring from labeled pairs
    (SURVEY.md FB3: 'fold labels in, reweight logistic, re-cluster').
    Returns a weights dict in ``logistic_score_col`` format.
    """
    cols = list(feature_cols or FEATURE_COLS)
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    assert d == len(cols)
    sw = np.ones(n) if sample_weight is None else np.asarray(sample_weight, float)
    sw = sw / sw.sum() * n
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.01, d)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = (p - y) * sw
        gw = X.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    out = {c: float(wi) for c, wi in zip(cols, w)}
    out["bias"] = float(b)
    return out


def collect_training_sample(
    features_df: DataFrame,
    label_col: str,
    feature_cols=None,
    max_rows: int = 100_000,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded sample of labeled pairs -> numpy (X, y) on the driver.
    Mirrors the reference's 100k-pair training scale
    (preprocess_s2and_data.py:34-39)."""
    cols = list(feature_cols or FEATURE_COLS)
    labeled = features_df.where(F.col(label_col).isNotNull())
    n = labeled.count()
    frac = min(1.0, max_rows / max(n, 1))
    pdf = (
        labeled.sample(fraction=frac, seed=seed)
        .select(*cols, label_col)
        .toPandas()
    )
    X = pdf[cols].to_numpy(dtype=float)
    y = pdf[label_col].to_numpy(dtype=float)
    return X, y


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


# ---------------------------------------------------------------------------
# FE6 — StandardScaler (reference s2and/data.py:138-143 fits sklearn's
# StandardScaler on the pair features before the linear model). Fit is one
# distributed aggregation; transform is pure column arithmetic.
# ---------------------------------------------------------------------------

def fit_standard_scaler(
    features_df: DataFrame, feature_cols=None
) -> dict[str, tuple[float, float]]:
    """Population mean/std per feature (ddof=0, like sklearn). Returns
    {col: (mean, std)}; std 0 -> 1.0 (sklearn's constant-feature guard)."""
    cols = list(feature_cols or FEATURE_COLS)
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"{c}__mean"))
        aggs.append(F.var_pop(c).alias(f"{c}__var"))
    row = features_df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mean = float(row[f"{c}__mean"] or 0.0)
        var = float(row[f"{c}__var"] or 0.0)
        std = var ** 0.5
        out[c] = (mean, std if std > 0 else 1.0)
    return out


def apply_standard_scaler(
    features_df: DataFrame, scaler: dict[str, tuple[float, float]]
) -> DataFrame:
    """(x - mean) / std, JVM-side, weights inlined as literals."""
    out = features_df
    for c, (mean, std) in scaler.items():
        out = out.withColumn(c, (F.col(c) - F.lit(mean)) / F.lit(std))
    return out
