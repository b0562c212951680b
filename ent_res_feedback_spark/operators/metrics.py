"""Cluster-quality metrics as DataFrame aggregations (SURVEY.md §2.9).

- pairwise_prf: the claims-eval / acceptance-metric shape (A7, reference
  s2and/eval.py:871-1061): join labeled pairs to predicted co-membership,
  count TP/FP/FN/TN, derive P/R/F1.
- b3: B-cubed precision/recall/F1 (A1, reference eval.py:616-720) via the
  contingency groupBy — per-item precision |pred∩true|/|pred| averaged
  over items, computed without any per-item loop.
- pairwise_cluster_prf: all-intra-pair P/R/F1 with the singleton self-pair
  correction (A2, reference eval.py:723-783, arXiv:1808.04216).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_prf(labeled_pairs: DataFrame, assignments: DataFrame) -> dict:
    """A7 — labeled_pairs(doc_id_1, doc_id_2, label) vs
    assignments(doc_id, cluster_id). Returns tp/fp/fn/tn + P/R/F1."""
    a1 = assignments.select(
        F.col("doc_id").alias("doc_id_1"), F.col("cluster_id").alias("c1")
    )
    a2 = assignments.select(
        F.col("doc_id").alias("doc_id_2"), F.col("cluster_id").alias("c2")
    )
    joined = labeled_pairs.join(a1, "doc_id_1").join(a2, "doc_id_2")
    same = (F.col("c1") == F.col("c2")).cast("int")
    row = joined.agg(
        F.sum(((F.col("label") == 1).cast("int") * same)).alias("tp"),
        F.sum(((F.col("label") == 1).cast("int") * (1 - same))).alias("fn"),
        F.sum(((F.col("label") == 0).cast("int") * same)).alias("fp"),
        F.sum(((F.col("label") == 0).cast("int") * (1 - same))).alias("tn"),
    ).collect()[0]
    tp, fn, fp, tn = (int(row[k] or 0) for k in ("tp", "fn", "fp", "tn"))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def b3(pred: DataFrame, gold: DataFrame, id_col: str = "doc_id") -> dict:
    """A1 — B-cubed P/R/F1.

    pred(id, cluster_id), gold(id, cluster_id). For item i with predicted
    cluster P and gold cluster G: precision_i = |P∩G|/|P|,
    recall_i = |P∩G|/|G|; metric = mean over items. Expressed as:
    contingency counts n_{pg} (one groupBy), cluster sizes |P|, |G|
    (two groupBys), then sum_{pg} n_{pg} * (n_{pg}/|P|) / N etc. — every
    item in cell (p,g) shares the same per-item value.
    """
    p = pred.select(F.col(id_col).alias("id"), F.col("cluster_id").alias("pc"))
    g = gold.select(F.col(id_col).alias("id"), F.col("cluster_id").alias("gc"))
    j = p.join(g, "id")
    cont = j.groupBy("pc", "gc").count().withColumnRenamed("count", "npg")
    psize = j.groupBy("pc").count().withColumnRenamed("count", "np")
    gsize = j.groupBy("gc").count().withColumnRenamed("count", "ng")
    total = j.count()
    row = (
        cont.join(psize, "pc")
        .join(gsize, "gc")
        .agg(
            F.sum(F.col("npg") * F.col("npg") / F.col("np")).alias("psum"),
            F.sum(F.col("npg") * F.col("npg") / F.col("ng")).alias("rsum"),
        )
        .collect()[0]
    )
    precision = float(row["psum"]) / total if total else 1.0
    recall = float(row["rsum"]) / total if total else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1}


def pairwise_cluster_prf(pred: DataFrame, gold: DataFrame, id_col: str = "doc_id") -> dict:
    """A2 — P/R/F1 over all intra-cluster pairs, counting each item's
    self-pair (the singleton correction of arXiv:1808.04216 used by the
    reference at eval.py:723-783: without it singletons contribute
    nothing). Pair counts via n*(n+1)/2 on cluster sizes; intersection via
    the contingency table — no pair materialization."""
    p = pred.select(F.col(id_col).alias("id"), F.col("cluster_id").alias("pc"))
    g = gold.select(F.col(id_col).alias("id"), F.col("cluster_id").alias("gc"))
    j = p.join(g, "id")

    def pairs_with_self(df, col):
        return (
            df.groupBy(col)
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") + 1) / 2).alias("s"))
            .collect()[0]["s"]
        )

    n_pred = float(pairs_with_self(j, "pc") or 0)
    n_gold = float(pairs_with_self(j, "gc") or 0)
    n_both = float(
        j.groupBy("pc", "gc")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") + 1) / 2).alias("s"))
        .collect()[0]["s"]
        or 0
    )
    precision = n_both / n_pred if n_pred else 1.0
    recall = n_both / n_gold if n_gold else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1}
