"""Incremental cluster assignment (SURVEY.md §2.11, I1).

Reference: ``Clusterer.predict_incremental`` (s2and/model.py:533-741) —
new signatures are assigned to existing clusters by the AVERAGE distance
over all (new, member) pairs, to the argmin cluster if below eps;
leftovers re-cluster among themselves as new clusters.

Spark restatement: block-scoped join of new docs x cluster members ->
score -> groupBy(new_id, cluster).avg(dist) -> rank-1 window +
eps filter -> leftovers go through the normal pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.constraints import apply_constraints
from ent_res_feedback_spark.operators.features import mention_pair_features
from ent_res_feedback_spark.operators.mentions import extract_mentions
from ent_res_feedback_spark.operators.scoring import score_pairs
from ent_res_feedback_spark.pipeline import ERConfig, MENTION_COLS, run_pipeline


def _score_cross_pairs(new_m: DataFrame, member_m: DataFrame, cfg: ERConfig) -> DataFrame:
    """Score (new x member) pairs within shared blocks — same featurize/
    constraint/score stack as the batch pipeline, but a two-sided join
    instead of a self-join."""
    left = new_m.select(
        *[F.col(c).alias(c + "_1") for c in MENTION_COLS if c != "block_key"],
        "block_key",
    )
    right = member_m.select(
        *[F.col(c).alias(c + "_2") for c in MENTION_COLS if c != "block_key"],
        "block_key",
        F.col("cluster_id"),
    )
    pairs = left.join(right, "block_key")
    pairs = apply_constraints(pairs, seeds=None)
    unconstrained = pairs.where(F.col("constraint_dist").isNull())
    scored_u = score_pairs(mention_pair_features(unconstrained), cfg.weights).select(
        "doc_id_1", "cluster_id", (1.0 - F.col("score")).alias("dist")
    )
    scored_c = pairs.where(F.col("constraint_dist").isNotNull()).select(
        "doc_id_1", "cluster_id", F.col("constraint_dist").alias("dist")
    )
    return scored_u.unionByName(scored_c)


def assign_incremental(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    existing_clusters: DataFrame,  # (doc_id, cluster_id)
    config: ERConfig | None = None,
    eps: float | None = None,
) -> DataFrame:
    """Returns (doc_id, cluster_id) for ALL docs: existing keep their
    cluster; new docs join the argmin-average-distance cluster when that
    average < eps (reference model.py:533-741); the rest form new
    clusters via the batch pipeline among themselves."""
    cfg = config or ERConfig()
    eps = (1.0 - cfg.tau) if eps is None else eps

    new_m = extract_mentions(new_docs, ascii_fast_path=cfg.ascii_fast_path).select(
        *MENTION_COLS
    )
    member_m = (
        extract_mentions(existing_docs, ascii_fast_path=cfg.ascii_fast_path)
        .select(*MENTION_COLS)
        .join(existing_clusters, "doc_id")
    )

    scored = _score_cross_pairs(new_m, member_m, cfg)
    avg = scored.groupBy("doc_id_1", "cluster_id").agg(F.avg("dist").alias("avg_dist"))
    w = Window.partitionBy("doc_id_1").orderBy(
        F.col("avg_dist").asc(), F.col("cluster_id").asc()
    )
    best = (
        avg.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") == 1) & (F.col("avg_dist") < eps))
        .select(F.col("doc_id_1").alias("doc_id"), "cluster_id")
    )

    leftovers = new_docs.join(best, "doc_id", "left_anti")
    leftover_clusters = run_pipeline(leftovers, cfg)["clusters"].select(
        "doc_id", "cluster_id"
    )
    return (
        existing_clusters.select("doc_id", "cluster_id")
        .unionByName(best)
        .unionByName(leftover_clusters)
    )
