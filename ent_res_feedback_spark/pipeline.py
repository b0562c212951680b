"""End-to-end entity-resolution pipeline (the flagship job).

documents(doc_id, spans) ->
  mentions (normalize + blocking key, narrow) ->
  within-block pairs (skew-salted self-join, shuffle) ->
  constraint gate (cheap column chain BEFORE the UDFs — C2) ->
  featurize unconstrained pairs (Arrow-batched UDF + JVM exprs) ->
  logistic score -> dist = coalesce(constraint, 1-score) ->
  tau-filter edges -> large-star/small-star CC (checkpointed) ->
  clusters joined back onto source rows (spans carried untouched).

Physical shape (SURVEY.md §3.1 restatement): two wide shuffles (block
repartition implied by the join, CC iterations), everything else narrow;
constraint evaluation precedes the pandas UDFs so disallowed pairs never
pay for featurization; hot keys are salted per the census.

Emits a per-block *lineage* table (block -> sizes, pair counts, salt
decision) — the partition-level lineage metadata the feedback loop uses
to recompute only affected blocks — plus run metrics.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.blocking import block_census
from ent_res_feedback_spark.operators.cc import (
    components_with_singletons,
    connected_components,
)
from ent_res_feedback_spark.operators.constraints import apply_constraints
from ent_res_feedback_spark.operators.features import mention_pair_features
from ent_res_feedback_spark.operators.mentions import extract_mentions
from ent_res_feedback_spark.operators.pairs import within_block_pairs
from ent_res_feedback_spark.operators.scoring import score_pairs
from ent_res_feedback_spark.oracle import DEFAULT_TAU, DEFAULT_WEIGHTS

MENTION_COLS = ["doc_id", "block_key", "first", "middle", "last", "affil_norm"]


@dataclass
class ERConfig:
    tau: float = DEFAULT_TAU
    weights: dict = field(default_factory=lambda: dict(DEFAULT_WEIGHTS))
    salt_threshold: int | None = 2000
    num_salt_buckets: int = 8
    max_block_size: int | None = None
    checkpoint_dir: str | None = None
    ascii_fast_path: bool = False


def scored_pair_distances(
    docs: DataFrame,
    config: ERConfig | None = None,
    seeds: DataFrame | None = None,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """documents -> (doc_id_1, doc_id_2, block_key, score, constraint_dist,
    dist). The reusable first half of the pipeline (feedback re-scores it
    per affected block)."""
    cfg = config or ERConfig()
    if mentions is None:
        mentions = extract_mentions(docs, ascii_fast_path=cfg.ascii_fast_path)
    # nameless (e.g. media-only) documents carry no match evidence: exclude
    # from pairing — they'd otherwise all collide in block "" (quadratic).
    # Persist: this narrow UDF-derived frame feeds the census, the hot/cold
    # split, AND both join sides — without persistence the unicode-fold UDF
    # subtree re-executes for every consumer (measured 2-3x pipeline wall).
    slim = (
        mentions.select(*MENTION_COLS)
        .where(F.length("block_key") > 0)
        .persist()
    )
    pairs = within_block_pairs(
        slim,
        key="block_key",
        id_col="doc_id",
        salt_threshold=cfg.salt_threshold,
        num_salt_buckets=cfg.num_salt_buckets,
        max_block_size=cfg.max_block_size,
    )
    pairs = apply_constraints(pairs, seeds)

    # C2 gate: the expensive featurization UDFs only see unconstrained pairs.
    unconstrained = pairs.where(F.col("constraint_dist").isNull())
    featurized = score_pairs(mention_pair_features(unconstrained), cfg.weights)
    scored_u = featurized.select(
        "doc_id_1",
        "doc_id_2",
        "block_key",
        F.col("score"),
        F.col("constraint_dist"),
        (1.0 - F.col("score")).alias("dist"),
    )
    scored_c = pairs.where(F.col("constraint_dist").isNotNull()).select(
        "doc_id_1",
        "doc_id_2",
        "block_key",
        F.lit(None).cast("double").alias("score"),
        F.col("constraint_dist"),
        F.col("constraint_dist").alias("dist"),
    )
    return scored_u.unionByName(scored_c)


def run_pipeline(
    docs: DataFrame,
    config: ERConfig | None = None,
    seeds: DataFrame | None = None,
) -> dict:
    """Full pipeline. Returns dict with:

    clusters: (doc_id, cluster_id, spans) — spans are the SOURCE column,
              selected not rebuilt (span-sequence equality by construction)
    scored:   the pair-distance frame
    lineage:  per-block lineage/metrics table
    metrics:  driver-side dict (rows, clusters, wall seconds)
    """
    cfg = config or ERConfig()
    t0 = time.time()

    # scored is consumed ONCE on the main path (edge filter) — persisting it
    # would spill the full pair frame (O(pairs) bytes) for no reuse; callers
    # that iterate (the feedback loop) checkpoint it themselves.
    mentions = extract_mentions(docs, ascii_fast_path=cfg.ascii_fast_path)
    scored = scored_pair_distances(docs, cfg, seeds, mentions=mentions)
    edges = scored.where(F.col("dist") <= (1.0 - cfg.tau)).select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    assignments = connected_components(edges, checkpoint_dir=cfg.checkpoint_dir)
    clusters = components_with_singletons(
        assignments, docs, "doc_id"
    ).withColumnRenamed("component", "cluster_id")

    census = block_census(mentions.select(*MENTION_COLS))
    lineage = census.withColumn(
        "salted",
        (F.col("block_size") > cfg.salt_threshold)
        if cfg.salt_threshold is not None
        else F.lit(False),
    )

    n_docs = docs.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.time() - t0
    metrics = {
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "wall_sec": wall,
        "docs_per_sec": n_docs / wall if wall > 0 else None,
        "tau": cfg.tau,
    }
    return {
        "clusters": clusters,
        "scored": scored,
        "lineage": lineage,
        "metrics": metrics,
    }
