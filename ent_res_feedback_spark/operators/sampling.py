"""Pair sampling strategies (SURVEY.md §2.4 P2-P5).

Reference: s2and/sampling.py + the quadrant split in data.py:1385-1438 and
the transitivity-preserving subsample at data.py:1492-1701. Spark
restatements: the quadrant split is a label expression, balanced sampling
is ``sampleBy``, and the transitivity-preserving subsample is two
semi-joins (the condensed-index deletion math disappears in long format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quadrant_labels(
    pairs: DataFrame,
    name_cols: tuple[str, str] = ("name_norm_1", "name_norm_2"),
    label_col: str = "label",
    out: str = "quadrant",
) -> DataFrame:
    """P2 — homonym/synonym quadrants (reference data.py:1385-1438):
    classify labeled pairs by (same full name?, same cluster?):
      same name + same cluster  -> 'easy_pos'
      same name + diff cluster  -> 'homonym'   (hard negative)
      diff name + same cluster  -> 'synonym'   (hard positive)
      diff name + diff cluster  -> 'easy_neg'
    """
    n1, n2 = name_cols
    same_name = F.col(n1) == F.col(n2)
    same_cluster = F.col(label_col) == 1
    return pairs.withColumn(
        out,
        F.when(same_name & same_cluster, "easy_pos")
        .when(same_name & ~same_cluster, "homonym")
        .when(~same_name & same_cluster, "synonym")
        .otherwise("easy_neg"),
    )


def balanced_sample(
    pairs: DataFrame,
    n_target: int,
    stratum_col: str = "quadrant",
    seed: int = 1111,
) -> DataFrame:
    """P3 — balanced sampling: ~n_target/4 per quadrant (reference
    sampling.py:13-94 samples size/4 per quadrant). ``sampleBy`` with
    per-stratum fractions derived from one census pass."""
    counts = {
        r[stratum_col]: r["count"]
        for r in pairs.groupBy(stratum_col).count().collect()
    }
    per = max(n_target // max(len(counts), 1), 1)
    fractions = {k: min(per / v, 1.0) for k, v in counts.items() if v > 0}
    return pairs.sampleBy(stratum_col, fractions, seed)


def random_pair_sample(pairs: DataFrame, n: int, seed: int = 1111) -> DataFrame:
    """P4 — seeded uniform sample of ~n pairs (reference
    sampling.py:97-115). Fraction-based (no global sort)."""
    total = pairs.count()
    if total <= n:
        return pairs
    return pairs.sample(fraction=min(1.25 * n / total, 1.0), seed=seed).limit(n)


def transitivity_preserving_subsample(
    pairs: DataFrame,
    n_target: int,
    id_cols: tuple[str, str] = ("doc_id_1", "doc_id_2"),
    seed: int = 1111,
) -> DataFrame:
    """P5 — reference data.py:1492-1701: sample pairs, then keep only
    pairs whose BOTH endpoints survive, so within-block transitive
    structure is preserved. In long format this is: sample the NODE set
    (endpoints of a seeded pair sample), then two semi-joins — no
    condensed-index deletion math."""
    id1, id2 = id_cols
    sampled = random_pair_sample(pairs, n_target, seed)
    kept = (
        sampled.select(F.col(id1).alias("id"))
        .unionByName(sampled.select(F.col(id2).alias("id")))
        .distinct()
    )
    k1 = kept.withColumnRenamed("id", id1)
    k2 = kept.withColumnRenamed("id", id2)
    return pairs.join(k1, id1, "left_semi").join(k2, id2, "left_semi")
