"""Within-block pair generation (SURVEY.md §2.4, P1-P5) — the skew-prone
self-join at the heart of the pipeline.

Reference semantics: for every block, all i<j signature pairs
(s2and/data.py:1346-1484, inference all-pairs data.py:1310-1324). The
reference enumerates them in a Python loop; here it is an equi-self-join
on the block key with the canonical ``sid1 < sid2`` predicate.

Scale design
------------
A hot key of size n yields n(n-1)/2 pairs in ONE post-shuffle partition —
the classic skew bottleneck at 10^12 docs. Two defenses, both explicit
(north rule) on top of AQE's skew-join splitting:

1. *Bucketed salting* (``within_block_pairs(salt_threshold=...)``): rows of
   hot blocks are hashed into ``s`` buckets; the left side replicates each
   row to bucket-pairs (b, q>=b) and the right side to (p<=b, b), so every
   unordered row pair meets in exactly one (key, p, q) task. A block of n
   becomes s(s+1)/2 tasks of ~(n/s)^2 work instead of one n^2 task.
2. *Pair-cap policy* (optional ``max_block_size``): drop blocks whose pair
   count would exceed the budget — the reference's own giant-block policy
   (data.py:149-173, make_s2and_mini_dataset.py big_block_cutoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.blocking import block_census


def _suffix(df: DataFrame, suffix: str, key: str, extra: list[str] | None = None) -> DataFrame:
    keep = [key] + (extra or [])
    return df.select(
        *[F.col(c).alias(c if c in keep else c + suffix) for c in df.columns]
    )


def _canonical(pairs: DataFrame, id_col: str) -> DataFrame:
    """Ensure sid1 < sid2 for every emitted pair (the reference's condensed
    upper-triangular layout, data.py:190-194, reduced to an ordering
    convention in long format)."""
    c1, c2 = F.col(id_col + "_1"), F.col(id_col + "_2")
    swap = c1 > c2
    out = pairs
    base = [c[:-2] for c in pairs.columns if c.endswith("_1")]
    for b in base:
        out = out.withColumn(
            f"__{b}_1", F.when(swap, F.col(b + "_2")).otherwise(F.col(b + "_1"))
        ).withColumn(
            f"__{b}_2", F.when(swap, F.col(b + "_1")).otherwise(F.col(b + "_2"))
        )
    for b in base:
        out = (
            out.drop(b + "_1", b + "_2")
            .withColumnRenamed(f"__{b}_1", b + "_1")
            .withColumnRenamed(f"__{b}_2", b + "_2")
        )
    return out


def within_block_pairs(
    df: DataFrame,
    key: str = "block_key",
    id_col: str = "doc_id",
    salt_threshold: int | None = None,
    num_salt_buckets: int = 8,
    max_block_size: int | None = None,
) -> DataFrame:
    """P1 — all unordered within-block pairs, columns suffixed _1/_2.

    Plain path: equi-join on ``key`` + ``id_1 < id_2`` theta filter.
    With ``salt_threshold``: blocks above it take the bucketed-salt path.
    """
    census = block_census(df, key)
    if max_block_size is not None:
        keep = census.where(F.col("block_size") <= max_block_size).select(key)
        df = df.join(F.broadcast(keep), key, "inner")
        census = census.where(F.col("block_size") <= max_block_size)

    if salt_threshold is None:
        left = _suffix(df, "_1", key)
        right = _suffix(df, "_2", key)
        return left.join(right, key).where(
            F.col(id_col + "_1") < F.col(id_col + "_2")
        )

    # UNIFIED salt path (round-6): cold blocks are just hot blocks with
    # ONE salt bucket, so both take the same exploded self-join — a cold
    # row sits in bucket 0 and covers only bucket-pair (0, 0), where the
    # (_p != _q) | (id1 < id2) predicate degenerates to the plain-path
    # id1 < id2. The former cold/hot split built four separate join
    # branches whose sides each re-derived the input AND the census: the
    # physical plan scanned the source 8x and aggregated the census 4x
    # per pair frame (plans/r06/er_pair_scores_before.txt). One branch =
    # 2 input scans + 1 census, and at 100 TB that is 6 fewer full-table
    # passes, not just fewer stages.
    s = num_salt_buckets
    hot_keys = census.where(F.col("block_size") > salt_threshold).select(
        key, F.lit(True).alias("_hot")
    )
    flagged = df.join(F.broadcast(hot_keys), key, "left")
    is_hot = F.col("_hot").isNotNull()
    bucket = F.when(
        is_hot, F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)).cast("int")
    ).otherwise(F.lit(0))
    hb = flagged.withColumn("_b", bucket).withColumn(
        "_hi", F.when(is_hot, F.lit(s - 1)).otherwise(F.lit(0))
    ).drop("_hot")
    # Left role: row in bucket b covers bucket-pairs (p=b, q=b.._hi).
    left = _suffix(
        hb.select(
            "*", F.explode(F.sequence(F.col("_b"), F.col("_hi"))).alias("_q")
        )
        .withColumnRenamed("_b", "_p")
        .drop("_hi"),
        "_1",
        key,
        extra=["_p", "_q"],
    )
    # Right role: row in bucket b covers bucket-pairs (p=0..b, q=b).
    right = _suffix(
        hb.select(
            "*", F.explode(F.sequence(F.lit(0), F.col("_b"))).alias("_p")
        )
        .withColumnRenamed("_b", "_q")
        .drop("_hi"),
        "_2",
        key,
        extra=["_p", "_q"],
    )
    pairs = (
        left.join(right, [key, "_p", "_q"])
        .where(
            # same bucket: dedupe with id order; cross bucket: each
            # unordered pair meets exactly once (left bucket < right bucket)
            (F.col("_p") != F.col("_q"))
            | (F.col(id_col + "_1") < F.col(id_col + "_2"))
        )
        .drop("_p", "_q")
    )
    # Cross-bucket pairs may arrive id-unordered; canonicalize (a no-op
    # for same-bucket and cold pairs, which are id-ordered already).
    pairs = _canonical(pairs, id_col)
    # ids are unique so self-pairs cannot occur; keep a cheap guard
    return pairs.where(F.col(id_col + "_1") != F.col(id_col + "_2"))


def candidate_pairs_from_band_keys(
    df: DataFrame,
    band_key: str = "band_key",
    id_col: str = "doc_id",
    carry: list[str] | None = None,
) -> DataFrame:
    """LSH candidate pairs: all-pairs within each band bucket, deduped
    across bands (a near-dup pair typically collides in several bands).
    ``carry`` columns are kept (suffixed) for downstream verification."""
    cols = [id_col] + (carry or [])
    slim = df.select(band_key, *cols)
    pairs = within_block_pairs(slim, key=band_key, id_col=id_col)
    return pairs.drop(band_key).distinct()
