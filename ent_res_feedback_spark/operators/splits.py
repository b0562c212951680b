"""Train/val/test splitting — the reference's §3.1 step-5 lifecycle
operator (`split_cluster_signatures`, /root/reference/s2and/data.py:977-1040)
re-expressed Spark-first.

Three modes, mirroring the reference's ``unit_of_data_split``:

- **blocks** (`split_blocks`, reference `split_blocks_helper`
  data.py:908-953): KMeans-stratify blocks by SIZE, then split blocks
  within each stratum by seeded rank — train/val/test keep the same
  block-size mix. The reference runs sklearn KMeans + sklearn
  train_test_split; the restatement keeps the same shape with a
  deterministic, engine-portable core: an exact-integer 1-D Lloyd over
  the (distinct size, block count) histogram on the driver (the
  histogram is bounded by the largest block size, never by corpus
  size), and an md5-rank split within strata executed distributed.
- **signatures** (`split_signatures`): seeded uniform split of ids.
- **time** (`split_time`): contiguous split over a sort by year
  (missing year -> 0), exactly the reference's truncation arithmetic.

Every rule is replayable in ANSI SQL (md5 ranks, floor thresholds,
exact-integer centroid rationals), so the driver oracle checks the
blocks mode hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed Lloyd iteration budget — the SQL oracle unrolls exactly this
#: many iterations; extra iterations after convergence are no-ops, so
#: the Python side may early-exit on a fixpoint without divergence
KMEANS_ITERS = 10


def kmeans_strata_1d(
    weighted_sizes: list[tuple[int, int]], k: int, iters: int = KMEANS_ITERS
) -> dict[int, int]:
    """Exact-arithmetic 1-D Lloyd over a (size, count) histogram ->
    {size: 0-based stratum}.

    Centroids are kept as integer rationals (S, W) = (sum of weighted
    sizes, sum of weights); the only floating-point op is the per-element
    distance ``abs(size - S/W)`` — a single IEEE division and
    subtraction that any engine reproduces bit-exactly, so the SQL
    replay cannot drift. Exactness bound: this holds while S = sum(w*s)
    and W = sum(w) each stay below 2^53 — beyond that the SQL side's
    S::DOUBLE / W::DOUBLE (two roundings) can diverge from Python's
    correctly-rounded big-int division. W < 2^53 is ~9e15 documents
    (above the 1e12 design point) and S < 2^53 allows e.g. 1e12 docs at
    average block size 9000, so the bound is not binding at target
    scale; for corpora beyond it, downscale the histogram weights
    before the Lloyd loop. Init: k evenly-rank-spaced distinct sizes
    (deterministic); ties in assignment break toward the smaller
    centroid index; empty centroids keep their previous value.
    """
    ss = sorted(s for s, _ in weighted_sizes)
    w = dict(weighted_sizes)
    m = len(ss)
    if m == 0:
        return {}
    k = max(1, k)
    cents: list[tuple[int, int]] = []
    for j in range(k):
        idx = (j * (m - 1)) // max(k - 1, 1)
        cents.append((ss[idx], 1))

    def nearest(s: int) -> int:
        return min(range(k), key=lambda j: (abs(s - cents[j][0] / cents[j][1]), j))

    assign: dict[int, int] = {}
    for _ in range(iters):
        assign = {s: nearest(s) for s in ss}
        new: list[tuple[int, int]] = []
        for j in range(k):
            mine = [s for s in ss if assign[s] == j]
            if mine:
                new.append(
                    (sum(w[s] * s for s in mine), sum(w[s] for s in mine))
                )
            else:
                new.append(cents[j])
        if new == cents:
            break  # fixpoint: the SQL's remaining iterations are no-ops
        cents = new
    assign = {s: nearest(s) for s in ss}
    return assign


def _split_col(rn, cnt, ratios: tuple[float, float, float]):
    """rank -> split label with floor(n*ratio + 0.5) thresholds — plain
    IEEE double products, identical in Spark and any SQL engine."""
    tr, va, _te = ratios
    t1 = F.floor(cnt * F.lit(tr) + F.lit(0.5))
    t2 = F.floor(cnt * F.lit(tr + va) + F.lit(0.5))
    return (
        F.when(rn <= t1, F.lit("train"))
        .when(rn <= t2, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_blocks(
    mentions: DataFrame,
    block_col: str = "block_key",
    k: int = 1,
    seed: int = 1111,
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
    iters: int = KMEANS_ITERS,
    exact: bool = True,
) -> DataFrame:
    """Reference `split_blocks_helper` (data.py:908-953) -> one row per
    block: (block_key, block_size, stratum, split).

    Shuffle shape: one groupBy on the block key (sizes), a collect of
    the DISTINCT-size histogram (bounded by max block size, not corpus
    size), a broadcast join of the size->stratum map, and one window
    rank within strata. Nothing quadratic, nothing keyed on doc ids.

    ``exact=True`` reproduces the reference's exact per-stratum counts
    via a rank window partitioned by stratum — fine up to ~1e8 blocks
    (k partitions carry the sort). ``exact=False`` is the 100 TB path:
    each block draws a uniform [0,1) value from its md5 (first 13 hex
    chars / 16^13) and splits by threshold — embarrassingly parallel,
    no window, proportions exact to ~1/sqrt(n) per stratum. Both modes
    are seed-stable and SQL-replayable.
    """
    spark = mentions.sparkSession
    bs = mentions.groupBy(block_col).agg(F.count("*").alias("block_size"))
    hist = (
        bs.groupBy("block_size")
        .agg(F.count("*").alias("cnt"))
        .collect()  # bounded: one row per distinct block SIZE
    )
    strata = kmeans_strata_1d(
        [(r["block_size"], r["cnt"]) for r in hist], k, iters
    )
    map_df = spark.createDataFrame(
        [(int(s), int(j)) for s, j in strata.items()],
        "block_size bigint, stratum int",
    )
    sized = bs.join(F.broadcast(map_df), "block_size")
    order_key = F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(block_col))
    )
    if not exact:
        # hash-threshold draw: u = int(md5[:13], 16) / 16^13 in [0, 1)
        tr, va, _ = ratios
        u = F.conv(F.substring(order_key, 1, 13), 16, 10).cast("double") / F.lit(
            float(16**13)
        )
        return sized.select(
            F.col(block_col),
            F.col("block_size"),
            F.col("stratum").cast("bigint").alias("stratum"),
            F.when(u < F.lit(tr), F.lit("train"))
            .when(u < F.lit(tr + va), F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    w_rank = Window.partitionBy("stratum").orderBy(order_key, F.col(block_col))
    w_cnt = Window.partitionBy("stratum")
    ranked = sized.select(
        F.col(block_col),
        F.col("block_size"),
        F.col("stratum"),
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_cnt).alias("cnt"),
    )
    return ranked.select(
        F.col(block_col),
        F.col("block_size"),
        F.col("stratum").cast("bigint").alias("stratum"),
        _split_col(F.col("rn"), F.col("cnt"), ratios).alias("split"),
    )


def split_signatures(
    mentions: DataFrame,
    id_col: str = "doc_id",
    seed: int = 1111,
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
    exact: bool = True,
) -> DataFrame:
    """Reference 'signatures' mode (data.py:992-1008): seeded uniform
    split of ids -> (id, split). md5 rank replaces sklearn's shuffled
    index: same semantics (uniform, seed-stable), engine-portable.

    ``exact=True`` gives exact counts via a global rank (single-reducer
    sort — fine to ~1e8 rows). ``exact=False`` is the 100 TB path:
    per-row md5-threshold draw, no shuffle at all, proportions exact to
    ~1/sqrt(n)."""
    order_key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col)))
    if not exact:
        tr, va, _ = ratios
        u = F.conv(F.substring(order_key, 1, 13), 16, 10).cast("double") / F.lit(
            float(16**13)
        )
        return mentions.select(
            F.col(id_col),
            F.when(u < F.lit(tr), F.lit("train"))
            .when(u < F.lit(tr + va), F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    w_rank = Window.orderBy(order_key, F.col(id_col))
    w_all = Window.partitionBy()
    ranked = mentions.select(
        F.col(id_col),
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("cnt"),
    )
    return ranked.select(
        id_col, _split_col(F.col("rn"), F.col("cnt"), ratios).alias("split")
    )


def split_time(
    mentions: DataFrame,
    id_col: str = "doc_id",
    year_col: str = "year",
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
    exact: bool = True,
) -> DataFrame:
    """Reference 'time' mode (data.py:1010-1030): sort by year (missing
    -> 0), contiguous truncation split: train = first int(n*train),
    val = next int(n*val), test = the rest — the reference's exact
    arithmetic.

    ``exact=False`` is the 100 TB path: boundary YEARS come from
    approxQuantile (no global sort/rank); rows split by comparing their
    year to the two boundaries. Contiguity in time is preserved exactly;
    the counts are approximate at the boundary years."""
    tr, va, _ = ratios
    yr = F.coalesce(F.col(year_col), F.lit(0))
    if not exact:
        y_tr, y_va = mentions.select(
            yr.cast("double").alias("_y")
        ).approxQuantile("_y", [tr, tr + va], 0.001)
        return mentions.select(
            F.col(id_col),
            F.when(yr <= F.lit(y_tr), F.lit("train"))
            .when(yr <= F.lit(y_va), F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    w_rank = Window.orderBy(
        F.coalesce(F.col(year_col), F.lit(0)), F.col(id_col)
    )
    w_all = Window.partitionBy()
    ranked = mentions.select(
        F.col(id_col),
        F.coalesce(F.col(year_col), F.lit(0)).alias("_yr"),
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("cnt"),
    )
    t1 = F.floor(F.col("cnt") * F.lit(tr))
    t2 = t1 + F.floor(F.col("cnt") * F.lit(va))
    return ranked.select(
        id_col,
        F.when(F.col("rn") <= t1, F.lit("train"))
        .when(F.col("rn") <= t2, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
