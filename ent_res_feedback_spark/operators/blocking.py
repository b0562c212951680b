"""Blocking operators (SURVEY.md §2.3, B1-B4).

The reference materializes ``Dict[block_key -> List[signature_id]]``
(s2and/data.py:727-774); in Spark a block is just a key column — grouping
is implicit and never materialized. This module adds:

- the S2 first-initial+last-name key (B1, via functions.text.compute_block_key)
- block census / min-size filter (B3, reference model.py:115-142)
- MinHash-LSH band keys over span text (B4, the north-star blocking key)
- the block-size census that drives skew salting in operators/pairs.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ent_res_feedback_spark.functions import hashing
from ent_res_feedback_spark.functions.text import compute_block_key  # noqa: F401


def block_census(df: DataFrame, key: str = "block_key") -> DataFrame:
    """B3/A9 — per-block sizes and implied pair counts
    (reference e2e_scripts/preprocess_s2and_data.py:54-67). One shuffle;
    the result is small (one row per distinct key) and broadcastable."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("block_size"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2).cast("long").alias("n_pairs"),
    )


def filter_min_block_size(
    df: DataFrame, key: str = "block_key", min_size: int = 2
) -> DataFrame:
    """B3 — drop blocks smaller than ``min_size`` (singleton blocks produce
    no pairs; reference model.py:115-142). Census is broadcast back so the
    big side is filtered without a second wide shuffle."""
    census = block_census(df, key).where(F.col("block_size") >= min_size)
    return df.join(F.broadcast(census.select(key)), key, "inner")


def tokenize(col, pattern: str = r"\s+"):
    """Distinct non-empty tokens of a text column (JVM-side)."""
    return F.array_distinct(
        F.filter(F.split(col, pattern), lambda t: F.length(t) > 0)
    )


def word_shingles_from_tokens(toks, n: int = 3):
    """Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    array column. ``toks`` must be a bound attribute (the output of a
    prior projection), not an inline expression: the shingle transform
    references it ~3x per output element, and Catalyst inlines (and
    re-evaluates) non-attribute subtrees at every reference — measured
    43s -> 0.7s on 5k docs when the split/filter moved behind a Project
    boundary (CollapseProject keeps multi-referenced non-cheap aliases
    un-collapsed, so the two-step projection is load-bearing)."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    fallback = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(
        F.when(F.size(toks) >= n, shingles).otherwise(fallback)
    )


def split_tokens(col):
    """Non-empty whitespace tokens (order/duplicates preserved) — the
    shared pre-projection for ``word_shingles_from_tokens``."""
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingles (JVM-side). Shingling is what keeps
    MinHash discriminative on low-cardinality vocabularies: unigram token
    sets collide massively when the vocab is small, n-gram shingle space
    is vocab^n. Texts shorter than n words yield their full token string
    as a single shingle.

    PERFORMANCE: only use over a column that is *already* a cheap
    attribute; for anything derived (normalized text expressions),
    project ``split_tokens`` first and call
    ``word_shingles_from_tokens`` — see that function's docstring."""
    return word_shingles_from_tokens(split_tokens(col), n)


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    units_col,
    num_hashes: int,
    seed: int = 42,
    out: str = "minhash_sig",
) -> DataFrame:
    """MinHash signatures via explode + hash-once + groupBy(min x k).

    The naive nested column expression (array of k transform/array_min
    passes over an md5-hashed token array) re-evaluates the token hashing
    per hash function — measured minutes-per-partition at 5k docs. This
    form hashes each (id, unit) row exactly ONCE and computes the k
    minima as ordinary aggregates with map-side partial aggregation: one
    shuffle keyed by id, linear work, scales to arbitrary corpus size.
    Values are identical to functions/hashing.minhash_signature and to
    the DuckDB mirror (sql_minhash_expr).
    """
    params = hashing.minhash_params(num_hashes, seed)
    ex = df.select(F.col(id_col), F.explode(F.array_distinct(units_col)).alias("_u"))
    hashed = ex.select(id_col, hashing.token_hash32(F.col("_u")).alias("_h"))
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(hashing.MERSENNE61))
        ).alias(f"_mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)]).alias(out)
    )


def add_minhash_band_keys(
    df: DataFrame,
    text_col: str,
    num_bands: int = 4,
    rows_per_band: int = 4,
    seed: int = 42,
    out: str = "band_key",
    shingle_n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """B4 — MinHash-LSH blocking keys (north-star blocking).

    word-shingles (or tokens) -> portable md5 minhash signature via the
    explode+agg path (see minhash_signatures_df) -> ``num_bands`` band
    keys -> explode so each doc lands in one candidate bucket per band.
    Downstream all-pairs within a band key is the LSH candidate set;
    dedup across bands with the canonical (sid1<sid2) + distinct.
    """
    if shingle_n:
        # two-step projection: materialize the token array BEFORE the
        # shingle transform (word_shingles_from_tokens docstring — the
        # inline form re-evaluates the split per element access)
        units_df = df.select(
            id_col, split_tokens(F.col(text_col)).alias("_toks")
        ).select(
            id_col,
            word_shingles_from_tokens(F.col("_toks"), shingle_n).alias(
                "_units"
            ),
        )
    else:
        units_df = df.select(
            id_col, tokenize(F.col(text_col)).alias("_units")
        )
    sigs = minhash_signatures_df(
        units_df,
        id_col,
        F.col("_units"),
        num_bands * rows_per_band,
        seed,
    )
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *hashing.lsh_band_key_cols(
                    F.col("minhash_sig"), num_bands, rows_per_band
                )
            )
        ).alias(out),
    )
    return df.join(bands, id_col)


def hot_blocks(
    census: DataFrame, salt_threshold: int, key: str = "block_key"
) -> DataFrame:
    """Blocks whose size exceeds the salting threshold. Small by
    construction (there are few hot keys); always broadcastable."""
    return census.where(F.col("block_size") > salt_threshold).select(
        key, "block_size"
    )
