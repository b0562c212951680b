"""Watermarked event-time aggregation over a document stream.

The reference is batch-only (SURVEY.md §2.11 scopes streaming to the
incremental assigner), but a 10^12-doc ingest pipeline needs the standard
Structured-Streaming shape for monitoring/lineage: event-time windowed
counts per blocking key with a watermark bounding state for late data.
This is that operator — pure `readStream`-compatible column expressions,
no custom state:

    docs stream (doc_id, block_key, event_time)
      -> withWatermark(event_time, late_allowance)
      -> groupBy(window(event_time, win), block_key).agg(...)

With watermarking, Spark finalizes and evicts a window's state once the
watermark passes its end — the state store stays O(active windows), not
O(stream length), which is what makes this viable on an unbounded
ingest. Output mode "append" emits each (window, block) row exactly once
when finalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_block_counts(
    stream_df: DataFrame,
    window_duration: str = "10 minutes",
    late_allowance: str = "5 minutes",
    time_col: str = "event_time",
    key_col: str = "block_key",
) -> DataFrame:
    """Event-time windowed per-block ingest stats with bounded state.

    Works on a streaming OR batch DataFrame (same plan — handy for tests
    and backfills). Returns (window_start, window_end, block_key, n_docs).
    """
    src = stream_df.withWatermark(time_col, late_allowance)
    agg = src.groupBy(
        F.window(F.col(time_col), window_duration).alias("w"),
        F.col(key_col),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_docs",
    )
