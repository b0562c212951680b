"""Structured-Streaming driver for incremental assignment.

The reference has no streaming — its closest analog is batch
``predict_incremental`` (s2and/model.py:533-741; SURVEY.md §2.11 marks
streaming N/A). This module is the thin glue that makes the batch
incremental operator consumable from a stream: micro-batches of new
documents arrive on any Structured Streaming source, and each batch is
assigned against the (growing) cluster state via ``foreachBatch``.

State contract: ``state_dir`` holds the current assignments + the raw
docs as parquet; each micro-batch reads it, assigns, and atomically
replaces it (write-new + rename, the same Iceberg-stand-in discipline as
operators/cc.CheckpointStore). Exactly-once per micro-batch comes from
Structured Streaming's checkpointing of the batch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ent_res_feedback_spark.operators.incremental import assign_incremental
from ent_res_feedback_spark.pipeline import ERConfig, run_pipeline


class IncrementalAssigner:
    """foreachBatch sink: maintains (docs, assignments) state under
    ``state_dir`` and assigns each micro-batch incrementally."""

    def __init__(self, spark: SparkSession, state_dir: str, config: ERConfig | None = None):
        self.spark = spark
        self.state_dir = state_dir
        self.cfg = config or ERConfig()
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _docs_path(self) -> str:
        return os.path.join(self.state_dir, "docs")

    @property
    def _assign_path(self) -> str:
        return os.path.join(self.state_dir, "assignments")

    def _has_state(self) -> bool:
        return os.path.exists(os.path.join(self._docs_path, "_SUCCESS"))

    def current_assignments(self) -> DataFrame:
        return self.spark.read.parquet(self._assign_path)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select("doc_id", "spans")
        if batch_df.isEmpty():
            return
        if not self._has_state():
            clusters = run_pipeline(batch_df, self.cfg)["clusters"].select(
                "doc_id", "cluster_id"
            )
            new_docs = batch_df
        else:
            existing_docs = self.spark.read.parquet(self._docs_path)
            existing_assign = self.current_assignments()
            # ignore re-deliveries of known doc_ids (idempotent upsert)
            fresh = batch_df.join(existing_docs, "doc_id", "left_anti")
            if fresh.isEmpty():
                return
            clusters = assign_incremental(
                fresh, existing_docs, existing_assign, self.cfg
            )
            new_docs = existing_docs.unionByName(fresh)

        # atomic replace: BOTH outputs are fully written to tmp paths before
        # either swap (their lineage lazily reads the current state dirs, so
        # swapping early would yank files out from under the second write)
        targets = ((new_docs, self._docs_path), (clusters, self._assign_path))
        for df, path in targets:
            df.write.mode("overwrite").parquet(path + ".tmp")
        import shutil

        for _, path in targets:
            bak = path + ".old"
            if os.path.exists(path):
                os.replace(path, bak)
            os.replace(path + ".tmp", path)
            shutil.rmtree(bak, ignore_errors=True)

    def attach(self, stream_df: DataFrame, checkpoint: str, **options):
        """Wire onto a streaming DataFrame of documents(doc_id, spans)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
