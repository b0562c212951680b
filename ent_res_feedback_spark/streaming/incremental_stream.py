"""Structured-Streaming driver for incremental assignment.

The reference has no streaming — its closest analog is batch
``predict_incremental`` (s2and/model.py:533-741; SURVEY.md §2.11 marks
streaming N/A). This module is the thin glue that makes the batch
incremental operator consumable from a stream: micro-batches of new
documents arrive on any Structured Streaming source, and each batch is
assigned against the (growing) cluster state via ``foreachBatch``.

State contract: ``state_dir`` holds VERSIONED snapshots — each
micro-batch writes both tables (docs, assignments) into a fresh
``v=<n>/`` directory, then commits with ONE atomic manifest rename
covering both (the same Iceberg-snapshot discipline as
operators/cc.CheckpointStore). A crash at any point leaves the previous
version fully intact: both tables always come from the SAME committed
snapshot, so a batch can never be half-applied (docs updated but
assignments lost). Stale uncommitted version dirs are swept at startup.
Exactly-once per micro-batch comes from Structured Streaming's
checkpointing of the batch id.
"""

from __future__ import annotations

import json
import os
import shutil

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
        self._sweep_uncommitted()

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.state_dir, "STATE.json")

    def _manifest(self) -> dict | None:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return None

    def _sweep_uncommitted(self) -> None:
        """Remove version dirs not referenced by the committed manifest —
        leftovers of a crash between parquet write and manifest commit."""
        m = self._manifest()
        committed = m["version"] if m else None
        for name in os.listdir(self.state_dir):
            if name.startswith("v=") and name != f"v={committed}":
                shutil.rmtree(
                    os.path.join(self.state_dir, name), ignore_errors=True
                )

    def _has_state(self) -> bool:
        return self._manifest() is not None

    def _read(self, table: str) -> DataFrame:
        m = self._manifest()
        assert m is not None, "no committed state"
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"v={m['version']}", table)
        )

    def current_assignments(self) -> DataFrame:
        return self._read("assignments")

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
            existing_docs = self._read("docs")
            existing_assign = self.current_assignments()
            # ignore re-deliveries of known doc_ids (idempotent upsert)
            fresh = batch_df.join(existing_docs, "doc_id", "left_anti")
            if fresh.isEmpty():
                return
            clusters = assign_incremental(
                fresh, existing_docs, existing_assign, self.cfg
            )
            new_docs = existing_docs.unionByName(fresh)

        # write BOTH tables into a new version dir (reads of the current
        # version are untouched), then commit with one atomic rename
        m = self._manifest()
        prev_version = m["version"] if m else None
        version = (prev_version + 1) if prev_version is not None else 0
        vdir = os.path.join(self.state_dir, f"v={version}")
        new_docs.write.mode("overwrite").parquet(os.path.join(vdir, "docs"))
        clusters.write.mode("overwrite").parquet(
            os.path.join(vdir, "assignments")
        )
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self.manifest_path)
        if prev_version is not None:
            shutil.rmtree(
                os.path.join(self.state_dir, f"v={prev_version}"),
                ignore_errors=True,
            )

    def attach(self, stream_df: DataFrame, checkpoint: str, **options):
        """Wire onto a streaming DataFrame of documents(doc_id, spans)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
