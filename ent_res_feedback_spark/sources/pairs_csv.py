"""Labeled-pair CSV loader (SURVEY.md §2 S2).

Reference semantics (`/root/reference/s2and/data.py:699` loads the csv,
`:1290-1305` remaps labels): a comma-separated file with columns
``(pair_id_1, pair_id_2, label)`` where label is any of
``YES / NO / "0" / "1" / 0 / 1``; everything becomes int {0, 1}.
Unknown labels are rejected (the reference's ``.map`` would produce NaN
and silently poison training — here they raise at first action via an
ANSI-safe filter + count check, or can be dropped with
``on_bad_label="drop"``).

Spark-first shape: one ``spark.read.csv`` scan with explicit schema (no
inferSchema double-scan), ids canonicalized to ``doc_id_1 < doc_id_2`` to
match the engine's condensed-pair convention (operators/pairs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id_1", T.StringType()),
        T.StructField("doc_id_2", T.StringType()),
        T.StructField("label_raw", T.StringType()),
    ]
)

_LABEL_MAP = {"NO": 0, "YES": 1, "0": 0, "1": 1}


def load_labeled_pairs_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    on_bad_label: str = "error",
) -> DataFrame:
    """CSV -> (doc_id_1, doc_id_2, label:int) with ids canonically ordered.

    ``on_bad_label``: "error" (default) raises on any unmapped label at
    load time; "drop" filters those rows out.
    """
    raw = spark.read.csv(path, header=header, schema=_SCHEMA)
    mapping = F.create_map(
        *[F.lit(x) for kv in _LABEL_MAP.items() for x in kv]
    )
    df = raw.withColumn(
        "label", mapping[F.upper(F.trim(F.col("label_raw")))].cast("int")
    )
    if on_bad_label == "error":
        bad = df.where(F.col("label").isNull()).limit(1).collect()
        if bad:
            raise ValueError(
                f"unmapped pair label {bad[0]['label_raw']!r} in {path}; "
                "expected YES/NO/0/1"
            )
    else:
        df = df.where(F.col("label").isNotNull())
    swap = F.col("doc_id_1") > F.col("doc_id_2")
    return df.select(
        F.when(swap, F.col("doc_id_2")).otherwise(F.col("doc_id_1")).alias("doc_id_1"),
        F.when(swap, F.col("doc_id_1")).otherwise(F.col("doc_id_2")).alias("doc_id_2"),
        "label",
    )
