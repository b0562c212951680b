#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, canonicalize
(columns sorted by name, rows sorted, floats rounded), compare row count,
schema (column names), and a value hash. Prints one JSON line per query.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import __spark_entry__ as entry

    from ent_res_feedback_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries, oracles = entry.queries(), entry.oracle_sql()
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec: dict = {"query": name}
        try:
            sdf = _canon(fn(spark, sf_dir).toPandas())
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = _canon(con.execute(oracles[name]).fetchdf())
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = list(sdf.columns) == list(odf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _hash(sdf) == _hash(odf)
                )
                if not rec["hash_match"]:
                    n_bad += 1
                    rec["spark_head"] = sdf.head(3).to_dict("records")
                    rec["oracle_head"] = odf.head(3).to_dict("records")
            else:
                rec["hash_match"] = None
        except Exception as e:  # noqa: BLE001 — report, keep going
            n_bad += 1
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        print(json.dumps(rec, default=str))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
