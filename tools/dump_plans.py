#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query to plans/r06/
(<query>_<tag>.txt). Usage: python tools/dump_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:]) or None

    import __spark_entry__ as entry

    from ent_res_feedback_spark.session import get_spark

    spark = get_spark("dump-plans")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(outdir, exist_ok=True)
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
