"""S2 labeled-pair CSV loader tests (reference data.py:699, :1290-1305)."""

import os

import pytest

from ent_res_feedback_spark.sources.pairs_csv import load_labeled_pairs_csv


def _write(tmp_path, rows, header="doc_id_1,doc_id_2,label"):
    p = os.path.join(str(tmp_path), "pairs.csv")
    with open(p, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    return p


def test_label_remap_and_canonical_order(spark, tmp_path):
    p = _write(
        tmp_path,
        [("d9", "d2", "YES"), ("d1", "d3", "NO"), ("d4", "d5", 1), ("d6", "d7", "0")],
    )
    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["label"]
        for r in load_labeled_pairs_csv(spark, p).collect()
    }
    # ids canonicalized (d9,d2) -> (d2,d9); labels YES/NO/1/"0" -> 1/0/1/0
    assert got == {
        ("d2", "d9"): 1,
        ("d1", "d3"): 0,
        ("d4", "d5"): 1,
        ("d6", "d7"): 0,
    }


def test_bad_label_raises_or_drops(spark, tmp_path):
    p = _write(tmp_path, [("a", "b", "MAYBE"), ("c", "d", "YES")])
    with pytest.raises(ValueError, match="MAYBE"):
        load_labeled_pairs_csv(spark, p)
    kept = load_labeled_pairs_csv(spark, p, on_bad_label="drop").collect()
    assert [(r["doc_id_1"], r["doc_id_2"], r["label"]) for r in kept] == [
        ("c", "d", 1)
    ]
