"""Round-5: threshold_sweep_components — one incremental union-find
pass must equal independent connected-components runs at every tau,
including min-id labeling and singleton handling."""

from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.cc import (
    components_with_singletons,
    connected_components,
    threshold_sweep_components,
)

PAIRS = "block_key string, doc_id_1 long, doc_id_2 long, score double"


def _scores(spark):
    rows = [
        # block A: chain 1-2-3 with falling scores, plus weak 3-4
        ("A", 1, 2, 0.90),
        ("A", 2, 3, 0.70),
        ("A", 1, 3, 0.40),
        ("A", 3, 4, 0.55),
        ("A", 1, 4, 0.10),
        ("A", 2, 4, 0.20),
        # block B: tight pair
        ("B", 10, 11, 0.95),
        # block C: all-weak triangle
        ("C", 20, 21, 0.30),
        ("C", 20, 22, 0.25),
        ("C", 21, 22, 0.28),
    ]
    return spark.createDataFrame(rows, PAIRS)


def test_sweep_matches_per_tau_cc(spark):
    scores = _scores(spark)
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],  # 99: no pair
        "doc_id long",
    )
    taus = [0.2, 0.5, 0.62, 0.8, 0.99]
    got = {
        (r["tau"], r["doc_id"]): r["cluster_id"]
        for r in threshold_sweep_components(scores, taus, docs).collect()
    }
    assert len(got) == len(taus) * 10
    for tau in taus:
        edges = scores.where(F.col("score") >= tau).select(
            F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
        )
        want = {
            r["doc_id"]: r["component"]
            for r in components_with_singletons(
                connected_components(edges), docs, "doc_id"
            ).collect()
        }
        for doc, comp in want.items():
            assert got[(tau, doc)] == comp, (tau, doc)


def test_sweep_threshold_is_inclusive(spark):
    """score >= tau admits the edge (same >= as er_edges), checked at an
    exact boundary value."""
    scores = spark.createDataFrame([("X", 1, 2, 0.5)], PAIRS)
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {
        (r["tau"], r["doc_id"]): r["cluster_id"]
        for r in threshold_sweep_components(scores, [0.5, 0.51], docs).collect()
    }
    assert got[(0.5, 2)] == 1  # merged at exactly tau
    assert got[(0.51, 2)] == 2  # not merged above
