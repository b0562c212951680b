"""HAC parity path, sampling strategies, and the extra metrics (A3/A4/A6)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.hac import (
    cluster_blocks_hac,
    hac_average_linkage,
)
from ent_res_feedback_spark.operators.metrics import (
    cmacro_pairwise_f1,
    facet_eval,
    v_measure,
)
from ent_res_feedback_spark.operators.sampling import (
    balanced_sample,
    quadrant_labels,
    random_pair_sample,
    transitivity_preserving_subsample,
)


def test_hac_average_linkage_numpy():
    # two tight pairs far apart: {0,1} and {2,3}
    d = np.array(
        [
            [0.0, 0.1, 0.9, 0.95],
            [0.1, 0.0, 0.92, 0.9],
            [0.9, 0.92, 0.0, 0.05],
            [0.95, 0.9, 0.05, 0.0],
        ]
    )
    labels = hac_average_linkage(d, eps=0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]
    # eps below every distance -> all singletons
    assert len(set(hac_average_linkage(d, eps=0.01))) == 4
    # eps above everything -> one cluster
    assert len(set(hac_average_linkage(d, eps=2.0))) == 1


def test_hac_average_vs_single_linkage_divergence():
    """The chaining case: single linkage (CC) merges a chain that average
    linkage splits — the documented CL2-vs-CL6 divergence (SURVEY §7.4)."""
    # chain: 0-1 close, 1-2 close, 0-2 far
    d = np.array(
        [
            [0.0, 0.4, 0.99],
            [0.4, 0.0, 0.4],
            [0.99, 0.4, 0.0],
        ]
    )
    labels = hac_average_linkage(d, eps=0.45)
    # average linkage: after merging one close pair, the merged cluster's
    # average distance to the third point is (0.4+0.99)/2 = 0.695 > eps
    assert len(set(labels)) == 2


def test_cluster_blocks_hac(spark):
    pairs = spark.createDataFrame(
        [
            ("b1", "a", "b", 0.1),
            ("b1", "a", "c", 0.9),
            ("b1", "b", "c", 0.85),
            ("b2", "x", "y", 0.2),
        ],
        "block_key string, doc_id_1 string, doc_id_2 string, dist double",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in cluster_blocks_hac(pairs, eps=0.5).collect()}
    assert out["a"] == out["b"] != out["c"]
    assert out["x"] == out["y"]
    assert out["a"].startswith("b1_") and out["x"].startswith("b2_")


@pytest.fixture(scope="module")
def labeled_pairs_df(spark):
    rows = []
    # easy_pos, homonym, synonym, easy_neg x multiple
    for i in range(40):
        rows.append((f"p{i}a", f"p{i}b", "john smith", "john smith", 1))
        rows.append((f"h{i}a", f"h{i}b", "john smith", "john smith", 0))
        rows.append((f"s{i}a", f"s{i}b", "j smith", "john smith", 1))
        rows.append((f"n{i}a", f"n{i}b", "a jones", "b smith", 0))
    return spark.createDataFrame(
        rows, "doc_id_1 string, doc_id_2 string, name_norm_1 string, "
              "name_norm_2 string, label int"
    )


def test_quadrants_and_balanced_sample(labeled_pairs_df):
    q = quadrant_labels(labeled_pairs_df)
    counts = {r["quadrant"]: r["count"] for r in q.groupBy("quadrant").count().collect()}
    assert counts == {"easy_pos": 40, "homonym": 40, "synonym": 40, "easy_neg": 40}
    samp = balanced_sample(q, n_target=40, seed=7)
    got = {r["quadrant"]: r["count"] for r in samp.groupBy("quadrant").count().collect()}
    # ~10 per stratum, all strata present
    assert set(got) == set(counts)
    assert all(2 <= v <= 25 for v in got.values())


def test_random_sample_deterministic(labeled_pairs_df):
    a = {tuple(r) for r in random_pair_sample(labeled_pairs_df, 30, seed=5).collect()}
    b = {tuple(r) for r in random_pair_sample(labeled_pairs_df, 30, seed=5).collect()}
    assert a == b and 0 < len(a) <= 30


def test_transitivity_preserving_subsample(spark):
    # triangle a-b-c plus chain d-e: endpoints survive together
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("f", "g")],
        "doc_id_1 string, doc_id_2 string",
    )
    out = transitivity_preserving_subsample(pairs, n_target=3, seed=3)
    rows = {(r["doc_id_1"], r["doc_id_2"]) for r in out.collect()}
    kept_ids = {x for p in rows for x in p}
    # closure property: every original pair with both endpoints kept is present
    for p in [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("f", "g")]:
        if p[0] in kept_ids and p[1] in kept_ids:
            assert p in rows


def _clusters_df(spark, clusters):
    rows = [(str(i), str(c)) for c, ids in clusters.items() for i in ids]
    return spark.createDataFrame(rows, "doc_id string, cluster_id string")


def test_v_measure_identity_and_bounds(spark):
    gold = _clusters_df(spark, {"a": [1, 2, 3], "b": [4, 5]})
    assert v_measure(gold, gold) == pytest.approx(1.0)
    pred = _clusters_df(spark, {"x": [1, 2, 3, 4, 5]})
    v = v_measure(pred, gold)
    assert 0.0 <= v < 1.0


def test_cmacro_and_facets(spark):
    gold = _clusters_df(spark, {"g1": [1, 2], "g2": [3], "g3": [4, 5]})
    pred = _clusters_df(spark, {"p1": [1, 2], "p2": [3], "p3": [4], "p4": [5]})
    blocks = spark.createDataFrame(
        [(str(i), "blk1" if i <= 3 else "blk2") for i in range(1, 6)],
        "doc_id string, block_key string",
    )
    m = cmacro_pairwise_f1(pred, gold, blocks)
    # blk1 is perfectly clustered; blk2 splits a gold pair
    assert m["precision"] == pytest.approx(1.0)
    assert 0.5 < m["recall"] < 1.0
    facets = blocks.withColumnRenamed("block_key", "grp")
    fe = {r["facet"]: r for r in facet_eval(pred, gold, facets, "grp").collect()}
    assert fe["blk1"]["f1"] == pytest.approx(1.0)
    assert fe["blk2"]["f1"] < 1.0


def test_nn_chain_equals_naive_on_random_matrices():
    """Round-4: the O(n^2) nn-chain must produce the same flat partition
    as the O(n^3) global-argmin referee (average linkage is reducible ->
    unique monotone dendrogram on tie-free random matrices)."""
    import numpy as np

    from ent_res_feedback_spark.operators.hac import (
        hac_average_linkage,
        hac_average_linkage_naive,
    )

    rng = np.random.default_rng(4242)
    for n in (2, 3, 7, 20, 45):
        for eps in (0.1, 0.3, 0.5, 0.8):
            a = rng.random((n, n))
            d = (a + a.T) / 2
            np.fill_diagonal(d, 0.0)
            got = hac_average_linkage(d, eps)
            want = hac_average_linkage_naive(d, eps)
            assert got.tolist() == want.tolist(), (n, eps)


def test_nn_chain_500_node_block_under_2s():
    """Round-4 acceptance: a 500-node block must cluster in < 2s (the
    naive loop took tens of seconds at this size)."""
    import time

    import numpy as np

    from ent_res_feedback_spark.operators.hac import hac_average_linkage

    rng = np.random.default_rng(7)
    n = 500
    a = rng.random((n, n))
    d = (a + a.T) / 2
    np.fill_diagonal(d, 0.0)
    t0 = time.time()
    labels = hac_average_linkage(d, eps=0.4)
    wall = time.time() - t0
    assert wall < 2.0, f"500-node HAC took {wall:.2f}s"
    assert len(labels) == n
