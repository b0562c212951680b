"""Similarity search: brute-force top-k vs numpy oracle; LSH ANN recall;
numpy mapInPandas variant agrees with the column-expression variant."""

import numpy as np
import pytest

from ent_res_feedback_spark.operators import similarity


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    X = rng.standard_normal((60, 16)).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, X


def _numpy_topk(X, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    out = {}
    for i in range(len(X)):
        order = sorted(range(len(X)), key=lambda j: (-S[i, j], j))[:k]
        out[i] = [(j, S[i, j]) for j in order]
    return out


def test_brute_force_topk_matches_numpy(spark, emb_df):
    df, X = emb_df
    k = 4
    got = {}
    for r in similarity.brute_force_topk(df, k=k).collect():
        got.setdefault(r["id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    want = _numpy_topk(X.astype(np.float64), k)
    for i in want:
        got_i = [n for _, n, _ in sorted(got[i])]
        want_i = [n for n, _ in want[i]]
        assert got_i == want_i, f"id {i}"
        for (_, n, c), (wn, wc) in zip(sorted(got[i]), want[i]):
            assert c == pytest.approx(wc, abs=1e-9)


def test_numpy_variant_matches_column_variant(spark, emb_df):
    df, X = emb_df
    k = 3
    a = {
        (r["id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk(df, k=k).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk_numpy(df, df, k=k).collect()
    }
    assert a == b


def test_ann_lsh_recall_reasonable(spark, emb_df):
    df, X = emb_df
    exact = {
        r["id"]: r["neighbor_id"]
        for r in similarity.brute_force_topk(df, k=1).collect()
    }
    ann = {}
    for r in similarity.ann_topk_lsh(
        df, k=1, num_planes=2, num_tables=8, dim=16
    ).collect():
        ann[r["id"]] = r["neighbor_id"]
    hits = sum(1 for i in exact if ann.get(i) == exact[i])
    recall = hits / len(exact)
    # 8 tables x 2 planes: expected recall@1 ~0.9+ even on random vectors
    assert recall >= 0.7, recall


def test_hyperplane_buckets_deterministic(spark, emb_df):
    df, _ = emb_df
    a = {
        r["vec_id"]: r["lsh_bucket"]
        for r in similarity.hyperplane_lsh_buckets(df, 6, 16).collect()
    }
    b = {
        r["vec_id"]: r["lsh_bucket"]
        for r in similarity.hyperplane_lsh_buckets(df, 6, 16).collect()
    }
    assert a == b


def test_embedding_cosine_duplicates_finds_planted_dups(spark):
    rng = np.random.default_rng(7)
    X = rng.standard_normal((40, 16)).astype(np.float32)
    # plant near-duplicates: rows 40..44 are tiny perturbations of 0..4
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    for j in range(5):
        v = X[j] + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append((40 + j, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in similarity.embedding_cosine_duplicates(
            df, threshold=0.95, num_planes=2, num_tables=8, dim=16, seed=42
        ).collect()
    }
    planted = {(j, 40 + j) for j in range(5)}
    # multi-table LSH at 2 planes x 8 tables: miss probability per planted
    # pair ~ (1 - p^2)^8 with p ~ 1 - angle/pi ~ 0.997 -> ~0; require all
    assert planted <= got
    # and nothing below threshold sneaks in: verify exact cosine of extras
    Xall = np.array([r[1] for r in rows])
    Xn = Xall / np.linalg.norm(Xall, axis=1, keepdims=True)
    for a, b in got:
        assert float(Xn[a] @ Xn[b]) >= 0.95 - 1e-9


def test_ivf_centroids_deterministic_md5_pick(spark, emb_df):
    df, X = emb_df
    import hashlib

    cents = similarity.ivf_centroids(df, n_centroids=4)
    order = sorted(range(len(X)), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want = [[float(x) for x in X[i]] for i in order[:4]]
    assert len(cents) == 4
    for got, exp in zip(cents, want):
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_ivf_topk_recall_and_exactness(spark, emb_df):
    df, X = emb_df
    k = 3
    got = {}
    for r in similarity.ivf_topk(df, k=k, n_centroids=8, n_probe=4).collect():
        got.setdefault(r["id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    want = _numpy_topk(X.astype(np.float64), k)
    # structural exactness: ranks contiguous, cosines match exact values
    Xn = X.astype(np.float64)
    Xn = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
    hits = total = 0
    for i, rows in got.items():
        rows = sorted(rows)
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        for _, n, c in rows:
            assert c == pytest.approx(float(Xn[i] @ Xn[n]), abs=1e-9)
    # recall@1 against the exact top-1
    for i in want:
        total += 1
        top1 = want[i][0][0]
        if got.get(i) and sorted(got[i])[0][1] == top1:
            hits += 1
    assert hits / total >= 0.5, f"IVF recall@1 too low: {hits}/{total}"


@pytest.fixture(scope="module")
def clustered_emb_df(spark):
    """Seeded corpus WITH cluster structure (4 gaussian lobes): the shape
    where a trained codebook should beat the md5 pick."""
    rng = np.random.default_rng(1234)
    centers = rng.standard_normal((4, 16)) * 4.0
    X = np.vstack(
        [centers[i % 4] + rng.standard_normal(16) * 0.6 for i in range(80)]
    ).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, X


def test_ivf_kmeans_codebook_deterministic(spark, clustered_emb_df):
    df, _ = clustered_emb_df
    c1 = similarity.ivf_centroids_kmeans(df, n_centroids=4, iters=3)
    c2 = similarity.ivf_centroids_kmeans(df, n_centroids=4, iters=3)
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == 16


def test_ivf_kmeans_recall_at_least_md5(spark, clustered_emb_df):
    """Round-4 acceptance: the trained codebook's recall@1 must be >=
    the md5 stand-in's at identical n_centroids/n_probe."""
    df, X = clustered_emb_df
    exact = {i: v[0][0] for i, v in _numpy_topk(X, 1).items()}

    def recall(centroids):
        got = similarity.ivf_topk(
            df, k=1, n_centroids=8, n_probe=1, centroids=centroids
        ).collect()
        top = {r["id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
        return sum(top.get(i) == exact[i] for i in exact) / len(exact)

    md5_cents = similarity.ivf_centroids(df, n_centroids=8)
    km_cents = similarity.ivf_centroids_kmeans(df, n_centroids=8, iters=5)
    r_md5, r_km = recall(md5_cents), recall(km_cents)
    assert r_km >= r_md5, (r_km, r_md5)
    assert r_km >= 0.6, r_km
