"""Per-block agglomerative clustering — the reference-parity path
(SURVEY.md CL2/CL3; reference FastCluster, s2and/model.py:992-1095).

Production clustering is threshold + connected components (operators/cc:
single linkage at tau, massively parallel). This module reproduces the
reference's AVERAGE-linkage HAC with a flat cut at ``eps`` so parity
harnesses can compare decisions per block. It runs as ``applyInPandas``
over block groups: blocks are small by construction (the pair cap / salt
census bounds them), so an O(n^3) numpy HAC per block is cheap and the
parallelism unit is the block — the same shape the reference gets from
fastcluster, without scipy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _nn_chain_merges(dist: np.ndarray) -> list[tuple[int, int, float]]:
    """Full average-linkage dendrogram of a square distance matrix as a
    merge list [(rep_keep, rep_drop, height)].

    O(n^2) nearest-neighbor-chain (Muellner, arXiv:1109.2378): average
    linkage is REDUCIBLE, so reciprocal nearest neighbors can be merged
    out of global-min order and still yield the unique monotone
    dendrogram. The merge list is eps-INDEPENDENT — build it once, cut
    it at any number of thresholds with ``_flat_cut`` (the single-pass
    ``tune_eps`` relies on exactly this).

    Tie caveat (locked by tests/test_tune_eps.py::test_tie_heavy_*): under
    exact distance ties the nn-chain may merge in a different ORDER than
    the naive global-argmin loop, so the flat partition can differ on
    tie-heavy matrices (e.g. block-constant distances) while remaining a
    valid average-linkage dendrogram; on tie-free matrices the two are
    provably identical (randomized equivalence tests)."""
    n = dist.shape[0]
    if n <= 1:
        return []
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    merges: list[tuple[int, int, float]] = []  # (rep_keep, rep_drop, height)
    chain: list[int] = []
    remaining = n
    while remaining > 1:
        if not chain:
            chain.append(int(np.argmax(active)))  # first active index
        while True:
            top = chain[-1]
            row = np.where(active, d[top], np.inf)
            row[top] = np.inf
            nn = int(np.argmin(row))
            h = row[nn]
            # tie-break toward the chain predecessor: guarantees the
            # reciprocal-NN pair is detected under exact ties
            if len(chain) >= 2 and d[top, chain[-2]] == h:
                nn = chain[-2]
            if len(chain) >= 2 and nn == chain[-2]:
                a, b = (top, nn) if top < nn else (nn, top)
                # Lance-Williams average update on the surviving rep a:
                # d(a+b, x) = (na*d(a,x) + nb*d(b,x)) / (na+nb)
                na, nb = size[a], size[b]
                upd = (na * d[a] + nb * d[b]) / (na + nb)
                d[a] = upd
                d[:, a] = upd
                d[a, a] = np.inf
                d[b, :] = np.inf
                d[:, b] = np.inf
                active[b] = False
                size[a] = na + nb
                merges.append((a, b, float(h)))
                chain.pop()
                chain.pop()
                remaining -= 1
                break
            chain.append(nn)
    return merges


def _flat_cut(
    n: int, merges: list[tuple[int, int, float]], eps: float
) -> np.ndarray:
    """Flat cut of a dendrogram at ``eps``: monotone heights mean merges
    with height <= eps form maximal subtrees — union exactly those.
    Returns integer labels ordered by each cluster's minimum member
    index (the labeling the naive greedy produces)."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, h in merges:
        if h <= eps:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(n)), dtype=int, count=n)
    labels = np.empty(n, dtype=int)
    for lab, root in enumerate(np.unique(roots)):  # sorted = min-member order
        labels[roots == root] = lab
    return labels


def hac_average_linkage(dist: np.ndarray, eps: float) -> np.ndarray:
    """Average-linkage agglomerative clustering on a square distance
    matrix; flat cut at ``eps`` (scipy ``fcluster(t=eps,
    criterion='distance')`` semantics on an average-linkage tree).
    nn-chain dendrogram (``_nn_chain_merges``) + union-find cut
    (``_flat_cut``); see those for complexity and tie notes."""
    n = dist.shape[0]
    if n == 0:
        return np.array([], dtype=int)
    if n == 1:
        return np.zeros(1, dtype=int)
    return _flat_cut(n, _nn_chain_merges(dist), eps)


def hac_average_linkage_naive(dist: np.ndarray, eps: float) -> np.ndarray:
    """The O(n^3) global-argmin reference implementation — retained as
    the referee for the nn-chain equivalence tests."""
    n = dist.shape[0]
    if n == 0:
        return np.array([], dtype=int)
    # cluster bookkeeping: active flag, member counts, average distances
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    members: list[list[int]] = [[i] for i in range(n)]
    while active.sum() > 1:
        sub = np.where(active)[0]
        dd = d[np.ix_(sub, sub)]
        k = np.argmin(dd)
        i, j = divmod(k, dd.shape[1])
        if dd[i, j] > eps:
            break
        a, b = sub[i], sub[j]
        # average linkage update: d(new, x) = (na*d(a,x) + nb*d(b,x)) / (na+nb)
        na, nb = size[a], size[b]
        for x in sub:
            if x == a or x == b:
                continue
            d[a, x] = d[x, a] = (na * d[a, x] + nb * d[b, x]) / (na + nb)
        size[a] = na + nb
        members[a].extend(members[b])
        active[b] = False
        d[b, :] = np.inf
        d[:, b] = np.inf
    labels = np.empty(n, dtype=int)
    for lab, root in enumerate(np.where(active)[0]):
        for m in members[root]:
            labels[m] = lab
    return labels


def cluster_blocks_hac(
    scored_pairs: DataFrame,
    eps: float = 0.5,
    block_col: str = "block_key",
    id_cols: tuple[str, str] = ("doc_id_1", "doc_id_2"),
    dist_col: str = "dist",
    missing_dist: float = 1.0,
) -> DataFrame:
    """CL3 — per-block HAC over the scored pair frame -> (doc_id,
    cluster_id) with cluster_id = '<block>_<label>' (reference emits
    block-qualified labels, model.py:529). Pairs absent from the frame
    (e.g. capped) default to ``missing_dist``."""
    id1, id2 = id_cols
    out_schema = "doc_id string, cluster_id string"

    def one_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block = key[0]
        ids = sorted(set(pdf[id1]) | set(pdf[id2]))
        idx = {x: i for i, x in enumerate(ids)}
        n = len(ids)
        dist = np.full((n, n), missing_dist, dtype=np.float64)
        np.fill_diagonal(dist, 0.0)
        for a, b, dv in zip(pdf[id1], pdf[id2], pdf[dist_col]):
            i, j = idx[a], idx[b]
            v = missing_dist if dv is None or np.isnan(dv) else float(dv)
            dist[i, j] = dist[j, i] = v
        labels = hac_average_linkage(dist, eps)
        return pd.DataFrame(
            {"doc_id": ids, "cluster_id": [f"{block}_{l}" for l in labels]}
        )

    slim = scored_pairs.select(block_col, id1, id2, dist_col)
    return slim.groupBy(block_col).applyInPandas(one_block, out_schema)


def cluster_blocks_hac_multi(
    scored_pairs: DataFrame,
    eps_list: list[float],
    block_col: str = "block_key",
    id_cols: tuple[str, str] = ("doc_id_1", "doc_id_2"),
    dist_col: str = "dist",
    missing_dist: float = 1.0,
) -> DataFrame:
    """CL3 multi-cut: per-block HAC labels at EVERY eps in ``eps_list``
    from ONE clustering pass -> (eps, doc_id, cluster_id).

    The nn-chain dendrogram is eps-independent, so each block builds its
    merge list once and cuts it len(eps_list) times (each cut is a cheap
    O(n alpha(n)) union-find replay) — versus ``cluster_blocks_hac`` in a
    loop, which re-shuffles the pair frame and re-builds every dendrogram
    per candidate. At 100 TB this collapses an eps sweep from k full
    clustering jobs to one."""
    id1, id2 = id_cols
    eps_sorted = [float(e) for e in eps_list]
    out_schema = "eps double, doc_id string, cluster_id string"

    def one_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block = key[0]
        ids = sorted(set(pdf[id1]) | set(pdf[id2]))
        idx = {x: i for i, x in enumerate(ids)}
        n = len(ids)
        dist = np.full((n, n), missing_dist, dtype=np.float64)
        np.fill_diagonal(dist, 0.0)
        for a, b, dv in zip(pdf[id1], pdf[id2], pdf[dist_col]):
            i, j = idx[a], idx[b]
            v = missing_dist if dv is None or np.isnan(dv) else float(dv)
            dist[i, j] = dist[j, i] = v
        merges = _nn_chain_merges(dist)
        frames = []
        for eps in eps_sorted:
            labels = (
                _flat_cut(n, merges, eps) if n > 1 else np.zeros(n, dtype=int)
            )
            frames.append(
                pd.DataFrame(
                    {
                        "eps": np.full(n, eps),
                        "doc_id": ids,
                        "cluster_id": [f"{block}_{l}" for l in labels],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    slim = scored_pairs.select(block_col, id1, id2, dist_col)
    return slim.groupBy(block_col).applyInPandas(one_block, out_schema)


def tune_eps(
    scored_pairs: DataFrame,
    gold: DataFrame,
    candidate_quantiles: list[float] | None = None,
    block_col: str = "block_key",
) -> tuple[float, dict]:
    """CL4/CL9 — eps tuning: candidate thresholds from approxQuantile over
    observed distances (the Spark restatement of the reference's
    KMeans-over-distances candidate generation, hac_inference.py:56-57),
    scored by B3 F1 against ``gold``.

    Single pass: ONE ``cluster_blocks_hac_multi`` job labels every
    candidate eps (the dendrogram is cut k times, built once), then ONE
    grouped aggregation computes B3 P/R/F1 for all eps simultaneously —
    the per-candidate contingency/size groupBys just carry ``eps`` as an
    extra grouping key. Replaces the k-job driver grid loop."""
    from pyspark.sql import functions as F

    qs = candidate_quantiles or [0.1, 0.25, 0.5, 0.75, 0.9]
    cands = scored_pairs.approxQuantile("dist", qs, 0.01)
    eps_list = sorted(set(round(c, 4) for c in cands))
    pred = cluster_blocks_hac_multi(
        scored_pairs, eps_list, block_col=block_col
    )
    g = gold.select(F.col("doc_id").alias("id"), F.col("cluster_id").alias("gc"))
    j = pred.select(
        "eps", F.col("doc_id").alias("id"), F.col("cluster_id").alias("pc")
    ).join(g, "id")
    cont = j.groupBy("eps", "pc", "gc").count().withColumnRenamed("count", "npg")
    psize = j.groupBy("eps", "pc").count().withColumnRenamed("count", "np")
    gsize = j.groupBy("eps", "gc").count().withColumnRenamed("count", "ng")
    rows = (
        cont.join(psize, ["eps", "pc"])
        .join(gsize, ["eps", "gc"])
        .groupBy("eps")
        .agg(
            F.sum(F.col("npg") * F.col("npg") / F.col("np")).alias("psum"),
            F.sum(F.col("npg") * F.col("npg") / F.col("ng")).alias("rsum"),
            F.sum("npg").alias("total"),
        )
        .collect()
    )
    best = (None, -1.0, None)
    for r in sorted(rows, key=lambda r: r["eps"]):  # ascending, as the old loop
        total = int(r["total"])
        # total = sum of contingency cells = number of joined items per eps
        precision = float(r["psum"]) / total if total else 1.0
        recall = float(r["rsum"]) / total if total else 1.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        m = {"precision": precision, "recall": recall, "f1": f1}
        # strict > keeps the LOWEST eps on F1 ties, matching the old
        # ascending-candidate grid loop's behavior
        if f1 > best[1]:
            best = (float(r["eps"]), f1, m)
    return best[0], {"f1": best[1], "metrics": best[2]}
