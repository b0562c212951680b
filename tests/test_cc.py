"""Connected components: correctness vs a union-find oracle on random
graphs, determinism, and exact checkpoint resume (the north rule's
resumability requirement)."""

import random

import pytest
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.cc import (
    CheckpointStore,
    components_with_singletons,
    connected_components,
)
from ent_res_feedback_spark.oracle import UnionFind


def _oracle_components(edges, nodes):
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for s, d in edges:
        uf.union(s, d)
    comp = {}
    for n in nodes:
        comp[n] = uf.find(n)
    # canonical: min member id
    groups = {}
    for n, c in comp.items():
        groups.setdefault(c, []).append(n)
    return {n: min(g) for c, g in groups.items() for n in g}


@pytest.mark.parametrize("seed,n,m", [(1, 50, 40), (2, 200, 150), (3, 120, 300)])
@pytest.mark.parametrize("threshold", [None, 5_000_000, 60])
def test_cc_matches_union_find(spark, seed, n, m, threshold):
    """All three cost regimes must agree with the union-find oracle:
    threshold=None (pure star loop), 5M (immediate one-task finish), and
    60 (star rounds first, early finish once the survivor set shrinks
    below 60 mid-loop) — the early-finish switch point must never change
    the assignment."""
    rng = random.Random(seed)
    nodes = list(range(n))
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(s, d) for s, d in edges if s != d]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, finish_edge_threshold=threshold
        ).collect()
    }
    want = _oracle_components(edges, nodes)
    touched = {x for e in edges for x in e}
    assert {k: want[k] for k in touched} == got


def test_cc_string_ids(spark):
    edges = [("d3", "d1"), ("d1", "d2"), ("d9", "d8")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["component"] for r in connected_components(edf).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d8": "d8", "d9": "d8"}


def test_singletons(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], ["doc_id"])
    out = components_with_singletons(
        connected_components(edges), nodes, "doc_id"
    )
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_checkpoint_resume_identical(spark, tmp_path):
    """Kill-and-resume: run once with checkpointing, then simulate a crash
    by truncating the manifest to an early iteration and re-running — the
    resumed run must produce identical clusters (exact resume)."""
    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(260)]
    edf = spark.createDataFrame(edges, "src long, dst long").where("src != dst")

    full_dir = str(tmp_path / "full")
    # finish_edge_threshold=None: exercise the iterative store path (the
    # default early-finishes small graphs before any iteration lands)
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, checkpoint_dir=full_dir, finish_edge_threshold=None
        ).collect()
    }

    # fresh run, interrupted after iteration 0: keep iter=-1 and iter=0 only
    crash_dir = str(tmp_path / "crash")
    connected_components(
        edf, checkpoint_dir=crash_dir, finish_edge_threshold=None
    )
    store = CheckpointStore(spark, crash_dir)
    manifest = store._read_manifest()
    manifest["iterations"] = [it for it in manifest["iterations"] if it["iter"] <= 0]
    import json

    with open(store.manifest_path, "w") as f:
        json.dump(manifest, f)

    resumed = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, checkpoint_dir=crash_dir, finish_edge_threshold=None
        ).collect()
    }
    assert resumed == full

    # and the default config must agree when resuming the same store
    # (early finish from the latest complete iteration)
    resumed_default = {
        r["id"]: r["component"]
        for r in connected_components(edf, checkpoint_dir=crash_dir).collect()
    }
    assert resumed_default == full


def test_cc_path_graph_converges(spark):
    # worst-ish case: a long path; must converge well under max_iterations
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(edf).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


@pytest.mark.parametrize("k", [2, 3])
def test_cc_checkpoint_interval_invariance(spark, k):
    """checkpoint_interval batches star rounds per materialization (a
    barrier-budget knob); extra rounds past the fixpoint are no-ops, so
    any k must produce the identical assignment as the default k=1.

    k is bounded at 3 here ON PURPOSE: each star round's logical plan
    embeds the previous round's tree ~3x (the round's input appears in
    the aggregate, the join probe, and the join build), so an unrolled
    k-round super-step costs ~3^(2k) subtree copies regardless of data
    size — k=7 hangs Catalyst for tens of minutes and k=4 OOM'd an 8 GB
    driver at corpus scale (BENCH/ANALYSIS.md round-5 matrix). That
    blow-up — 81 subtree copies at k=2 vs 9 at k=1, a fixed per-super-
    step driver planning cost — is why k=1 is the shipped default
    (measured 36-55% faster end-to-end, BENCH/ANALYSIS.md round-5)."""
    rng = random.Random(99)
    n, m = 150, 160
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(s, d) for s, d in edges if s != d]
    edf = spark.createDataFrame(edges, "src long, dst long")
    base = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, finish_edge_threshold=None
        ).collect()  # k=1, star loop to fixpoint
    }
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, checkpoint_interval=k, finish_edge_threshold=None
        ).collect()
    }
    assert got == base
