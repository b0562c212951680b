"""Incremental assignment (I1): new docs of known entities join the
existing cluster; docs of brand-new entities become new clusters;
existing assignments never change."""

from ent_res_feedback_spark.corpus import CorpusConfig, corpus_to_spark, generate_corpus
from ent_res_feedback_spark.operators.incremental import assign_incremental
from ent_res_feedback_spark.pipeline import ERConfig, run_pipeline


def test_incremental_assignment(spark):
    documents, gold, _ = generate_corpus(CorpusConfig(n_entities=25, seed=21))
    gold_map = dict(gold)
    # split: docs of entities e0..e19 are "existing"; for e0..e19 hold out
    # some docs as "new"; entities e20+ are entirely new
    old_entities = {f"e{i}" for i in range(20)}
    old_docs, new_docs = [], []
    seen_of_entity = {}
    for d in documents:
        e = gold_map[d["doc_id"]]
        if e in old_entities and seen_of_entity.setdefault(e, 0) < 2:
            seen_of_entity[e] += 1
            old_docs.append(d)
        else:
            new_docs.append(d)

    old_df = corpus_to_spark(spark, old_docs)
    new_df = corpus_to_spark(spark, new_docs)
    cfg = ERConfig()
    base = run_pipeline(old_df, cfg)["clusters"].select("doc_id", "cluster_id")
    base_map = {r["doc_id"]: r["cluster_id"] for r in base.collect()}

    out = assign_incremental(new_df, old_df, base, cfg)
    out_map = {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    # every doc assigned exactly once
    assert len(out_map) == len(documents)
    # existing docs keep their cluster
    for doc_id, c in base_map.items():
        assert out_map[doc_id] == c

    # quality: most new docs of existing entities land in a cluster that
    # contains only docs of their entity
    cluster_entities = {}
    for doc_id, c in out_map.items():
        cluster_entities.setdefault(c, set()).add(gold_map[doc_id])
    pure = sum(1 for ents in cluster_entities.values() if len(ents) == 1)
    assert pure / len(cluster_entities) >= 0.9

    # brand-new entities must NOT be absorbed into old clusters
    old_clusters = set(base_map.values())
    for d in new_docs:
        e = gold_map[d["doc_id"]]
        if e not in old_entities:
            c = out_map[d["doc_id"]]
            if c in old_clusters:
                # allowed only if that old cluster is of the same entity
                members = [k for k, v in base_map.items() if v == c]
                assert all(gold_map[m] == e for m in members)
