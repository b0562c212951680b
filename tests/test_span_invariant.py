"""Per-row invariant (BASELINE.json input_hint): every emitted record must
preserve span-sequence equality (kind, text, media_ref, order) against its
source row — including the opaque media spans."""

from pyspark.sql import functions as F

from ent_res_feedback_spark.corpus import CorpusConfig, corpus_to_spark, generate_corpus
from ent_res_feedback_spark.operators.mentions import extract_mentions
from ent_res_feedback_spark.pipeline import ERConfig, run_pipeline


def _span_tuples(rows):
    return {
        r["doc_id"]: tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        )
        for r in rows
    }


def test_pipeline_output_preserves_spans(spark):
    documents, _, _ = generate_corpus(CorpusConfig(n_entities=25, seed=7))
    docs = corpus_to_spark(spark, documents)
    out = run_pipeline(docs, ERConfig())["clusters"]

    source = _span_tuples(docs.select("doc_id", "spans").collect())
    emitted = _span_tuples(out.select("doc_id", "spans").collect())
    assert emitted == source
    # and against the generator's ground truth (ordering, media refs intact)
    for d in documents:
        assert emitted[d["doc_id"]] == tuple(d["spans"])


def test_mention_extraction_keeps_spans_column(spark):
    documents, _, _ = generate_corpus(CorpusConfig(n_entities=10, seed=3))
    docs = corpus_to_spark(spark, documents)
    m = extract_mentions(docs)
    assert "spans" in m.columns
    source = _span_tuples(docs.select("doc_id", "spans").collect())
    after = _span_tuples(m.select("doc_id", "spans").collect())
    assert after == source


def test_media_spans_opaque_and_interleaved(spark):
    documents, _, _ = generate_corpus(CorpusConfig(n_entities=5, seed=1))
    docs = corpus_to_spark(spark, documents)
    media = docs.select(
        F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "media")
    rows = media.collect()
    assert all(r["s"]["media_ref"].startswith("media://") for r in rows)
    assert all(r["s"]["text"] is None for r in rows)
