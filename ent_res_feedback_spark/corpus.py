"""Deterministic synthetic corpus of interleaved text+media documents.

Shape per BASELINE.json ``input_hint``:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

One document = one entity mention (the analog of a reference *signature*,
s2and/data.py:54-83). Span convention (this engine's document model):

    offset 0 : kind='text'  — the name-bearing span
    offset 1 : kind='text'  — affiliation-like context
    offset 2+: interleaved kind='media' spans (opaque media_ref) and
               kind='text' title/context spans

Noise patterns mirror the reference dummy fixture
(/root/reference/tests/dummy/signatures.json; FIXTURES.md §1): apostrophes
and honorifics ("Dr A'bdul" vs "Abdul"), initial-only first names, shared
last names across entities (homonyms), spelling variants of one entity
(synonyms), missing middles/affiliations. One HOT blocking key gets >=10x
the median block population so skew handling is actually exercised.

Gold outputs: ``gold(doc_id, cluster_id)`` and
``labeled_pairs(doc_id_1, doc_id_2, label, block_key)`` — the claims-eval
shape (s2and/eval.py:871-931).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

FIRST_NAMES = [
    "alan", "alice", "andrei", "anna", "boris", "carol", "chen", "david",
    "elena", "fatima", "george", "hiro", "irene", "jose", "kavya", "liang",
    "maria", "nikolai", "omar", "priya", "qing", "rahul", "sara", "tomas",
    "uma", "viktor", "wei", "xin", "yuki", "zara",
]
MIDDLE_NAMES = ["", "", "", "b", "c", "de", "maria", "jean", "k", "lee", "von"]
LAST_NAMES = [
    "smith", "muller", "sato", "kumar", "garcia", "chen", "ivanov",
    "kowalski", "okafor", "haddad", "nguyen", "silva", "oconnor", "abdul",
    "tanaka", "rossi", "dubois", "larsen", "novak", "petrov",
]
AFFIL_WORDS = [
    "computer science", "physics department", "applied mathematics",
    "biology institute", "chemistry lab", "statistics group",
    "machine learning center", "data systems group",
]
TITLE_WORDS = [
    "learning", "systems", "networks", "analysis", "clustering", "models",
    "inference", "graphs", "optimization", "retrieval", "resolution",
    "entities", "records", "linkage", "scalable", "distributed",
]


@dataclass
class CorpusConfig:
    n_entities: int = 60
    max_docs_per_entity: int = 6
    seed: int = 42
    hot_block_entities: int = 12  # entities stacked into ONE hot block
    hot_block_boost: int = 4      # extra doc multiplier inside the hot block
    media_spans_per_doc: int = 2


def _variant_first(rng: random.Random, first: str) -> str:
    """Synonym noise for first names (same entity, different surface)."""
    roll = rng.random()
    if roll < 0.25:
        return first[0]  # initial only
    if roll < 0.35 and len(first) > 3:
        return first[0] + "'" + first[1:]  # apostrophe variant
    if roll < 0.45:
        return "Dr " + first  # honorific (normalization strips via prefix rule? kept as text noise)
    return first


def generate_corpus(config: CorpusConfig | None = None):
    """Returns (documents, gold, labeled_pairs) as lists of plain dicts /
    tuples, ready for ``spark.createDataFrame`` or the DuckDB oracle.

    documents: [{doc_id, spans:[(kind,text,media_ref,offset), ...]}]
    gold:      [(doc_id, cluster_id)]
    """
    cfg = config or CorpusConfig()
    rng = random.Random(cfg.seed)

    entities = []
    hot_last = LAST_NAMES[0]
    hot_first_initial = FIRST_NAMES[0][0]
    for e in range(cfg.n_entities):
        if e < cfg.hot_block_entities:
            # homonyms: same block (first initial + last name), distinct people
            first = rng.choice(
                [f for f in FIRST_NAMES if f[0] == hot_first_initial]
            )
            last = hot_last
        else:
            first = rng.choice(FIRST_NAMES)
            last = rng.choice(LAST_NAMES[1:])
        middle = rng.choice(MIDDLE_NAMES)
        affil = rng.choice(AFFIL_WORDS)
        entities.append(
            {"eid": e, "first": first, "middle": middle, "last": last, "affil": affil}
        )

    documents = []
    gold = []
    doc_seq = 0
    for ent in entities:
        n_docs = rng.randint(1, cfg.max_docs_per_entity)
        if ent["eid"] < cfg.hot_block_entities:
            n_docs *= cfg.hot_block_boost
        for _ in range(n_docs):
            doc_id = f"d{doc_seq:06d}"
            doc_seq += 1
            first = _variant_first(rng, ent["first"])
            middle = ent["middle"] if rng.random() > 0.3 else ""
            name = " ".join(p for p in [first, middle, ent["last"]] if p)
            affil = ent["affil"] if rng.random() > 0.2 else ""
            title = " ".join(rng.sample(TITLE_WORDS, 4))
            spans = [
                ("text", name, None, 0),
                ("text", affil, None, 1),
            ]
            off = 2
            for m in range(cfg.media_spans_per_doc):
                spans.append(("media", None, f"media://{doc_id}/{m}", off))
                off += 1
                if m == 0:
                    spans.append(("text", title, None, off))
                    off += 1
            documents.append({"doc_id": doc_id, "spans": spans})
            gold.append((doc_id, f"e{ent['eid']}"))

    # labeled pairs: all within-block pairs under the reference blocking key
    # (first-initial + last name on the normalized name span)
    from ent_res_feedback_spark.oracle import normalize_name_py, block_key_py

    by_block: dict[str, list[str]] = {}
    gold_map = dict(gold)
    name_of = {
        d["doc_id"]: next(s[1] for s in d["spans"] if s[0] == "text")
        for d in documents
    }
    for doc_id, name in name_of.items():
        by_block.setdefault(block_key_py(normalize_name_py(name)), []).append(doc_id)
    labeled_pairs = []
    for bk, ids in sorted(by_block.items()):
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                labeled_pairs.append(
                    (
                        ids[i],
                        ids[j],
                        int(gold_map[ids[i]] == gold_map[ids[j]]),
                        bk,
                    )
                )
    return documents, gold, labeled_pairs


DOCUMENTS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def corpus_to_spark(spark, documents):
    rows = [(d["doc_id"], d["spans"]) for d in documents]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
