"""Cluster-level merge compatibility rules (C3, SURVEY.md §2.6).

Reference: s2and/s2_funcs.py:23-265 — the production-parity checks used
when deciding whether two CLUSTER CANDIDATES may merge: year-gap,
fuzzy-affiliation jaccard, ORCID/DBLP trusted-id compatibility, exact
email / trusted-id matches, name compatibility (subset rules over
first-initial+last, full firsts, full/initial middles), and the
prefix-or-alias rule over all first-name cross pairs ("sergeys_rule",
s2_funcs.py:255-265).

Spark restatement: the reference walks Python dicts per candidate pair;
here each cluster is reduced ONCE to a profile row of set-valued columns
(one groupBy over the signatures table — linear, map-side combinable),
and every rule is a pure column expression over a joined pair of
profiles. At 100 TB the profiles table is tiny relative to signatures
and candidate pairs evaluate at codegen speed; no UDFs anywhere.

Input signature frame columns (the reference ANDData signature analog):
    sig_id, cluster_id, first, middle, last,
    affiliations array<string>, email string,
    source string ('ORCID'/'DBLP'/other), source_ids array<string>,
    year int
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ent_res_feedback_spark.functions.text import normalize_text_ascii

#: reference s2_funcs.py:13 AFFILIATION stopwords (NOT the language list)
AFFIL_STOPWORDS = ["of", "for", "and", "dept", "department", "univ", "university"]
MAX_YEAR_GAP = 10  # reference s2_funcs.py:14


def _affil_tokens(affils: Column) -> Column:
    """normalized_affiliation_tokens (s2_funcs.py:17-20): join, strip
    punctuation to spaces, lower, split, minus stopwords."""
    joined = F.lower(F.concat_ws(" ", affils))
    cleaned = F.regexp_replace(joined, r"[^\w\s]|_", " ")
    toks = F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: F.length(t) > 0)
    return F.array_except(toks, F.array(*[F.lit(w) for w in AFFIL_STOPWORDS]))


def cluster_profiles(signatures: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """One profile row per cluster: every set the merge rules consume,
    reduced in a single grouped aggregation."""
    first_n = normalize_text_ascii(F.col("first"))
    middle_n = normalize_text_ascii(F.col("middle"))
    last_n = normalize_text_ascii(F.col("last"))
    # without-apostrophe variant for sergeys_rule (reference uses
    # author_info_first_normalized_without_apostrophe)
    first_nwa = normalize_text_ascii(F.col("first"), special_case_apostrophes=True)

    rows = signatures.select(
        F.col(cluster_col).alias("cluster_id"),
        _affil_tokens(F.col("affiliations")).alias("affil_toks"),
        F.col("year"),
        F.col("email"),
        F.when(F.col("source") == "ORCID", F.col("source_ids")).alias("orcid_ids"),
        F.when(F.col("source") == "DBLP", F.col("source_ids")).alias("dblp_ids"),
        F.when(
            (F.length(first_n) > 0) & (F.length(last_n) > 0),
            F.concat(F.substring(first_n, 1, 1), F.lit(" "), last_n),
        ).alias("lfi"),
        F.when(F.length(first_n) > 1, first_n).alias("full_first"),
        F.when(F.length(middle_n) > 1, middle_n).alias("full_middle"),
        F.when(F.length(middle_n) > 0, F.substring(middle_n, 1, 1)).alias(
            "middle_initial"
        ),
        first_nwa.alias("first_nwa"),
    )

    def set_of(col):
        return F.array_sort(F.collect_set(col))

    def set_of_flat(col):
        return F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(col)))
        )

    return rows.groupBy("cluster_id").agg(
        set_of_flat("affil_toks").alias("affil_tokens"),
        set_of("year").alias("years"),
        set_of("email").alias("emails"),
        set_of_flat("orcid_ids").alias("orcid_ids"),
        set_of_flat("dblp_ids").alias("dblp_ids"),
        set_of("lfi").alias("last_first_initials"),
        set_of("full_first").alias("full_firsts"),
        set_of("full_middle").alias("full_middles"),
        set_of("middle_initial").alias("middle_initials"),
        set_of("first_nwa").alias("firsts_nwa"),
    )


def _smaller_subset(s1: Column, s2: Column) -> Column:
    """Reference subset idiom: the smaller set must be contained in the
    larger (s2_funcs.py:129-131 etc.)."""
    return F.when(
        F.size(s1) > F.size(s2), F.size(F.array_except(s2, s1)) == 0
    ).otherwise(F.size(F.array_except(s1, s2)) == 0)


def year_gap_is_small(y1: Column, y2: Column) -> Column:
    """s2_funcs.py:41-65: True when either side has no years, else
    (highest min - lowest max) < MAX_YEAR_GAP."""
    return F.when((F.size(y1) == 0) | (F.size(y2) == 0), F.lit(True)).otherwise(
        (
            F.greatest(F.array_min(y1), F.array_min(y2))
            - F.least(F.array_max(y1), F.array_max(y2))
        )
        < F.lit(MAX_YEAR_GAP)
    )


def has_year_gap(years: Column) -> Column:
    """s2_funcs.py:68-82: any consecutive gap >= MAX_YEAR_GAP within ONE
    cluster's sorted distinct years."""
    idx = F.sequence(F.lit(1), F.size(years) - 1)
    return F.when(F.size(years) < 2, F.lit(False)).otherwise(
        F.exists(
            idx,
            lambda i: (F.element_at(years, i + 1) - F.element_at(years, i))
            >= F.lit(MAX_YEAR_GAP),
        )
    )


def affiliation_fuzzy_match(t1: Column, t2: Column) -> Column:
    """s2_funcs.py:23-38: jaccard of the union'd affiliation token sets;
    NULL when both sides are empty (reference returns numpy nan)."""
    inter = F.size(F.array_intersect(t1, t2))
    union = F.size(F.array_union(t1, t2))
    return F.when(union > 0, inter.cast("double") / union)


def trusted_ids_are_compatible(
    orcid_1: Column, orcid_2: Column,
    dblp_1: Column | None = None, dblp_2: Column | None = None,
) -> Column:
    """s2_funcs.py:85-117: smaller-subset check on ORCID ids (and DBLP ids
    unless orcid_only)."""
    ok = _smaller_subset(orcid_1, orcid_2)
    if dblp_1 is not None and dblp_2 is not None:
        ok = ok & _smaller_subset(dblp_1, dblp_2)
    return ok


def emails_match_exactly(e1: Column, e2: Column) -> Column:
    """s2_funcs.py:120-138: both sides exactly one distinct email and they
    match."""
    return (
        (F.size(e1) == 1)
        & (F.size(e2) == 1)
        & (F.element_at(e1, 1) == F.element_at(e2, 1))
    )


def trusted_ids_match_exactly(
    orcid_1: Column, orcid_2: Column,
    dblp_1: Column | None = None, dblp_2: Column | None = None,
) -> Column:
    """s2_funcs.py:139-182: exactly-one-on-both-sides-and-equal over DBLP
    first (present on exactly one side -> False; equal singletons -> True),
    then the same over ORCID; otherwise False."""
    def one(c):
        return F.size(c) == 1

    def eq1(a, b):
        return F.element_at(a, 1) == F.element_at(b, 1)

    orcid_rule = (
        F.when(~one(orcid_1) & one(orcid_2), F.lit(False))
        .when(one(orcid_1) & ~one(orcid_2), F.lit(False))
        .when(one(orcid_1) & one(orcid_2) & eq1(orcid_1, orcid_2), F.lit(True))
        .otherwise(F.lit(False))
    )
    if dblp_1 is None or dblp_2 is None:
        return orcid_rule
    return (
        F.when(~one(dblp_1) & one(dblp_2), F.lit(False))
        .when(one(dblp_1) & ~one(dblp_2), F.lit(False))
        .when(one(dblp_1) & one(dblp_2) & eq1(dblp_1, dblp_2), F.lit(True))
        .otherwise(orcid_rule)
    )


def names_are_compatible(p1_prefix: str = "_1", p2_prefix: str = "_2") -> Column:
    """s2_funcs.py:184-252: all four smaller-subset checks over the
    profile pair columns (suffixed)."""
    def c(name, sfx):
        return F.col(name + sfx)

    return (
        _smaller_subset(c("last_first_initials", p1_prefix), c("last_first_initials", p2_prefix))
        & _smaller_subset(c("full_firsts", p1_prefix), c("full_firsts", p2_prefix))
        & _smaller_subset(c("full_middles", p1_prefix), c("full_middles", p2_prefix))
        & _smaller_subset(c("middle_initials", p1_prefix), c("middle_initials", p2_prefix))
    )


def sergeys_rule(f1: Column, f2: Column, alias_keys: list[str] | None = None) -> Column:
    """s2_funcs.py:255-265: EVERY cross pair of first names must be a
    prefix match or a known alias. ``alias_keys`` is the (small) name-pair
    list as canonical 'a|b' strings in both orientations — the reference
    holds name_tuples in memory the same way."""
    aliases = F.array(*[F.lit(k) for k in (alias_keys or [])])
    return F.forall(
        f1,
        lambda a: F.forall(
            f2,
            lambda b: a.startswith(b)
            | b.startswith(a)
            | F.array_contains(aliases, F.concat(a, F.lit("|"), b)),
        ),
    )


def cluster_pair_rules(
    profiles_1: DataFrame,
    profiles_2: DataFrame,
    alias_keys: list[str] | None = None,
    candidate_key: str | None = "last_first_initials",
    include_keyless: bool = False,
) -> DataFrame:
    """Join two profile frames into (cluster_id_1, cluster_id_2) pairs and
    evaluate EVERY merge rule as columns — the batch shape for candidate
    merge scoring.

    Candidate generation is an EQUI-join by default: two clusters pair up
    when they share at least one value of ``candidate_key`` (the
    last-first-initial block, the same key the reference blocks on —
    clusters that share no name block can never merge, so nothing real is
    lost). This keeps the default path shuffle-joinable at any scale.
    Pass ``candidate_key=None`` to opt into the quadratic cross product
    explicitly (bounded inputs only — e.g. the per-block parity tests).
    Note: with a candidate key, profiles whose key set is empty or NULL
    pair with nothing by default (they have no name evidence to merge
    on). ``include_keyless=True`` routes those profiles through a shared
    sentinel bucket so they still pair among themselves — opt-in because
    the keyless bucket is quadratic in the number of keyless clusters.
    """
    a = profiles_1.select([F.col(c).alias(c + "_1") for c in profiles_1.columns])
    b = profiles_2.select([F.col(c).alias(c + "_2") for c in profiles_2.columns])
    if candidate_key is None:
        pairs = a.crossJoin(b)
    else:
        def _keys(col_name: str):
            c = F.col(col_name)
            if include_keyless:
                return F.when(
                    c.isNull() | (F.size(c) == 0),
                    F.array(F.lit("\x00keyless")),
                ).otherwise(c)
            return c

        ka = a.select(
            "cluster_id_1", F.explode(_keys(candidate_key + "_1")).alias("_ck")
        )
        kb = b.select(
            "cluster_id_2", F.explode(_keys(candidate_key + "_2")).alias("_ck")
        )
        cand = ka.join(kb, "_ck").select("cluster_id_1", "cluster_id_2").distinct()
        pairs = cand.join(a, "cluster_id_1").join(b, "cluster_id_2")
    return pairs.select(
        F.col("cluster_id_1"),
        F.col("cluster_id_2"),
        year_gap_is_small(F.col("years_1"), F.col("years_2")).alias(
            "year_gap_is_small"
        ),
        affiliation_fuzzy_match(
            F.col("affil_tokens_1"), F.col("affil_tokens_2")
        ).alias("affiliation_jaccard"),
        trusted_ids_are_compatible(
            F.col("orcid_ids_1"), F.col("orcid_ids_2"),
            F.col("dblp_ids_1"), F.col("dblp_ids_2"),
        ).alias("trusted_ids_are_compatible"),
        trusted_ids_match_exactly(
            F.col("orcid_ids_1"), F.col("orcid_ids_2"),
            F.col("dblp_ids_1"), F.col("dblp_ids_2"),
        ).alias("trusted_ids_match_exactly"),
        emails_match_exactly(F.col("emails_1"), F.col("emails_2")).alias(
            "emails_match_exactly"
        ),
        names_are_compatible().alias("names_are_compatible"),
        sergeys_rule(
            F.col("firsts_nwa_1"), F.col("firsts_nwa_2"), alias_keys
        ).alias("sergeys_rule"),
    )
