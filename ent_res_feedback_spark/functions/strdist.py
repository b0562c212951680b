"""String-distance kernels (SURVEY.md §2.2 F6-F7), Arrow-batched.

The reference computes jellyfish Jaro-Winkler / Levenshtein / MetricLCS /
prefix distance per pair in Python workers (s2and/text.py:246-263,
341-371). Here each kernel runs inside a pandas UDF over Arrow batches;
Levenshtein additionally has a 100% JVM-side form (``levenshtein_norm``)
via the Spark builtin. Jaro-Winkler semantics are pinned to the standard
definition (prefix weight 0.1, boost threshold 0.7, max prefix 4) and are
bit-identical to DuckDB's ``jaro_winkler_similarity`` (property-tested in
tests/test_strdist.py), which is what makes the DuckDB oracle usable.

If ``rapidfuzz`` is importable the batched C kernels are used instead;
this container lacks it, so the pure-Python fallbacks run (still Arrow
batched — only the innermost comparison is Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

try:  # pragma: no cover - exercised only where rapidfuzz is installed
    from rapidfuzz.distance import JaroWinkler as _RFJW

    _HAVE_RAPIDFUZZ = True
except ImportError:
    _HAVE_RAPIDFUZZ = False


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity; 0.0 when either string is empty (matches
    DuckDB; jellyfish agrees for non-degenerate inputs)."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - window)
        hi = min(i + window + 1, l2)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(
    s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Jaro-Winkler (reference uses jellyfish.jaro_winkler_similarity,
    s2and/text.py:262)."""
    j = jaro_similarity(s1, s2)
    if j > boost_threshold:
        prefix_len = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix_len += 1
        j += prefix_len * prefix_weight * (1.0 - j)
    return j


def prefix_dist_kernel(s1: str, s2: str) -> float:
    """F6 — reference ``prefix_dist`` (s2and/text.py:246-254):
    1 - longest-common-prefix / min-length."""
    if s1 == s2:
        return 0.0
    if not s1 or not s2:
        return 1.0
    min_len = min(len(s1), len(s2))
    i = 0
    while i < min_len and s1[i] == s2[i]:
        i += 1
    return 1.0 - i / min_len if i else 1.0


def lcs_len(s1: str, s2: str) -> int:
    """Longest common subsequence length (rolling 1-row DP)."""
    if not s1 or not s2:
        return 0
    if len(s2) > len(s1):
        s1, s2 = s2, s1
    prev = [0] * (len(s2) + 1)
    for a in s1:
        cur = [0]
        p = prev
        append = cur.append
        for j, b in enumerate(s2):
            append(p[j] + 1 if a == b else (cur[j] if cur[j] >= p[j + 1] else p[j + 1]))
        prev = cur
    return prev[-1]


def metric_lcs_kernel(s1: str, s2: str) -> float:
    """F7 'lcs' — strsimpy MetricLCS semantics (reference
    s2and/text.py:257-261): 1 - lcs_len / max_len; 0.0 for two equal
    (incl. empty) strings."""
    if s1 == s2:
        return 0.0
    m = max(len(s1), len(s2))
    if m == 0:
        return 0.0
    return 1.0 - lcs_len(s1, s2) / m


# ---------------------------------------------------------------------------
# Arrow-batched column functions
# ---------------------------------------------------------------------------

def _pairwise_udf(kernel):
    @pandas_udf(DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = [
            None if (x is None or y is None) else kernel(x, y)
            for x, y in zip(a, b)
        ]
        return pd.Series(out, dtype="float64")

    return _udf


if _HAVE_RAPIDFUZZ:  # pragma: no cover
    def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else _RFJW.similarity(x, y)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    jaro_winkler = pandas_udf(_jw_batch, DoubleType())
else:
    jaro_winkler = _pairwise_udf(jaro_winkler_similarity)

prefix_dist = _pairwise_udf(prefix_dist_kernel)
metric_lcs = _pairwise_udf(metric_lcs_kernel)


def levenshtein_norm(c1: Column, c2: Column) -> Column:
    """F7 'levenshtein' — edit distance normalized by max length
    (reference s2and/text.py:366-370). JVM builtin: stays in codegen."""
    return F.levenshtein(c1, c2) / F.greatest(F.length(c1), F.length(c2))


def name_text_features(c1: Column, c2: Column) -> list[Column]:
    """F7 bundle — reference ``name_text_features`` (s2and/text.py:341-371):
    [levenshtein_norm, prefix_dist, metric_lcs, jaro_winkler], each NULL
    when either name is NULL or length <= 1."""
    gate = (
        c1.isNotNull() & c2.isNotNull() & (F.length(c1) > 1) & (F.length(c2) > 1)
    )
    return [
        F.when(gate, levenshtein_norm(c1, c2)).alias("levenshtein"),
        F.when(gate, prefix_dist(c1, c2)).alias("prefix"),
        F.when(gate, metric_lcs(c1, c2)).alias("lcs"),
        F.when(gate, jaro_winkler(c1, c2)).alias("jaro"),
    ]
