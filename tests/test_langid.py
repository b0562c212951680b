"""F5 profile-based language-ID tests (operators/langid.py)."""

import pandas as pd
from pyspark.sql import functions as F

from ent_res_feedback_spark.operators.langid import (
    PROFILES,
    _build_profile,
    detect_language_profile,
)

SAMPLES = [
    ("en", "the quick brown fox jumps over the lazy dog and it was not there"),
    ("en", "this is one of the studies that were published by the group in a journal"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und es ist nicht da"),
    ("de", "die ergebnisse werden nicht mit einer anderen studie aus dem jahr verglichen"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux et il est pour nous"),
    ("fr", "les résultats sont comparés avec une autre étude qui est dans le journal"),
    ("es", "el zorro marrón rápido salta sobre el perro perezoso y no está para este"),
    ("es", "los resultados se comparan con una de las investigaciones que fue publicada"),
    ("it", "la volpe marrone veloce salta sopra il cane pigro e non sono per questo"),
]


def test_profiles_deterministic_and_bounded():
    for lang, prof in PROFILES.items():
        assert len(prof) <= 120
        assert prof == _build_profile(
            __import__(
                "ent_res_feedback_spark.operators.langid", fromlist=["x"]
            )._FUNCTION_WORDS[lang]
        )


def test_classifies_obvious_samples(spark):
    df = spark.createDataFrame(
        pd.DataFrame(SAMPLES, columns=["expected", "text"])
    ).withColumn("det", detect_language_profile(F.col("text")))
    rows = df.select("expected", "det.*").collect()
    for r in rows:
        assert r["is_reliable"], f"{r['expected']} sample judged unreliable: {r}"
        assert r["lang"] == r["expected"], f"got {r['lang']} want {r['expected']}"
        assert r["is_english"] == (r["expected"] == "en")


def test_short_or_junk_text_unreliable(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["xq", "", "zzzz qqqq wwww", "1234 5678"]})
    ).withColumn("det", detect_language_profile(F.col("text")))
    for r in df.select("det.*").collect():
        assert not r["is_reliable"]
        assert r["lang"] == "un"
