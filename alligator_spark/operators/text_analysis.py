"""Text-analysis operators for corpus curation, all JVM-side built-ins
except the winnowing fingerprint (Arrow pandas UDF).

* token_stats       — whitespace + regex token counting, char lengths
* quality_score     — length / punctuation / stopword / repetition ratios
* lang_id           — n-gram/stopword-overlap heuristic over small
  per-language marker lists (no external models)
* fingerprint_docs  — winnowing-style rolling-hash document fingerprints
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# small, public, embedded marker lists (heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "est", "de", "pour", "avec", "dans", "une"],
    "es": ["el", "la", "los", "y", "es", "de", "para", "con", "en", "una"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "at", "by", "be", "are"]


def _tokens(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per doc: whitespace tokens, BPE-ish word pieces, char length."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_computed": F.length(t),
            "n_tokens": F.size(_tokens(t)),
            # BPE-ish: split on non-alphanumerics AND letter/digit borders
            "n_wordpieces": F.size(
                F.filter(
                    F.split(
                        F.regexp_replace(t, r"([a-zA-Z])(\d)|(\d)([a-zA-Z])", r"$1$3 $2$4"),
                        r"[^a-zA-Z0-9]+",
                    ),
                    lambda x: F.length(x) > 0,
                )
            ),
            "avg_token_len": F.length(F.regexp_replace(t, r"\s+", ""))
            / F.greatest(F.size(_tokens(t)), F.lit(1)),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: favor medium length, low punctuation
    density, some stopword presence, low token repetition."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    punct_ratio = (
        F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")) / F.greatest(F.length(t), F.lit(1))
    )
    stop_ratio = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in EN_STOPWORDS]),
        )
    ) / n_tok
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    len_score = F.least(F.length(t) / F.lit(200.0), F.lit(1.0))
    q = (
        0.3 * len_score
        + 0.3 * distinct_ratio
        + 0.2 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.withColumns(
        {
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "distinct_token_ratio": distinct_ratio,
            "quality": q,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax of marker-token overlap across embedded language lists;
    'und' (undetermined) when nothing matches."""
    toks = F.transform(_tokens(F.col(text_col)), F.lower)
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).alias(f"hits_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    out = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    # deterministic tie-break: first language (in LANG_MARKERS order) wins
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def fingerprint_docs(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 8
) -> DataFrame:
    """True winnowing fingerprints (array<string> of md5-hex window
    minima) per doc — O(len) per doc in one Arrow batch pass; any shared
    substring of length >= k + window - 1 shares a fingerprint."""
    from alligator_spark.functions.hashing import winnow_fingerprints

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def fp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield pd.Series(
                [winnow_fingerprints(x or "", k, window) for x in s]
            )

    return df.select(
        F.col(id_col), fp(F.col(text_col)).alias("fingerprint")
    )
