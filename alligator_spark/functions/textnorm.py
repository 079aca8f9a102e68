"""Text normalization as pure built-in column expressions (JVM-side, codegen).

Reproduces the reference's ``clean_str`` semantics
(``alligator/utils.py:56-75``): lowercase; remove bracketed numeric refs
``[12a]`` (regex ``\\[\\d+\\w*\\]``); ``_`` -> space; collapse whitespace;
fall back to the lowercased original when the cleaned result is empty.

Implemented with ``lower``/``regexp_replace``/``trim`` so it stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RE_NUM_BRACKETS = r"\[\d+\w*\]"


def clean_str_col(c: Column) -> Column:
    """clean_str as a column expression (reference alligator/utils.py:56-75)."""
    original = F.lower(c.cast("string"))
    v = F.regexp_replace(original, RE_NUM_BRACKETS, "")
    v = F.regexp_replace(v, "_", " ")
    # " ".join(value.split()) == collapse any whitespace runs, strip ends
    v = F.trim(F.regexp_replace(v, r"\s+", " "))
    return F.when(F.length(v) > 0, v).otherwise(original)


def tokens_col(c: Column) -> Column:
    """Whitespace tokens of an (already cleaned) string."""
    return F.split(c, " ")


def token_sort_key_col(c: Column, prefix_tokens: int | None = None) -> Column:
    """Token-sort blocking key: distinct sorted tokens joined by space.

    ``prefix_tokens`` keeps only the first N sorted tokens — a cheaper,
    higher-recall key (tolerates token drop/append noise).
    """
    toks = F.array_sort(F.array_distinct(F.split(c, " ")))
    if prefix_tokens is not None:
        toks = F.slice(toks, 1, prefix_tokens)
    return F.concat_ws(" ", toks)
