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


# The standard NLTK English stopword list (public, stable across releases)
# — the reference builds STOP_WORDS from stopwords.words("english")
# (alligator/__init__.py:40); embedding the list avoids an NLTK runtime
# dependency on every executor.
NLTK_EN_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]

# word_tokenize approximation: alphanumeric runs (keeping one embedded
# apostrophe group, so "don't" stays whole) or single punctuation marks.
# Documented deviation from NLTK's Treebank tokenizer: contractions are
# NOT split into ("do", "n't") — the stopword list covers the whole forms.
TOKENIZE_PATTERN = r"[a-z0-9]+(?:'[a-z]+)?|[^a-z0-9\s]"

# Java regex \s is ASCII-only by default while Python's is Unicode-aware;
# (?U) (UNICODE_CHARACTER_CLASS) aligns the JVM pattern so e.g.
# non-breaking space is dropped as whitespace on BOTH sides — the scalar
# tokenize_text is the documented cross-engine mirror of tokenize_text_col.
JVM_TOKENIZE_PATTERN = "(?U)" + TOKENIZE_PATTERN


def tokenize_text(text: str) -> set:
    """Scalar mirror of tokenize_text_col (F3, alligator/utils.py:50-53):
    lowercase -> tokenize -> drop English stopwords. Set-valued like the
    reference."""
    import re

    toks = re.findall(TOKENIZE_PATTERN, (text or "").lower())
    stop = set(NLTK_EN_STOPWORDS)
    return {t for t in toks if t not in stop}


def tokenize_text_col(c: Column) -> Column:
    """F3 tokenize_text as a pure JVM expression: distinct lowercased
    tokens (regexp_extract_all) minus the embedded stopword list."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(c.cast("string")), F.lit(JVM_TOKENIZE_PATTERN), 0)
    )
    return F.array_except(toks, F.array(*[F.lit(w) for w in NLTK_EN_STOPWORDS]))


def token_sort_key_col(c: Column, prefix_tokens: int | None = None) -> Column:
    """Token-sort blocking key: distinct sorted tokens joined by space.

    ``prefix_tokens`` keeps only the first N sorted tokens — a cheaper,
    higher-recall key (tolerates token drop/append noise).
    """
    toks = F.array_sort(F.array_distinct(F.split(c, " ")))
    if prefix_tokens is not None:
        toks = F.slice(toks, 1, prefix_tokens)
    return F.concat_ws(" ", toks)
