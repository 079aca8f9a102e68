"""clean_str golden cases (reference tests/test_utils.py:117-186)."""

import pytest
from pyspark.sql import functions as F

from alligator_spark.functions.textnorm import clean_str_col, token_sort_key_col


def _clean(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r[0] for r in df.select(clean_str_col(F.col("v"))).collect()]


class TestCleanStr:
    def test_golden_cases(self, spark):
        # reference: lowercase, strip [12a]-style refs, _ -> space, collapse
        got = _clean(
            spark,
            [
                "The_Dark_Knight [12a]",
                "  hello   world  ",
                "Brad Pitt",
                "a_b_c",
                "ref[1]text",  # not purely-numeric-prefix bracket: [1] IS stripped
            ],
        )
        assert got[0] == "the dark knight"
        assert got[1] == "hello world"
        assert got[2] == "brad pitt"
        assert got[3] == "a b c"
        assert got[4] == "reftext"

    def test_empty_after_clean_falls_back_to_lowered_original(self, spark):
        # reference alligator/utils.py:72-74
        got = _clean(spark, ["[12a]", "___"])
        assert got[0] == "[12a]"
        # "___" -> spaces -> collapsed to "" -> fallback "___"
        assert got[1] == "___"

    def test_bracket_regex_needs_leading_digits(self, spark):
        # regex \[\d+\w*\]: [abc] is NOT stripped
        got = _clean(spark, ["name [abc]"])
        assert got[0] == "name [abc]"


class TestTokenizeText:
    """F3 golden cases (reference tokenize_text, alligator/utils.py:50-53:
    word_tokenize + lowercase + drop English stopwords). Our tokenizer is
    a documented Treebank approximation: punctuation splits off as single
    tokens; contractions stay whole (NLTK would split "don't" -> "do",
    "n't") — the embedded stopword list covers the whole forms."""

    def test_scalar_golden_cases(self):
        from alligator_spark.functions.textnorm import tokenize_text

        assert tokenize_text("The Quick Brown Fox!") == {
            "quick", "brown", "fox", "!",
        }
        # stopwords dropped, case-insensitive
        assert tokenize_text("This is THE house of it") == {"house"}
        # contraction is a single token AND a stopword -> dropped whole
        assert tokenize_text("don't panic") == {"panic"}
        # punctuation separates from words like word_tokenize
        assert tokenize_text("alpha, beta.") == {"alpha", ",", "beta", "."}
        assert tokenize_text("") == set()

    def test_column_matches_scalar(self, spark):
        from alligator_spark.functions.textnorm import (
            tokenize_text,
            tokenize_text_col,
        )

        vals = ["The Quick Brown Fox!", "don't panic", "a b c", "it's O'Brien's"]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = [
            set(r[0]) for r in df.select(tokenize_text_col(F.col("v"))).collect()
        ]
        assert got == [tokenize_text(v) for v in vals]

    def test_unicode_whitespace_parity(self, spark):
        # Java regex \s is ASCII-only unless (?U): a non-breaking space
        # must be dropped as whitespace on BOTH sides, not emitted as a
        # punctuation token by the JVM half (ADVICE r2)
        from alligator_spark.functions.textnorm import (
            tokenize_text,
            tokenize_text_col,
        )

        vals = ["alpha\u00a0beta", "x\u2009y!", "end\u00a0"]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = [
            set(r[0]) for r in df.select(tokenize_text_col(F.col("v"))).collect()
        ]
        assert got == [tokenize_text(v) for v in vals]
        assert got[0] == {"alpha", "beta"}


class TestTokenSortKey:
    def test_sorted_distinct(self, spark):
        df = spark.createDataFrame([("b a c a",)], ["v"])
        assert df.select(token_sort_key_col(F.col("v"))).collect()[0][0] == "a b c"

    def test_prefix(self, spark):
        df = spark.createDataFrame([("d c b a",)], ["v"])
        got = df.select(token_sort_key_col(F.col("v"), 2)).collect()[0][0]
        assert got == "a b"
