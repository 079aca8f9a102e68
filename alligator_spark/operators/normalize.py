"""Stage 1 — normalize: extract the primary mention + literal context.

The reference extracts one Entity per non-empty NE cell and keeps LIT
cells as comparison context (``alligator/processors.py:112-129``,
``alligator/feature.py:361-459``). Here a document's first ``mention``
span is the entity mention and the literal spans are the context.

Everything is built-in higher-order array functions — no explode, no
shuffle, no Python: the stage is a narrow map over the scan and Catalyst
prunes ``spans`` access into the parquet reader.

The ``spans`` column itself is NEVER rewritten (span-sequence invariant);
downstream stages operate on this projection and re-join results onto the
intact docs table by ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alligator_spark.functions.textnorm import clean_str_col


def _texts_of_kind(kind: str) -> Column:
    return F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit(kind)),
        lambda s: s["text"],
    )


def normalize_docs(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """docs(doc_id, spans) -> (doc_id, norm_mention, lit_* arrays, row_text).

    Skips docs with no usable mention (reference skips empty/NaN cells,
    ``alligator/processors.py:117-118``). ``carry`` columns (e.g. an
    event-time column on a stream) pass through unchanged.
    """
    mention_raw = F.element_at(_texts_of_kind("mention"), 1)
    out = docs.select(
        "doc_id",
        *carry,
        mention_raw.alias("mention_raw"),
        _texts_of_kind("literal_number").alias("lit_numbers"),
        _texts_of_kind("literal_date").alias("lit_dates"),
        _texts_of_kind("literal_string").alias("lit_strings"),
    )
    out = out.filter(
        F.col("mention_raw").isNotNull() & (F.length(F.trim("mention_raw")) > 0)
    )
    out = out.withColumn("norm_mention", clean_str_col(F.col("mention_raw")))
    # row_text: the full textual context of the doc (mention + literals),
    # analogue of the reference's whole-row text used by desc/descNgram
    # (alligator/feature.py:94-99).
    out = out.withColumn(
        "row_text",
        F.concat_ws(
            " ",
            F.col("norm_mention"),
            F.concat_ws(" ", "lit_dates"),
            F.concat_ws(" ", "lit_numbers"),
            F.concat_ws(" ", "lit_strings"),
        ),
    )
    return out
