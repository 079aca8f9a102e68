"""Column classification for UNTYPED input tables.

The reference infers NE / LIT / IGNORED per column from a 32-row sample
(``/root/reference/alligator/manager/data.py:78-141``, via the public
``column_classifier`` package) with a ``target_columns`` override
(``data.py:114-126``), then routes NE columns to entity mentions and LIT
columns (NUMBER / DATETIME / STRING) to comparison context. This module
is the engine's analogue for a plain CSV/parquet table of raw strings:

* ``classify_columns`` — Spark-side heuristics over a DETERMINISTIC
  32-row sample (ordered limit, the SURVEY §1.1 ``df.limit(32)``
  mapping): per column, integer counts of number-parseable cells,
  date-parseable cells and whitespace tokens decide
  NUMBER / DATETIME / STRING / NE / IGNORED. All rules are anchored
  regexes + integer cross-multiplications, so an external SQL engine
  reproduces them bit-for-bit (the correctness oracle).
* ``docs_from_table`` — materialize the engine's interleaved-docs input
  (doc_id, spans) from a raw table using a classification: the first NE
  column becomes the ``mention`` span, LIT columns become
  ``literal_number`` / ``literal_date`` / ``literal_string`` spans in
  column order, IGNORED columns are dropped.

Thresholds: a column is NUMBER/DATETIME when >= 60% of its non-empty
sampled cells parse; STRING when it averages > 8 whitespace tokens per
non-empty cell (long free text is context, not an entity name);
otherwise NE. A column with no non-empty cells in the sample is IGNORED.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_ROWS = 32
# anchored, POSIX-safe (identical semantics in Java regex and RE2-style
# engines): integers/decimals with optional sign; ISO + slash dates
NUMBER_RE = "^-?[0-9]+([.][0-9]+)?$"
DATE_RES = (
    "^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$",
    "^[0-9]{4}/[0-9]{1,2}/[0-9]{1,2}$",
)

NE_KIND = "NE"
NUMBER_KIND = "NUMBER"
DATE_KIND = "DATETIME"  # reference renames DATE -> DATETIME (data.py:105-107)
STRING_KIND = "STRING"
IGNORED_KIND = "IGNORED"

_SPAN_KIND_OF = {
    NUMBER_KIND: "literal_number",
    DATE_KIND: "literal_date",
    STRING_KIND: "literal_string",
}


def classify_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    sample_rows: int = SAMPLE_ROWS,
    order_by: str | None = None,
    target_overrides: dict[str, str] | None = None,
) -> DataFrame:
    """Classify ``cols`` (default: all columns) of a raw string table.

    Returns one row per column: (col_name, kind, non_empty, num_cnt,
    date_cnt, tok_sum) — the integer evidence is exposed so the decision
    is auditable (and oracle-checkable). The sample is the first
    ``sample_rows`` rows under ``order_by`` (default: the first column),
    with every remaining column as a tie-break so the ordering is total
    over distinct rows: the sampled multiset is deterministic regardless
    of partitioning even when ``order_by`` has duplicates at the cut
    boundary (fully identical rows are interchangeable, so which copy is
    taken cannot change the evidence). Mirrors the reference's fixed
    head sample (nrows=32, data.py:50).

    ``target_overrides`` maps col_name -> kind and wins over inference
    (the reference's ``target_columns`` semantics, data.py:114-126).
    """
    cols = list(cols or df.columns)
    order_by = order_by or df.columns[0]
    tiebreak = [c for c in df.columns if c != order_by]
    sample = df.orderBy(order_by, *tiebreak).limit(sample_rows)

    # unpivot to (col_name, value): the per-column aggregate is then one
    # groupBy over sample_rows * n_cols cells
    stacked = sample.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in cols]),
                F.array(*[F.col(c).cast("string") for c in cols]),
            )
        ).alias("col_name", "value")
    )
    v = F.trim(F.col("value"))
    non_empty = F.col("value").isNotNull() & (F.length(v) > 0)
    is_num = v.rlike(NUMBER_RE)
    is_date = None
    for pat in DATE_RES:
        m = v.rlike(pat)
        is_date = m if is_date is None else (is_date | m)
    toks = F.size(F.split(v, " +"))

    agg = stacked.groupBy("col_name").agg(
        F.sum(non_empty.cast("long")).alias("non_empty"),
        F.sum((non_empty & is_num).cast("long")).alias("num_cnt"),
        F.sum((non_empty & is_date).cast("long")).alias("date_cnt"),
        F.sum(F.when(non_empty, toks).otherwise(F.lit(0)).cast("long")).alias(
            "tok_sum"
        ),
    )
    # integer cross-multiplied thresholds (no float comparisons):
    # 60% parse rate; avg tokens > 8
    kind = (
        F.when(F.col("non_empty") == 0, F.lit(IGNORED_KIND))
        .when(F.col("num_cnt") * 5 >= F.col("non_empty") * 3, F.lit(NUMBER_KIND))
        .when(F.col("date_cnt") * 5 >= F.col("non_empty") * 3, F.lit(DATE_KIND))
        .when(F.col("tok_sum") > F.col("non_empty") * 8, F.lit(STRING_KIND))
        .otherwise(F.lit(NE_KIND))
    )
    out = agg.select(
        "col_name", kind.alias("kind"), "non_empty", "num_cnt", "date_cnt", "tok_sum"
    )
    if target_overrides:
        ov = df.sparkSession.createDataFrame(
            list(target_overrides.items()), "col_name string, _ov string"
        )
        out = (
            out.join(F.broadcast(ov), "col_name", "left")
            .withColumn("kind", F.coalesce("_ov", "kind"))
            .drop("_ov")
        )
    return out


def docs_from_table(
    df: DataFrame,
    classification: dict[str, str],
    id_col: str | None = None,
) -> DataFrame:
    """Raw table + {col -> kind} -> engine input docs (doc_id, spans).

    The FIRST NE column (in table order) is the ``mention`` span; LIT
    columns become typed literal spans in column order; IGNORED columns
    (and any NE column past the first — the reference links one entity
    per row slot at a time) are dropped.

    ``doc_id`` comes from ``id_col`` when given. Otherwise it is
    synthesized from the WHOLE row — ``md5(to_json(struct(*cols)))`` plus
    a per-duplicate rank for bit-identical rows — so two rows that share
    a mention string but differ anywhere else arrive as TWO distinct
    docs and get linked by the pipeline, never silently pre-merged
    (duplicate names are the normal case for record-linkage input).
    Fully identical rows are interchangeable, so their rank assignment
    is deterministic up to permutation: the output doc set is stable
    regardless of partitioning. The rank window partitions on the
    row hash (near-unique keys — one narrow shuffle, no skew).
    """
    ne_cols = [c for c in df.columns if classification.get(c) == NE_KIND]
    if not ne_cols:
        raise ValueError("docs_from_table: no NE column in the classification")
    mention_col = ne_cols[0]
    spans = []
    offset = 0
    ordered = [mention_col] + [
        c
        for c in df.columns
        if c != mention_col and classification.get(c) in _SPAN_KIND_OF
    ]
    for c in ordered:
        kind = "mention" if c == mention_col else _SPAN_KIND_OF[classification[c]]
        spans.append(
            F.struct(
                F.lit(kind).alias("kind"),
                F.col(c).cast("string").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(offset).cast("int").alias("offset"),
            )
        )
        offset += 1
    if id_col:
        return df.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.array(*spans).alias("spans"),
        )
    from pyspark.sql import Window

    row_hash = F.md5(
        F.to_json(F.struct(*[F.col(c).cast("string") for c in df.columns]))
    )
    w = Window.partitionBy("_row_hash").orderBy(F.lit(1))
    return (
        df.withColumn("_row_hash", row_hash)
        .withColumn("_dup_rank", F.row_number().over(w))
        .select(
            F.concat(
                F.lit("r"), F.col("_row_hash"), F.lit("-"), F.col("_dup_rank")
            ).alias("doc_id"),
            F.array(*spans).alias("spans"),
        )
    )
