"""Stage 6 — user-facing outputs: CEA-style ranked candidates + CSV sink.

The reference's primary artifact is the per-cell ranked candidate list:
after rerank, candidates are sorted by score and truncated to
``max_candidates_in_result`` (default 5, ``alligator/ml.py:231-236``),
then the winning candidate's id/name/description/score are appended to
the ORIGINAL row for CSV export (``alligator/manager/output.py:53-113``,
golden file ``tables/imdb_top_100_output.csv`` keeps all input columns).

Pairwise mapping: a doc's candidates are its scored edges; ``cea_topk``
attaches each doc's top-k (cand_id, score, accepted) to the intact doc —
``spans`` flows through untouched (span-sequence invariant). The CSV sink
flattens nested columns to JSON strings (CSV cannot hold arrays) — the
reference serializes nested candidate dicts the same way through Mongo
cursors -> DictWriter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_CANDIDATES_IN_RESULT = 5  # alligator/config.py max_candidates_in_result


def cea_exploded(scored: DataFrame, k: int = MAX_CANDIDATES_IN_RESULT) -> DataFrame:
    """One row per (doc, rank): the doc's top-k candidates by score
    (desc, cand asc tie-break — deterministic like the reference's stable
    sort). Input needs (doc_a, doc_b, score[, accepted])."""
    has_acc = "accepted" in scored.columns
    acc = F.col("accepted") if has_acc else F.lit(False)
    sides = scored.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("cand_id"),
        "score",
        acc.alias("accepted"),
    ).unionByName(
        scored.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("cand_id"),
            "score",
            acc.alias("accepted"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        sides.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "cand_id", "score", "accepted")
    )


def cea_topk(
    scored: DataFrame, docs: DataFrame, k: int = MAX_CANDIDATES_IN_RESULT
) -> DataFrame:
    """Intact docs + nested top-k candidate list (empty array when the doc
    has no scored edge — the reference emits the row unchanged then too)."""
    ranked = cea_exploded(scored, k)
    nested = ranked.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "cand_id", "score", "accepted"))
        ).alias("candidates")
    )
    empty = F.array().cast(nested.schema["candidates"].dataType)
    return docs.join(nested, "doc_id", "left").withColumn(
        "candidates", F.coalesce("candidates", empty)
    )


def export_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S6 CSV export sink (``alligator/manager/output.py:53-84``): nested
    columns (arrays/structs/maps) are serialized to JSON strings; scalars
    pass through. Distributed write — one CSV part per partition, same
    layout the reference streams through its DictWriter batches."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("header", header)
        # RFC-4180 quoting (escape quote by doubling) so standard CSV
        # readers parse the embedded JSON; Spark defaults to backslash
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
