"""Evaluation: labeled co-blocked pairs + set-based pairwise P/R/F1.

Mirrors the reference's set-based precision/recall/F1
(``eval/evaluators/cea_wd.py:37-63``): correct = |pred ∩ gold|,
P = correct/|pred|, R = correct/|gold|, F1 = 2PR/(P+R).

The evaluation universe is FIXTURES.md §2 ``labeled_pairs``: unordered
doc pairs sharing at least one blocking key, labeled is_match from gold
clusters. Predicted positives are pairs that land in the same predicted
component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_pairs(keys: DataFrame, gold: DataFrame) -> DataFrame:
    """(doc_id, block_key) x gold(doc_id, cluster_id) -> labeled pairs."""
    a = keys.select("doc_id", "block_key").alias("a")
    b = keys.select("doc_id", "block_key").alias("b")
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("block_key"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.min("block_key").alias("block_key"))
    )
    ga = gold.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("cluster_a")
    )
    gb = gold.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cluster_b")
    )
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "block_key",
            (F.col("cluster_a") == F.col("cluster_b")).alias("is_match"),
        )
    )


def pairwise_prf(labeled: DataFrame, components: DataFrame) -> dict[str, float]:
    """P/R/F1 of same-component prediction over the labeled pair set."""
    ca = components.select(
        F.col("doc_id").alias("doc_a"), F.col("component_id").alias("comp_a")
    )
    cb = components.select(
        F.col("doc_id").alias("doc_b"), F.col("component_id").alias("comp_b")
    )
    joined = (
        labeled.join(ca, "doc_a", "left")
        .join(cb, "doc_b", "left")
        .select(
            "is_match",
            (
                F.col("comp_a").isNotNull()
                & (F.col("comp_a") == F.col("comp_b"))
            ).alias("pred"),
        )
    )
    row = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}
