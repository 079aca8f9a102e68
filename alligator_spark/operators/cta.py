"""CTA/CPA-analogue final outputs: per-component winning type keys and
winning predicate keys.

The reference's rerank stage ends by writing, per column, the argmax-count
type annotation and per column-pair the argmax predicate — both via
``keys_with_max_count`` over the global frequency counters, ties kept
(``/root/reference/alligator/ml.py:237-269``,
``keys_with_max_count`` in ``alligator/utils.py``). The pairwise mapping
used throughout this engine (operators/rerank.py module docstring):

* column      -> a cluster/component of linked docs
* type        -> a mention token carried by a member doc
* predicate   -> a literal-span kind (number/date/string), valued by the
                 accepted edges' per-kind similarity

Both operators are pure DataFrame compositions (groupBy + window argmax
with ties), one shuffle each on the component key — no driver loops, no
Python rows. Winners explode to one row per tied key so the output is
flat, deterministic and SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keys_with_max_count(
    counts: DataFrame, group_col: str, key_col: str, count_col: str
) -> DataFrame:
    """All keys tied at the max count per group (the reference's
    keys_with_max_count): (group, key, count) -> same schema filtered to
    the per-group maxima. rank() keeps ties — exactly the reference's
    semantics of returning EVERY argmax key, not one winner."""
    w = Window.partitionBy(group_col).orderBy(F.desc(count_col))
    return (
        counts.withColumn("_rk", F.rank().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def cta_winners(components: DataFrame, doc_keys: DataFrame) -> DataFrame:
    """Per component, the winning type keys: count DISTINCT member docs
    carrying each key (per-doc dedup — the reference's ``seen_types``),
    keep every key tied at the max.

    components(doc_id, component_id) x doc_keys(doc_id, key) ->
    (component_id, type_key, doc_count)."""
    counts = (
        components.join(doc_keys, "doc_id")
        .select("component_id", "doc_id", "key")
        .distinct()
        .groupBy("component_id", "key")
        .agg(F.count("*").alias("doc_count"))
    )
    return keys_with_max_count(
        counts, "component_id", "key", "doc_count"
    ).select(
        "component_id", F.col("key").alias("type_key"), "doc_count"
    )


def cpa_winners(
    components: DataFrame,
    edges: DataFrame,
    pred_col: str = "predicates",
) -> DataFrame:
    """Per component, the winning predicate kinds: each accepted edge
    inside a component contributes its per-kind similarity map
    (``predicates`` from the scoring stage — the reference's
    ``{pred: score}`` records, alligator/feature.py:313-359); kinds are
    summed over edges and the argmax kinds (ties kept) win.

    components(doc_id, component_id) x
    edges(doc_a, doc_b, <pred_col>: map<string,double>) ->
    (component_id, pred_key, value_sum)."""
    comp_a = components.select(
        F.col("doc_id").alias("doc_a"), F.col("component_id")
    )
    within = (
        edges.join(comp_a, "doc_a")
        .select(
            "component_id",
            F.explode(F.col(pred_col)).alias("pred_key", "value"),
        )
        .filter(F.col("value") > 0)
    )
    sums = within.groupBy("component_id", "pred_key").agg(
        F.round(F.sum("value"), 6).alias("value_sum")
    )
    return keys_with_max_count(sums, "component_id", "pred_key", "value_sum")
