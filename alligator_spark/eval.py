"""Evaluation: labeled co-blocked pairs + set-based pairwise P/R/F1 +
hierarchical CTA-style credit.

Mirrors the reference's set-based precision/recall/F1
(``eval/evaluators/cea_wd.py:37-63``): correct = |pred ∩ gold|,
P = correct/|pred|, R = correct/|gold|, F1 = 2PR/(P+R); and the
hierarchical CTA grading (``eval/evaluators/cta_wd.py:66-95``): an exact
annotation scores 1.0, an ancestor of the gold type at depth d <= 5
scores 0.8^d, a descendant at depth d <= 3 scores 0.7^d, anything else 0;
per column the max over gold types counts, P = total/|annotated|,
R = total/|gold columns|.

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


def hierarchical_prf(
    submission: DataFrame,
    gt: DataFrame,
    ancestors: DataFrame | None = None,
    descendants: DataFrame | None = None,
    max_ancestor_depth: int = 5,
    max_descendant_depth: int = 3,
) -> dict[str, float]:
    """CTA-style hierarchical credit (eval/evaluators/cta_wd.py:66-95).

    * submission(col_id, annotation) — ONE annotation per column (the
      reference raises on duplicates; here duplicate col_ids raise too).
    * gt(col_id, gt_type) — gold types, possibly several per column.
    * ancestors(gt_type, node, depth) — node is an ancestor of gt_type at
      depth >= 1; credit 0.8^depth while depth <= max_ancestor_depth.
    * descendants(gt_type, node, depth) — credit 0.7^depth while
      depth <= max_descendant_depth.

    Per annotated column the MAX credit over its gold types counts.
    P = total/|annotated columns|, R = total/|gold columns|,
    F1 = 2PR/(P+R). All comparisons case-insensitive like the reference.
    """
    spark = submission.sparkSession
    dup = (
        submission.groupBy("col_id").agg(F.count("*").alias("n")).filter("n > 1")
    )
    if dup.limit(1).count():
        raise ValueError("Duplicate columns in the submission")

    def lc(c):
        return F.lower(F.col(c).cast("string"))

    empty = spark.createDataFrame(
        [], "gt_type string, node string, depth int"
    )
    anc = (ancestors if ancestors is not None else empty).select(
        lc("gt_type").alias("gt_type"), lc("node").alias("node"), "depth"
    )
    desc = (descendants if descendants is not None else empty).select(
        lc("gt_type").alias("gt_type"), lc("node").alias("node"), "depth"
    )
    sub = submission.select("col_id", lc("annotation").alias("annotation"))
    gold = gt.select("col_id", lc("gt_type").alias("gt_type"))

    cand = sub.join(gold, "col_id")
    exact = F.when(F.col("annotation") == F.col("gt_type"), F.lit(1.0))
    with_anc = cand.join(
        anc.select(
            "gt_type",
            F.col("node").alias("annotation"),
            F.col("depth").alias("anc_depth"),
        ),
        ["gt_type", "annotation"],
        "left",
    ).join(
        desc.select(
            "gt_type",
            F.col("node").alias("annotation"),
            F.col("depth").alias("desc_depth"),
        ),
        ["gt_type", "annotation"],
        "left",
    )
    # reference parity (cta_wd.py:74-86 elif chain): an ancestor beyond
    # max_ancestor_depth scores 0 even if the same node is ALSO a
    # descendant within depth — the descendant branch is only reached
    # when the node is not an ancestor at all (anc_depth null)
    credit = F.coalesce(
        exact,
        F.when(
            F.col("anc_depth").isNotNull(),
            F.when(
                F.col("anc_depth") <= max_ancestor_depth,
                F.pow(F.lit(0.8), F.col("anc_depth")),
            ).otherwise(F.lit(0.0)),
        ),
        F.when(
            F.col("desc_depth") <= max_descendant_depth,
            F.pow(F.lit(0.7), F.col("desc_depth")),
        ),
        F.lit(0.0),
    )
    per_col = with_anc.select("col_id", credit.alias("credit")).groupBy(
        "col_id"
    ).agg(F.max("credit").alias("credit"))
    total = (per_col.agg(F.sum("credit")).collect()[0][0]) or 0.0
    n_annotated = sub.count()
    n_cols = gold.select("col_id").distinct().count()
    p = total / n_annotated if n_annotated else 0.0
    r = total / n_cols if n_cols else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "total_score": total}


_WD_PREFIX = "http://www.wikidata.org/entity/"


def cea_prf(
    submission: DataFrame, gt: DataFrame, iri_prefix: str | None = _WD_PREFIX
) -> dict[str, float]:
    """SemTab CEA set-based scoring (eval/evaluators/cea_wd.py:26-62).

    Both frames carry (tab_id, row_id, col_id, entity). Reference rules,
    replicated exactly: cells absent from the gt are ignored; duplicate
    submission cells (within the gt universe) raise; an annotation not
    starting with ``iri_prefix`` gets it prepended; it is correct when it
    appears (case-insensitively) in the gt entity's space-split list.
    P = correct/annotated, R = correct/|gt|.

    The gt is deduped to ONE row per cell key before the join (the
    reference loads it into a dict, so a duplicated gt key keeps a single
    entry — cea_wd.py:30-35; with no meaningful file order in a
    distributed read we keep the lexicographically greatest entity, which
    is deterministic). Without this, a duplicated gt key would fan out
    the join and either spuriously raise the duplicate-submission error
    or double-count.
    """
    key = ["tab_id", "row_id", "col_id"]
    g = gt.groupBy(*key).agg(F.max("entity").alias("gt_entity"))
    s = submission.select(*key, "entity")
    annotated = s.join(g, key)
    dup = annotated.groupBy(*key).agg(F.count("*").alias("n")).filter("n > 1")
    if dup.limit(1).count():
        raise ValueError("Duplicate cells in the submission file")
    ann = F.lower("entity")
    if iri_prefix:
        ann = F.lower(
            F.when(
                F.col("entity").startswith(iri_prefix), F.col("entity")
            ).otherwise(F.concat(F.lit(iri_prefix), F.col("entity")))
        )
    correct_expr = F.array_contains(
        F.split(F.lower("gt_entity"), " "), ann
    )
    row = annotated.agg(
        F.count("*").alias("annotated"),
        F.sum(correct_expr.cast("long")).alias("correct"),
    ).collect()[0]
    n_gt = gt.select(*key).distinct().count()
    annotated_n = int(row["annotated"] or 0)
    correct = int(row["correct"] or 0)
    p = correct / annotated_n if annotated_n else 0.0
    r = correct / n_gt if n_gt else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "correct": correct,
        "annotated": annotated_n,
        "gt_cells": n_gt,
    }


_WD_PROP_PREFIX = "http://www.wikidata.org/prop/direct/"


def cpa_prf(
    submission: DataFrame, gt: DataFrame, iri_prefix: str | None = _WD_PROP_PREFIX
) -> dict[str, float]:
    """SemTab CPA scoring (eval/evaluators/cpa_wd.py:33-65).

    Both frames carry (tab_id, sub_col_id, obj_col_id, property).
    Reference rules, replicated exactly: the gt is a dict keyed
    (tab_id, sub_col_id, obj_col_id) — deduped to one property per key;
    submission rows outside the gt universe are ignored; duplicate
    submission keys (within the gt universe) raise; an annotation not
    starting with ``iri_prefix`` gets it prepended; correct = exact
    case-insensitive equality with the gt property. P = correct/annotated,
    R = correct/|gt keys|, F1 = 2PR/(P+R).
    """
    key = ["tab_id", "sub_col_id", "obj_col_id"]
    g = gt.groupBy(*key).agg(F.max("property").alias("gt_property"))
    s = submission.select(*key, "property")
    annotated = s.join(g, key)
    dup = annotated.groupBy(*key).agg(F.count("*").alias("n")).filter("n > 1")
    if dup.limit(1).count():
        raise ValueError("Duplicate column pairs in the submission file")
    ann = F.col("property")
    if iri_prefix:
        ann = F.when(ann.startswith(iri_prefix), ann).otherwise(
            F.concat(F.lit(iri_prefix), ann)
        )
    correct_expr = F.lower(ann) == F.lower("gt_property")
    row = annotated.agg(
        F.count("*").alias("annotated"),
        F.sum(correct_expr.cast("long")).alias("correct"),
    ).collect()[0]
    n_gt = g.count()
    annotated_n = int(row["annotated"] or 0)
    correct = int(row["correct"] or 0)
    p = correct / annotated_n if annotated_n else 0.0
    r = correct / n_gt if n_gt else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "correct": correct,
        "annotated": annotated_n,
        "gt_pairs": n_gt,
    }


def _read_headerless(spark, path: str, cols: list[str]) -> DataFrame:
    df = spark.read.csv(path, header=False, inferSchema=False)
    return df.toDF(*cols[: len(df.columns)])


def main(argv: list[str] | None = None) -> int:
    """SemTab-style eval entry point (reference: eval/cea_evaluate.py:54-63,
    eval/inference.py:100-107): score a prediction CSV against a ground
    truth CSV and print one JSON line with P/R/F1 + rows/s.

    CEA CSVs are headerless (tab_id, row_id, col_id, entity); CTA pred is
    (tab_id, col_id, annotation), CTA gt is (tab_id, col_id, types) with
    space-separated gold types, plus optional --ancestors/--descendants
    CSVs (gt_type, node, depth); CPA CSVs are
    (tab_id, sub_col_id, obj_col_id, property) per cpa_evaluate.py.

    IRI-prefix rule (all three tasks, opt out with --no-iri-prefix): a
    bare annotation gets the Wikidata prefix prepended — entity/ for
    CEA and CTA (cea_wd.py:49-50, cta_wd.py:62-63), prop/direct/ for
    CPA (cpa_wd.py:52-53) — so bare-QID submissions score against IRI
    ground truth exactly like the reference.
    """
    import argparse
    import json
    import time

    ap = argparse.ArgumentParser(prog="alligator_spark.eval")
    ap.add_argument("--task", choices=["cea", "cta", "cpa"], default="cea")
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--ancestors")
    ap.add_argument("--descendants")
    ap.add_argument("--no-iri-prefix", action="store_true")
    args = ap.parse_args(argv)

    from alligator_spark.session import get_spark

    spark = get_spark(app_name="alligator_eval")
    t0 = time.monotonic()
    if args.task == "cea":
        sub = _read_headerless(
            spark, args.pred, ["tab_id", "row_id", "col_id", "entity"]
        )
        gt = _read_headerless(
            spark, args.gt, ["tab_id", "row_id", "col_id", "entity"]
        )
        res = cea_prf(
            sub, gt, iri_prefix=None if args.no_iri_prefix else _WD_PREFIX
        )
        n_rows = res["annotated"]
    elif args.task == "cpa":
        cols = ["tab_id", "sub_col_id", "obj_col_id", "property"]
        sub = _read_headerless(spark, args.pred, cols)
        gt = _read_headerless(spark, args.gt, cols)
        res = cpa_prf(
            sub, gt, iri_prefix=None if args.no_iri_prefix else _WD_PROP_PREFIX
        )
        n_rows = res["annotated"]
    else:
        sub = _read_headerless(spark, args.pred, ["tab_id", "col_id", "annotation"])
        gt = _read_headerless(spark, args.gt, ["tab_id", "col_id", "types"])
        key = F.concat_ws(" ", "tab_id", "col_id")
        # reference parity (cta_wd.py:62-63): prepend the entity/ IRI
        # prefix to bare annotations BEFORE the hierarchy lookup — a
        # standard SemTab CTA submission carries bare QIDs while the gt
        # and ancestor/descendant tables carry full IRIs
        ann = F.col("annotation")
        if not args.no_iri_prefix:
            ann = F.when(ann.startswith(_WD_PREFIX), ann).otherwise(
                F.concat(F.lit(_WD_PREFIX), ann)
            )
        sub2 = sub.select(key.alias("col_id"), ann.alias("annotation"))
        gt2 = gt.select(
            key.alias("col_id"),
            F.explode(F.split("types", " ")).alias("gt_type"),
        )
        anc = desc = None
        cols = ["gt_type", "node", "depth"]
        if args.ancestors:
            anc = _read_headerless(spark, args.ancestors, cols).withColumn(
                "depth", F.col("depth").cast("int")
            )
        if args.descendants:
            desc = _read_headerless(spark, args.descendants, cols).withColumn(
                "depth", F.col("depth").cast("int")
            )
        res = hierarchical_prf(sub2, gt2, ancestors=anc, descendants=desc)
        n_rows = sub2.count()
    elapsed = time.monotonic() - t0
    res_out = {
        "task": args.task,
        **{k: round(v, 6) if isinstance(v, float) else v for k, v in res.items()},
        "elapsed_sec": round(elapsed, 3),
        "rows_per_sec": round(n_rows / elapsed, 1) if elapsed else None,
    }
    print(json.dumps(res_out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main(sys.argv[1:]))
