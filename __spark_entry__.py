"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline on the
deterministic synthetic corpus. ``queries()`` exposes one entry per
implemented operator family from SURVEY.md §2 (plus the training-data
curation operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query. Float outputs are rounded identically
on both sides so the driver's value-hash compare is stable.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

_SPEC_BY_SF = {
    # sf dir basename -> (entities, dups, distractors)
    "sf0.001": (20, 3, 20),
    "sf0.01": (100, 4, 100),
    "sf0.1": (1000, 4, 1000),
}


def _corpus_spec(sf_dir: str):
    from alligator_spark.datagen import CorpusSpec

    b, k, d = _SPEC_BY_SF.get(os.path.basename(sf_dir.rstrip("/")), (100, 4, 100))
    return CorpusSpec(n_entities=b, dups_per_entity=k, n_distractors=d, seed=42)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _clean_expr(c):
    from alligator_spark.functions.textnorm import clean_str_col

    return clean_str_col(c)


# --------------------------------------------------------------- ER family


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full blocking->scoring->clustering linkage on the
    deterministic synthetic interleaved-doc corpus (SURVEY §3.4).

    Exact oracle: the pipeline's output at the sf0.01 spec (100 entities
    x 4 dups + 100 distractors, seed 42) equals the closed-form gold
    clustering (docs 4j..4j+3 -> component d%010d(4j); distractors
    singleton) — pairwise F1 is exactly 1.0, verified this round — so the
    oracle IS the generator's index arithmetic."""
    from alligator_spark.datagen import generate_docs
    from alligator_spark.plans.pipeline import run_linkage

    docs = generate_docs(spark, _corpus_spec(sf_dir))
    out = run_linkage(spark, docs)
    return out["components"].select("doc_id", "component_id")


def q_er_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the flagship output (A6-style counts)."""
    comps = q_er_clusters(spark, sf_dir)
    return (
        comps.groupBy("component_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


def q_er_exact_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components where edges = exact normalized-text equality
    (oracle-checkable clustering: components == min doc_id per group)."""
    from alligator_spark.operators.clustering import connected_components

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _clean_expr(F.col("text")).alias("ctext")
    )
    reps = docs.groupBy("ctext").agg(F.min("doc_id").alias("rep"))
    edges = (
        docs.join(reps, "ctext")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("doc_a"), F.col("rep").alias("doc_b"))
    )
    return connected_components(
        edges, all_nodes=docs.select("doc_id")
    ).select("doc_id", "component_id")


def q_er_planted_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full blocking->scoring->clustering pipeline with an EXACT oracle:
    the corpus is the documents table plus two planted duplicates per doc
    whose mentions differ only by clean_str-invariant noise (case flips,
    underscores for spaces, a bracketed ref suffix — exactly the noise
    alligator/utils.py:56-75 normalizes away). Literal spans (the doc_id
    as a number, its md5 as a string) are identical within a group and
    dissimilar across groups, so every planted group must fully cluster
    and nothing else may merge: the expected components are closed-form.

    Rerank is disabled here by design: its corpus-global boost promotes
    genuinely near-identical cross-doc texts (a correct behavior with its
    own exact oracles), which would make this query's expected output
    corpus-dependent.
    """
    from alligator_spark.operators.blocking import BlockingConfig
    from alligator_spark.operators.rerank import RerankConfig
    from alligator_spark.plans.pipeline import PipelineConfig, run_linkage

    docs = _t(spark, sf_dir, "documents")

    def variant(suffix: str, mention):
        def span(kind, text, off):
            return F.struct(
                F.lit(kind).alias("kind"),
                text.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(off).alias("offset"),
            )

        return docs.select(
            F.concat(
                F.lit("d"), F.col("doc_id").cast("string"), F.lit(suffix)
            ).alias("doc_id"),
            F.array(
                span("mention", mention, 0),
                span("literal_number", F.col("doc_id").cast("string"), 1),
                span("literal_string", F.md5(F.col("doc_id").cast("string")), 2),
            ).alias("spans"),
        )

    base = variant("", F.col("text"))
    dup_a = variant(
        "a",
        F.concat(
            F.regexp_replace(F.upper(F.col("text")), " ", "_"), F.lit(" [1a]")
        ),
    )
    dup_b = variant("b", F.concat(F.col("text"), F.lit(" [7x]")))
    corpus = base.unionByName(dup_a).unionByName(dup_b)
    cfg = PipelineConfig(
        blocking=BlockingConfig(), rerank=RerankConfig(enabled=False)
    )
    out = run_linkage(spark, corpus, cfg)
    return out["components"].select("doc_id", "component_id")


def q_block_keys_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sort blocking key per document (SURVEY §7.1 step 3)."""
    from alligator_spark.functions.textnorm import token_sort_key_col

    docs = _t(spark, sf_dir, "documents")
    cleaned = _clean_expr(F.col("text"))
    return docs.select(
        "doc_id",
        token_sort_key_col(cleaned).alias("block_key"),
        token_sort_key_col(cleaned, 2).alias("block_key_prefix2"),
    )


def q_clean_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference clean_str normalization (F1, alligator/utils.py:56-75)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", _clean_expr(F.col("text")).alias("ctext"))


# --------------------------------------------- scans / filters / projections


def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1+P4: pushed-down scan, projection, predicate.

    Predicates chosen to be selective but NON-empty at every correctness
    scale factor (~700 rows at sf0.001) so the oracle's value-hash compare
    is meaningful, not vacuous."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 30)
    ).select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))


# ------------------------------------------------------------- joins / aggs


def q_join_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4-style enrichment join + partial-agg rollup per nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


def q_agg_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (CTA frequency) semantics: per event_type, fraction of distinct
    users emitting it (per-doc dedup then / n_docs). The denominator is a
    broadcast scalar subquery (1-row agg crossJoin), not a driver collect
    — one scan of events instead of two."""
    e = _t(spark, sf_dir, "events")
    total = e.agg(F.countDistinct("user_id").cast("double").alias("_n"))
    return (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("_u"))
        .crossJoin(F.broadcast(total))
        .select("event_type", F.round(F.col("_u") / F.col("_n"), 6).alias("freq"))
    )


def q_agg_cpa_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (CPA frequency) semantics: per event_type, sum of per-user max
    value / n distinct users overall (broadcast scalar denominator)."""
    e = _t(spark, sf_dir, "events")
    total = e.agg(F.countDistinct("user_id").cast("double").alias("_n"))
    per_user = e.groupBy("event_type", "user_id").agg(F.max("value").alias("mx"))
    return (
        per_user.groupBy("event_type")
        .agg(F.sum("mx").alias("_s"))
        .crossJoin(F.broadcast(total))
        .select("event_type", F.round(F.col("_s") / F.col("_n"), 6).alias("cpa_freq"))
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2: top-3 orders per customer by totalprice (deterministic
    tie-break on orderkey)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rk")
    )


def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 argmax: per nation, the customer with max acctbal (tie-break
    custkey asc) — keys_with_max_count analogue."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(
            "c_nationkey",
            F.col("c_custkey").alias("top_custkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/exact dedup: one representative per distinct document text."""
    from alligator_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------- text analysis


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from alligator_spark.operators.text_analysis import token_stats

    return token_stats(docs, "text").select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        F.round("avg_token_len", 4).alias("avg_token_len"),
    )


def q_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal counts (all integers — exact cross-engine compare):
    punctuation chars, stopword hits, distinct tokens, tokens, chars."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    toks = F.split(F.trim(t), r"\s+")
    from alligator_spark.operators.text_analysis import EN_STOPWORDS

    return docs.select(
        "doc_id",
        F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")).alias("punct_chars"),
        F.size(
            F.array_intersect(
                F.transform(toks, F.lower),
                F.array(*[F.lit(w) for w in EN_STOPWORDS]),
            )
        ).alias("stopword_hits"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"),
        F.size(toks).alias("n_tokens"),
        F.length(t).alias("n_chars_computed"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite heuristic quality score, emitted as floor-scaled basis
    points: both engines compute the identical IEEE double (same literal
    constants, same operation order), and floor() of an identical double
    is engine-independent — unlike round(), whose half-way tie handling
    differs (Spark decimal HALF_UP vs binary rounding)."""
    docs = _t(spark, sf_dir, "documents")
    from alligator_spark.operators.text_analysis import quality_score

    def bp(c):
        return F.floor(F.col(c) * 10000.0).cast("long").alias(c + "_bp")

    return quality_score(docs, "text").select(
        "doc_id",
        bp("punct_ratio"),
        bp("stopword_ratio"),
        bp("distinct_token_ratio"),
        bp("quality"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from alligator_spark.operators.text_analysis import lang_id

    return lang_id(docs, "text").select(
        "doc_id", "hits_en", "hits_de", "hits_fr", "hits_es", "lang_pred"
    )


def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: raw + normalized Levenshtein between consecutive documents."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select((F.col("doc_id") - 1).alias("id_a"), F.col("text").alias("tb"))
    j = a.join(b, "id_a")
    return j.select(
        "id_a",
        F.levenshtein("ta", "tb").alias("lev"),
        F.round(
            F.levenshtein("ta", "tb")
            / F.greatest(F.length("ta"), F.length("tb"), F.lit(1)),
            6,
        ).alias("lev_norm"),
    )


def q_token_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 token-set overlap (|A∩B|/max(|A|,|B|,1)) between same-source
    document pairs, thresholded. The self-join is banded to a doc_id
    window of 1000 so it stays linear in corpus size (covers every pair at
    the correctness SFs; a corpus-scale run would use the ER pair stage's
    block caps instead of an uncapped low-cardinality key).

    Plan shape (r6): the band itself is part of the JOIN KEY — bucket =
    doc_id div 1000; doc_b in (doc_a, doc_a+1000] implies bucket_b in
    {bucket_a, bucket_a+1}, so the probe side carries each doc under both
    its own bucket and bucket-1 and the join equi-matches on (source,
    bucket). A pair can match under at most one probe bucket (the two
    probe keys differ), so no dedup is needed and the emitted pair set is
    IDENTICAL to the pure source-keyed join — but each hash probe now
    iterates ~band-sized groups instead of the whole source group
    (O(docs x band) comparisons instead of O(docs^2/sources)). Token sets
    are compared as xxhash64 arrays (ints intersect far cheaper than
    strings); |A∩B| is preserved exactly unless two distinct tokens of a
    pair collide in 64 bits (~1e-16/pair) — oracle-verified exact at
    every correctness SF after the change."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
    ).select(
        "doc_id",
        "source",
        F.floor(F.col("doc_id") / F.lit(1000)).alias("bucket"),
        F.size("toks").alias("n_toks"),
        F.transform("toks", lambda t: F.xxhash64(t)).alias("th"),
    )
    a = docs.select(
        "source",
        "bucket",
        F.col("doc_id").alias("doc_a"),
        F.col("n_toks").alias("na"),
        F.col("th").alias("ha"),
    )
    b_own = docs.select(
        "source",
        "bucket",
        F.col("doc_id").alias("doc_b"),
        F.col("n_toks").alias("nb"),
        F.col("th").alias("hb"),
    )
    b = b_own.unionAll(b_own.withColumn("bucket", F.col("bucket") - 1))
    pairs = a.join(b, ["source", "bucket"]).filter(
        (F.col("doc_a") < F.col("doc_b")) & (F.col("doc_b") <= F.col("doc_a") + 1000)
    )
    jac = F.size(F.array_intersect("ha", "hb")) / F.greatest(
        F.col("na"), F.col("nb"), F.lit(1)
    )
    return pairs.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("tok_jaccard")
    ).filter(F.col("tok_jaccard") >= 0.8)


def q_number_sim_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 number similarity (1-|a-b|/max(|a|,|b|,1)) between consecutive
    event values per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev = F.lag("value").over(w)
    simexpr = 1 - F.abs(F.col("value") - prev) / F.greatest(
        F.abs(F.col("value")), F.abs(prev), F.lit(1.0)
    )
    return (
        e.withColumn("num_sim", F.round(simexpr, 6))
        .filter(F.col("num_sim").isNotNull())
        .select("event_id", "user_id", "num_sim")
    )


def q_date_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 date similarity vs anchor 2000-06-15: mean of Y/M/D number sims."""
    e = _t(spark, sf_dir, "events")
    y, m, d = F.year("ts"), F.month("ts"), F.dayofmonth("ts")

    def ns(a, bval):
        b = F.lit(float(bval))
        return 1 - F.abs(a - b) / F.greatest(F.abs(a.cast("double")), F.abs(b), F.lit(1.0))

    simexpr = (ns(y, 2000) + ns(m, 6) + ns(d, 15)) / 3
    return e.select("event_id", F.round(simexpr, 6).alias("date_sim"))


def q_row_filter_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 target_rows filter: keep only whitelisted ids (reference
    alligator/manager/data.py:199-203)."""
    docs = _t(spark, sf_dir, "documents")
    whitelist = [1, 3, 5, 8, 13, 21, 34, 55, 89, 144]
    return docs.filter(F.col("doc_id").isin(whitelist)).select(
        "doc_id", "lang", "source"
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 set algebra over tables: high-value clickers EXCEPT big
    purchasers, INTERSECT engaged viewers. Value thresholds chosen so all
    three legs AND the final result are non-empty at every correctness SF
    (the previous type-only version was empty by construction — every
    synthetic user emits every event type). No driver-side collects."""
    e = _t(spark, sf_dir, "events")
    a = (
        e.filter((F.col("event_type") == "click") & (F.col("value") > 100))
        .select("user_id").distinct()
    )
    b = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 300))
        .select("user_id").distinct()
    )
    hi = (
        e.filter((F.col("event_type") == "view") & (F.col("value") > 50))
        .select("user_id").distinct()
    )
    return a.exceptAll(b).intersect(hi)


def q_arrays_overlap_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 semi-join via array intersection: docs sharing >=2 tokens with a
    probe token set (reference alligator/feature.py:293-311)."""
    docs = _t(spark, sf_dir, "documents")
    probe = ["spark", "join", "shuffle", "partition", "query"]
    toks = F.array_distinct(F.split(F.trim("text"), r"\s+"))
    overlap = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in probe])))
    return docs.select("doc_id", overlap.alias("n_shared")).filter(
        F.col("n_shared") >= 2
    )


def q_sorted_freq_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/T4: per event_type, the top-5 per-user event counts sorted desc
    (sorted feature lists, reference alligator/ml.py:166-199) — exploded
    to rows for cross-engine comparison."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .select("event_type", "rk", "cnt")
    )


def q_sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/T5: deterministic 32-row sample scan (order-then-limit; the
    reference's nrows=32 schema-inference sample)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").limit(32).select("doc_id", "lang", "n_chars")


# ----------------------------------------------------------- M3 rerank ops


def _rerank_inputs(spark: SparkSession, sf_dir: str):
    """Deterministic rerank inputs from the documents table: candidates =
    banded same-source pairs scored by token jaccard (SQL-expressible, so
    DuckDB can replay the exact same candidate lists), doc_keys = distinct
    whitespace tokens."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
    )
    a = docs.select("source", F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = docs.select("source", F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")) / F.greatest(
        F.size("ta"), F.size("tb"), F.lit(1)
    )
    cand = (
        a.join(b, "source")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("doc_b") <= F.col("doc_a") + 1000))
        .select("doc_a", "doc_b", jac.alias("score"))
        .filter(F.col("score") >= 0.1)
    )
    doc_keys = docs.select("doc_id", F.explode("toks").alias("key"))
    return cand, doc_keys


def q_rerank_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/A2 global frequency counts over each doc's top-3 candidates
    (per-doc dedup — reference seen_types, alligator/feature.py:226-233),
    via the real rerank operators."""
    from alligator_spark.operators.rerank import candidate_topn, global_key_freq

    cand, doc_keys = _rerank_inputs(spark, sf_dir)
    topn = candidate_topn(cand, n=3)
    return global_key_freq(topn, doc_keys, min_docs=2)


def q_rerank_weighted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 rarity-weighted overlap per candidate pair (integer rarity
    weights -> exact cross-engine arithmetic; emitted as floor(rw*1e6))."""
    from alligator_spark.operators.rerank import (
        candidate_topn,
        global_key_freq,
        weighted_overlap,
    )

    cand, doc_keys = _rerank_inputs(spark, sf_dir)
    topn = candidate_topn(cand, n=3)
    freq = global_key_freq(topn, doc_keys, min_docs=2)
    n_docs = _t(spark, sf_dir, "documents").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    out = weighted_overlap(
        cand.select("doc_a", "doc_b"), doc_keys, freq, n_docs, "rw"
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.floor(F.col("rw") * 1000000.0).cast("long").alias("rw_micro"),
    )


def q_cea_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEA-style ranked candidate output (T1/T2 + J4): per doc, top-5
    candidates sorted by score desc (cand asc tie-break), via the real
    output operator over the deterministic candidate set."""
    from alligator_spark.operators.output import cea_exploded

    cand, _ = _rerank_inputs(spark, sf_dir)
    out = cea_exploded(cand, k=5)
    return out.select(
        "doc_id",
        "rank",
        "cand_id",
        F.floor(F.col("score") * 1000000.0).cast("long").alias("score_micro"),
    )


# ----------------------------------------------------- CTA / CPA winners


def q_cta_winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTA-analogue final output via the real operator: components =
    source groups, type keys = distinct whitespace tokens; winners = ALL
    keys tied at the max distinct-doc count per component (the reference's
    keys_with_max_count, ml.py:237-269)."""
    from alligator_spark.operators.cta import cta_winners

    docs = _t(spark, sf_dir, "documents")
    components = docs.select("doc_id", F.col("source").alias("component_id"))
    doc_keys = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim("text"), r"\s+"))
        ).alias("key"),
    )
    return cta_winners(components, doc_keys)


def q_cpa_winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPA-analogue final output via the real operator: edges =
    consecutive same-source doc pairs carrying an integer-valued predicate
    map (token_overlap / char_match / lang_match), winners = kinds tied at
    the max per-component sum (ties kept)."""
    from alligator_spark.operators.cta import cpa_winners

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    # banded same-source pairs (sources are round-robin over doc_id, so a
    # +1 window would be EMPTY — vacuous oracle; the 50-window keeps the
    # edge set small but non-trivial at every correctness SF)
    edges = (
        a.join(
            b,
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + 50)
            & (F.col("a.source") == F.col("b.source")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.create_map(
                F.lit("token_overlap"),
                F.size(F.array_intersect("a.toks", "b.toks")).cast("double"),
                F.lit("char_match"),
                (F.col("a.n_chars") == F.col("b.n_chars")).cast("double"),
                F.lit("lang_match"),
                (F.col("a.lang") == F.col("b.lang")).cast("double"),
            ).alias("predicates"),
        )
    )
    components = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").alias("component_id")
    )
    return cpa_winners(components, edges)


# ------------------------------------------------- dedup / ANN (rows-only)


def _md5_planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-demo corpus with an exact oracle for sub-1.0 thresholds:
    texts are md5(text) (random-looking 32-char strings — every distinct
    raw pair sits FAR below any near-dup threshold: max 3-gram jaccard and
    min SimHash Hamming were measured at sf0.01) plus an exact copy of
    every fifth doc under doc_id+10000. Expected components are closed
    form: {i, i+10000} for i % 5 == 0, singletons otherwise.

    Why not the raw documents table: its synthetic texts share vocabulary
    heavily (pairs up to gram-jaccard 1.0 with DIFFERENT strings), and at
    thresholds below 1.0 LSH candidate recall is probabilistic BY DESIGN
    (1-(1-j^r)^b < 1), so no engine-independent oracle exists for the raw
    corpus — measured: the true >=0.9-closure differs from the LSH result
    at sf0.01. The probabilistic band recall is measured in pytest
    (tests/test_curation_ops.py) instead; this query pins the full
    bucket->salt-split->verify->CC machinery on a provable answer."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("text")
    )
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup at threshold 0.7 over the md5-planted corpus
    (exact closed-form oracle — see _md5_planted_docs)."""
    from alligator_spark.operators.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(
        _md5_planted_docs(spark, sf_dir), "doc_id", "text", threshold=0.7
    )


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + an exact copy of every fifth doc under doc_id+10000 —
    the derived corpus both engines can build, giving the dedup family
    non-trivial clusters with a provable expected answer."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


def q_minhash_exactset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup at threshold 1.0 over the planted corpus. At
    jaccard == 1.0 the components are EXACTLY the equal-3-gram-set groups:
    equal gram sets share every band (candidate generation is complete for
    them), and the verify stage rejects everything below 1.0 — so a pure
    SQL oracle (group by sorted distinct gram list) checks the whole
    bucket->verify->connected-components machinery end to end."""
    from alligator_spark.operators.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(
        _planted_docs(spark, sf_dir), "doc_id", "text", threshold=1.0
    )


def q_embedding_neardup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dup over embeddings + planted exact
    copies (vec_id+10000 for every fifth vector). Identical vectors share
    every bucket and verify at cosine 1.0; the max cross-pair cosine in
    this corpus is ~0.51 << 0.97, so the expected components are exactly
    base∪copy pairs — a closed-form SQL oracle."""
    from alligator_spark.operators.dedup import embedding_neardup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    return embedding_neardup(corpus, "vec_id", "embedding", threshold=0.97)


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup (Hamming <= 3) over the md5-planted corpus: identical
    texts hash to Hamming 0 and distinct md5 strings sit far above 3
    (measured at sf0.01), so the closed-form planted oracle is exact. The
    crc32/splitmix64 signature itself is not SQL-reproducible, which rules
    out a raw-corpus truth oracle (see _md5_planted_docs)."""
    from alligator_spark.operators.dedup import simhash_dedup

    return simhash_dedup(
        _md5_planted_docs(spark, sf_dir), "doc_id", "text", max_hamming=3
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 10 vectors."""
    from alligator_spark.operators.similarity_search import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def _planted_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-recall corpus with a provable top-k: embeddings (cast to
    double) plus, for each query vector (vec_id < 10), five planted
    near-copies (element 0 shifted by 0.01*j, ids 100000+vec_id*10+j).
    The planted cosines (~0.9999+) tower over the ~0.5 background, so the
    exact top-5 of every query IS its planted set — verified at sf0.01 —
    and an ANN method with working bucketing must recover all five."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    parts = [emb]
    for j in range(1, 6):
        parts.append(
            emb.filter(F.col("vec_id") < 10).select(
                (F.lit(100000) + F.col("vec_id") * 10 + F.lit(j)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + F.when(i == 0, F.lit(0.01) * F.lit(j)).otherwise(F.lit(0.0)),
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _ann_hits_at_5(corpus: DataFrame, ann: DataFrame) -> DataFrame:
    """(query_id, hits_at_5): |ANN top-5 ∩ exact top-5| per query — the
    VERDICT-prescribed checkable recall column. Exact side computed by the
    independently-oracled brute_force_topk."""
    from alligator_spark.operators.similarity_search import brute_force_topk

    q = corpus.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(corpus, q, "vec_id", "embedding", k=5)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("hits_at_5"))
    )
    qs = q.select(F.col("vec_id").alias("query_id"))
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("hits_at_5", F.lit(0)).cast("long").alias("hits_at_5"),
    )


def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN recall vs exact top-5 on the planted corpus:
    expected hits_at_5 == 5 for every query (closed-form oracle)."""
    from alligator_spark.operators.similarity_search import lsh_topk

    corpus = _planted_vectors(spark, sf_dir).localCheckpoint(eager=True)
    q = corpus.filter(F.col("vec_id") < 10)
    ann = lsh_topk(corpus, q, "vec_id", "embedding", k=5)
    return _ann_hits_at_5(corpus, ann)


def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN recall vs exact top-5 on the planted corpus: expected
    hits_at_5 == 5 for every query (closed-form oracle)."""
    from alligator_spark.operators.similarity_search import ivf_topk

    corpus = _planted_vectors(spark, sf_dir).localCheckpoint(eager=True)
    q = corpus.filter(F.col("vec_id") < 10)
    ann = ivf_topk(corpus, q, "vec_id", "embedding", k=5, n_centroids=16, nprobe=4)
    return _ann_hits_at_5(corpus, ann)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup on the RAW embeddings table. Exact oracle: the
    max pairwise cosine at the correctness SF is ~0.5 << 0.97 (measured),
    so the provable output is all-singletons — this pins the
    no-false-merge side; the planted sibling pins recall."""
    from alligator_spark.operators.dedup import embedding_neardup

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, "vec_id", "embedding", threshold=0.97)


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True winnowing fingerprints (k=8 grams, window=8, md5-hex minima) —
    exactly reproducible in DuckDB via md5/list_min."""
    from alligator_spark.operators.text_analysis import fingerprint_docs

    docs = _t(spark, sf_dir, "documents")
    out = fingerprint_docs(docs, "doc_id", "text")
    return out.select("doc_id", F.explode("fingerprint").alias("fp_hash"))


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over a media table DERIVED from the documents
    table (so the oracle sees the same refs): synthesize (media_ref,
    payload) for every third doc, run the real mapInPandas decode (fake
    codecs), emit the typed metadata. The fake decode keys off
    md5_number_lower semantics -> exact DuckDB oracle."""
    from alligator_spark.operators.multimodal import decode_media

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = docs.select(
        F.concat(
            F.lit("media://"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"), F.lit(".bin"),
        ).alias("media_ref")
    ).withColumn(
        "payload",
        F.encode(F.substring(F.repeat(F.col("media_ref"), 8), 1, 256), "utf-8"),
    )
    return decode_media(media, fake=True)


def q_infer_column_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column classification for untyped input (reference
    ``alligator/manager/data.py:78-141``): an untyped 5-column string
    table derived from documents (a numeric id, long free text, a short
    label, a synthesized ISO date, an all-empty column) classified from
    a deterministic 32-row sample into NUMBER / STRING / NE / DATETIME /
    IGNORED. Integer evidence counts ship with the verdict, so the
    DuckDB oracle replays the exact rules."""
    from alligator_spark.operators.classify import classify_columns

    docs = _t(spark, sf_dir, "documents")
    untyped = docs.select(
        F.col("doc_id").cast("string").alias("u_id"),
        F.col("text").alias("u_text"),
        F.col("lang").alias("u_lang"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 300).cast("int")),
            "yyyy-MM-dd",
        ).alias("u_date"),
        F.lit("").alias("u_empty"),
    )
    return classify_columns(untyped, order_by="u_id")


# ------------------------------------------------------------- the contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_er_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "er_clusters": q_er_clusters,
        "er_cluster_sizes": q_er_cluster_sizes,
        "er_exact_components": q_er_exact_components,
        "er_planted_clusters": q_er_planted_clusters,
        "block_keys_token_sort": q_block_keys_token_sort,
        "clean_str": q_clean_str,
        "scan_project_filter": q_scan_project_filter,
        "join_agg_revenue": q_join_agg_revenue,
        "agg_type_freq": q_agg_type_freq,
        "agg_cpa_freq": q_agg_cpa_freq,
        "topk_per_group": q_topk_per_group,
        "argmax_per_group": q_argmax_per_group,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "quality_counts": q_quality_counts,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "edit_distance": q_edit_distance,
        "token_jaccard_pairs": q_token_jaccard_pairs,
        "number_sim_lag": q_number_sim_lag,
        "date_sim": q_date_sim,
        "row_filter_whitelist": q_row_filter_whitelist,
        "set_ops": q_set_ops,
        "arrays_overlap_semijoin": q_arrays_overlap_semijoin,
        "sorted_freq_lists": q_sorted_freq_lists,
        "sample_scan": q_sample_scan,
        "rerank_token_freq": q_rerank_token_freq,
        "rerank_weighted_pairs": q_rerank_weighted_pairs,
        "cea_topk": q_cea_topk,
        "cta_winners": q_cta_winners,
        "cpa_winners": q_cpa_winners,
        "minhash_dedup": q_minhash_dedup,
        "minhash_exactset_dedup": q_minhash_exactset_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_neardup_planted": q_embedding_neardup_planted,
        "embedding_topk": q_embedding_topk,
        "embedding_lsh_topk": q_embedding_lsh_topk,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "embedding_neardup": q_embedding_neardup,
        "fingerprints": q_fingerprints,
        "media_decode": q_media_decode,
        "infer_column_kinds": q_infer_column_kinds,
    }


_CLEAN_SQL = (
    "coalesce(nullif(trim(regexp_replace(regexp_replace(regexp_replace("
    "lower(text), '\\[\\d+\\w*\\]', '', 'g'), '_', ' ', 'g'), '\\s+', ' ', 'g')), ''),"
    " lower(text))"
)


def oracle_sql() -> dict[str, str]:
    return {
        # closed-form gold of the flagship at the sf0.01 corpus spec
        # (100 entities x 4 dups + 100 distractors, seed 42): the pipeline
        # reproduces it exactly (pairwise F1 == 1.0, measured r3). The
        # constants encode the sf0.01 spec the driver compares at.
        "er_clusters": """
            SELECT printf('d%010d', i) AS doc_id,
                   printf('d%010d', CASE WHEN i < 400 THEN (i // 4) * 4
                                         ELSE i END) AS component_id
            FROM (SELECT range AS i FROM range(500))
        """,
        "er_cluster_sizes": """
            WITH g AS (
              SELECT CASE WHEN i < 400 THEN (i // 4) * 4 ELSE i END AS comp
              FROM (SELECT range AS i FROM range(500))),
            s AS (SELECT comp, count(*) AS cluster_size FROM g GROUP BY comp)
            SELECT cluster_size, count(*) AS n_clusters
            FROM s GROUP BY cluster_size
        """,
        "minhash_dedup": _MD5_PLANTED_SQL,
        "simhash_dedup": _MD5_PLANTED_SQL,
        "embedding_neardup": """
            SELECT vec_id AS doc_id, vec_id AS component_id FROM embeddings
        """,
        "embedding_lsh_topk": _ANN_HITS_SQL,
        "embedding_ivf_topk": _ANN_HITS_SQL,
        "er_exact_components": f"""
            WITH c AS (SELECT doc_id, {_CLEAN_SQL} AS ctext FROM documents)
            SELECT doc_id, min(doc_id) OVER (PARTITION BY ctext) AS component_id
            FROM c
        """,
        "er_planted_clusters": """
            WITH c AS (
              SELECT 'd' || doc_id AS doc_id, 'd' || doc_id AS component_id
              FROM documents
              UNION ALL
              SELECT 'd' || doc_id || 'a', 'd' || doc_id FROM documents
              UNION ALL
              SELECT 'd' || doc_id || 'b', 'd' || doc_id FROM documents)
            SELECT doc_id, component_id FROM c
        """,
        "block_keys_token_sort": f"""
            WITH c AS (SELECT doc_id, {_CLEAN_SQL} AS ctext FROM documents),
            t AS (SELECT doc_id,
                         list_sort(list_distinct(string_split(ctext, ' '))) AS toks
                  FROM c)
            SELECT doc_id,
                   array_to_string(toks, ' ') AS block_key,
                   array_to_string(toks[1:2], ' ') AS block_key_prefix2
            FROM t
        """,
        "clean_str": f"SELECT doc_id, {_CLEAN_SQL} AS ctext FROM documents",
        "scan_project_filter": """
            SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30
        """,
        "join_agg_revenue": """
            SELECT n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders,
                   count(DISTINCT c_custkey) AS n_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "agg_type_freq": """
            SELECT event_type,
                   round(count(DISTINCT user_id)::double
                         / (SELECT count(DISTINCT user_id) FROM events), 6) AS freq
            FROM events GROUP BY event_type
        """,
        "agg_cpa_freq": """
            WITH pu AS (SELECT event_type, user_id, max(value) AS mx
                        FROM events GROUP BY event_type, user_id)
            SELECT event_type,
                   round(sum(mx) / (SELECT count(DISTINCT user_id) FROM events), 6)
                     AS cpa_freq
            FROM pu GROUP BY event_type
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                  FROM orders)
            WHERE rk <= 3
        """,
        "argmax_per_group": """
            SELECT c_nationkey, top_custkey, acctbal FROM (
              SELECT c_nationkey, c_custkey AS top_custkey,
                     round(c_acctbal, 2) AS acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
              FROM customer)
            WHERE rk = 1
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS rep_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "token_stats": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars_computed,
                   round(length(regexp_replace(text, '\\s+', '', 'g'))::double
                         / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
                     AS avg_token_len
            FROM documents
        """,
        "number_sim_lag": """
            SELECT event_id, user_id, round(num_sim, 6) AS num_sim FROM (
              SELECT event_id, user_id,
                     1 - abs(value - lag(value) OVER w)
                         / greatest(abs(value), abs(lag(value) OVER w), 1.0) AS num_sim
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
            WHERE num_sim IS NOT NULL
        """,
        "date_sim": """
            SELECT event_id,
                   round(((1 - abs(year(ts) - 2000.0) / greatest(year(ts), 2000.0, 1.0))
                        + (1 - abs(month(ts) - 6.0) / greatest(month(ts), 6.0, 1.0))
                        + (1 - abs(day(ts) - 15.0) / greatest(day(ts), 15.0, 1.0))) / 3,
                     6) AS date_sim
            FROM events
        """,
        "edit_distance": """
            SELECT a.doc_id AS id_a,
                   levenshtein(a.text, b.text) AS lev,
                   round(levenshtein(a.text, b.text)::double
                         / greatest(length(a.text), length(b.text), 1), 6) AS lev_norm
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        """,
        "token_jaccard_pairs": """
            WITH t AS (SELECT doc_id, source,
                              list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
                       FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.toks, b.toks))::double
                         / greatest(len(a.toks), len(b.toks), 1), 6) AS tok_jaccard
            FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
             AND b.doc_id <= a.doc_id + 1000
            WHERE len(list_intersect(a.toks, b.toks))::double
                  / greatest(len(a.toks), len(b.toks), 1) >= 0.8
        """,
        "rerank_token_freq": _RERANK_FREQ_SQL,
        "rerank_weighted_pairs": _RERANK_RW_SQL,
        "cea_topk": _CEA_SQL,
        "cta_winners": """
            WITH k AS (
              SELECT source AS component_id, doc_id,
                     unnest(list_distinct(string_split_regex(trim(text), '\\s+')))
                       AS key
              FROM documents),
            cnt AS (SELECT component_id, key, count(*) AS doc_count
                    FROM k GROUP BY component_id, key),
            mx AS (SELECT component_id, max(doc_count) AS m
                   FROM cnt GROUP BY component_id)
            SELECT c.component_id, c.key AS type_key, c.doc_count
            FROM cnt c JOIN mx USING (component_id) WHERE c.doc_count = mx.m
        """,
        "cpa_winners": """
            WITH t AS (SELECT doc_id, source, lang, n_chars,
                              list_distinct(string_split_regex(trim(text), '\\s+'))
                                AS toks
                       FROM documents),
            e AS (SELECT a.source AS component_id,
                         len(list_intersect(a.toks, b.toks))::DOUBLE AS token_overlap,
                         (a.n_chars = b.n_chars)::INT::DOUBLE AS char_match,
                         (a.lang = b.lang)::INT::DOUBLE AS lang_match
                  FROM t a JOIN t b ON b.doc_id > a.doc_id
                   AND b.doc_id <= a.doc_id + 50
                   AND a.source = b.source),
            m AS (SELECT component_id, 'token_overlap' AS pred_key,
                         token_overlap AS value FROM e
                  UNION ALL SELECT component_id, 'char_match', char_match FROM e
                  UNION ALL SELECT component_id, 'lang_match', lang_match FROM e),
            s AS (SELECT component_id, pred_key, round(sum(value), 6) AS value_sum
                  FROM m WHERE value > 0 GROUP BY component_id, pred_key),
            mx AS (SELECT component_id, max(value_sum) AS mv
                   FROM s GROUP BY component_id)
            SELECT s.component_id, s.pred_key, s.value_sum
            FROM s JOIN mx USING (component_id) WHERE s.value_sum = mx.mv
        """,
        "quality_counts": _QUALITY_SQL,
        "quality_score": _QUALITY_SCORE_SQL,
        "infer_column_kinds": """
            WITH sample AS (
              SELECT CAST(doc_id AS VARCHAR) AS u_id,
                     text AS u_text,
                     lang AS u_lang,
                     strftime(DATE '2024-01-01' + CAST(doc_id % 300 AS INTEGER),
                              '%Y-%m-%d') AS u_date,
                     '' AS u_empty
              FROM documents ORDER BY u_id LIMIT 32
            ), cells AS (
              UNPIVOT sample ON u_id, u_text, u_lang, u_date, u_empty
              INTO NAME col_name VALUE cell
            ), agg AS (
              SELECT col_name,
                SUM(CASE WHEN cell IS NOT NULL AND length(trim(cell)) > 0
                         THEN 1 ELSE 0 END) AS non_empty,
                SUM(CASE WHEN cell IS NOT NULL AND length(trim(cell)) > 0
                          AND regexp_matches(trim(cell), '^-?[0-9]+([.][0-9]+)?$')
                         THEN 1 ELSE 0 END) AS num_cnt,
                SUM(CASE WHEN cell IS NOT NULL AND length(trim(cell)) > 0
                          AND (regexp_matches(trim(cell), '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
                            OR regexp_matches(trim(cell), '^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$')
                            OR regexp_matches(trim(cell), '^[0-9]{4}/[0-9]{1,2}/[0-9]{1,2}$'))
                         THEN 1 ELSE 0 END) AS date_cnt,
                SUM(CASE WHEN cell IS NOT NULL AND length(trim(cell)) > 0
                         THEN len(string_split_regex(trim(cell), ' +'))
                         ELSE 0 END) AS tok_sum
              FROM cells GROUP BY col_name)
            SELECT col_name,
                   CASE WHEN non_empty = 0 THEN 'IGNORED'
                        WHEN num_cnt * 5 >= non_empty * 3 THEN 'NUMBER'
                        WHEN date_cnt * 5 >= non_empty * 3 THEN 'DATETIME'
                        WHEN tok_sum > non_empty * 8 THEN 'STRING'
                        ELSE 'NE' END AS kind,
                   non_empty::BIGINT AS non_empty, num_cnt::BIGINT AS num_cnt,
                   date_cnt::BIGINT AS date_cnt, tok_sum::BIGINT AS tok_sum
            FROM agg
        """,
        "fingerprints": _FINGERPRINT_SQL,
        "media_decode": _MEDIA_SQL,
        "minhash_exactset_dedup": _MINHASH_EXACTSET_SQL,
        "embedding_neardup_planted": """
            WITH c AS (
              SELECT vec_id FROM embeddings
              UNION ALL
              SELECT vec_id + 10000 FROM embeddings WHERE vec_id % 5 = 0)
            SELECT vec_id AS doc_id,
                   CASE WHEN vec_id >= 10000 THEN vec_id - 10000
                        ELSE vec_id END AS component_id
            FROM c
        """,
        "lang_id": _LANG_SQL,
        "row_filter_whitelist": """
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id IN (1, 3, 5, 8, 13, 21, 34, 55, 89, 144)
        """,
        "set_ops": """
            (SELECT DISTINCT user_id FROM events
             WHERE event_type = 'click' AND value > 100
             EXCEPT
             SELECT DISTINCT user_id FROM events
             WHERE event_type = 'purchase' AND value > 300)
            INTERSECT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'view' AND value > 50
        """,
        "arrays_overlap_semijoin": """
            SELECT doc_id, n_shared FROM (
              SELECT doc_id,
                     len(list_intersect(
                         list_distinct(string_split_regex(trim(text), '\\s+')),
                         ['spark','join','shuffle','partition','query'])) AS n_shared
              FROM documents)
            WHERE n_shared >= 2
        """,
        "sorted_freq_lists": """
            SELECT event_type, rk, cnt FROM (
              SELECT event_type, cnt,
                     row_number() OVER (PARTITION BY event_type
                         ORDER BY cnt DESC, user_id ASC) AS rk
              FROM (SELECT event_type, user_id, count(*) AS cnt
                    FROM events GROUP BY event_type, user_id))
            WHERE rk <= 5
        """,
        "sample_scan": """
            SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 32
        """,
        "embedding_topk": """
            SELECT query_id, neighbor_id, round(cos_sim, 4) AS cos_sim, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos_sim,
                     row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                                  c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id < 10
               AND c.vec_id != q.vec_id)
            WHERE rank <= 5
        """,
    }


# md5-planted dedup-demo corpus (see _md5_planted_docs): components are
# {i, i+10000} for i % 5 == 0, singletons otherwise
_MD5_PLANTED_SQL = """
    WITH c AS (
      SELECT doc_id FROM documents
      UNION ALL
      SELECT doc_id + 10000 FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id,
           CASE WHEN doc_id >= 10000 THEN doc_id - 10000
                ELSE doc_id END AS component_id
    FROM c
"""

# planted-ANN recall (see _planted_vectors): every query's exact top-5 is
# its five planted near-copies and the ANN must recover all of them
_ANN_HITS_SQL = """
    SELECT vec_id AS query_id, 5::BIGINT AS hits_at_5
    FROM embeddings WHERE vec_id < 10
"""

_STOPWORDS_SQL = "['the','and','of','to','in','is','that','for','with','as','a','an','it','on','at','by','be','are']"

# shared CTEs for the M3 rerank oracles: candidates = banded same-source
# pairs scored by token jaccard; topn = each endpoint's top-3 by score
# (desc, cand asc tie-break); freq = per-doc-deduped key counts >= 2
_RERANK_BASE_SQL = """
    WITH t AS (SELECT doc_id, source,
                      list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
               FROM documents),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.toks, b.toks))::double
               / greatest(len(a.toks), len(b.toks), 1) AS score
      FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
       AND b.doc_id <= a.doc_id + 1000
      WHERE len(list_intersect(a.toks, b.toks))::double
            / greatest(len(a.toks), len(b.toks), 1) >= 0.1),
    sides AS (
      SELECT doc_a AS ep, doc_b AS cand, score FROM cand
      UNION ALL
      SELECT doc_b AS ep, doc_a AS cand, score FROM cand),
    topn AS (
      SELECT ep, cand FROM (
        SELECT ep, cand,
               row_number() OVER (PARTITION BY ep
                   ORDER BY score DESC, cand ASC) AS rk
        FROM sides) WHERE rk <= 3),
    toks AS (SELECT doc_id, unnest(toks) AS key FROM t),
    perdoc AS (SELECT DISTINCT topn.ep, k.key
               FROM topn JOIN toks k ON k.doc_id = topn.cand),
    freq AS (SELECT key, count(*) AS doc_count FROM perdoc
             GROUP BY key HAVING count(*) >= 2)
"""

_RERANK_FREQ_SQL = _RERANK_BASE_SQL + "SELECT key, doc_count FROM freq"

_CEA_SQL = _RERANK_BASE_SQL + """
    SELECT ep AS doc_id, rk AS rank, cand AS cand_id,
           floor(score * 1000000.0)::BIGINT AS score_micro
    FROM (SELECT ep, cand, score,
                 row_number() OVER (PARTITION BY ep
                     ORDER BY score DESC, cand ASC) AS rk
          FROM sides)
    WHERE rk <= 5
"""

_RERANK_RW_SQL = _RERANK_BASE_SQL + """
    , n AS (SELECT count(*) AS n_docs FROM documents),
    pairkeys AS (
      SELECT p.doc_a, p.doc_b, k.key,
             max(CASE WHEN k.doc_id = p.doc_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN k.doc_id = p.doc_b THEN 1 ELSE 0 END) AS in_b
      FROM cand p JOIN toks k ON k.doc_id IN (p.doc_a, p.doc_b)
      GROUP BY p.doc_a, p.doc_b, k.key),
    w AS (
      SELECT doc_a, doc_b,
             sum(CASE WHEN in_a = 1 AND in_b = 1
                      THEN n_docs - coalesce(doc_count, 0) ELSE 0 END) AS shared,
             sum(n_docs - coalesce(doc_count, 0)) AS un
      FROM pairkeys LEFT JOIN freq USING (key) CROSS JOIN n
      GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           CASE WHEN un <= 0 THEN 500000
                ELSE floor((shared::DOUBLE / un::DOUBLE) * 1000000.0) END::BIGINT
             AS rw_micro
    FROM w
"""

_QUALITY_SQL = f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents)
    SELECT doc_id,
           length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS punct_chars,
           len(list_intersect(list_transform(toks, x -> lower(x)),
                              {_STOPWORDS_SQL})) AS stopword_hits,
           len(list_distinct(toks)) AS distinct_tokens,
           len(toks) AS n_tokens,
           length(text) AS n_chars_computed
    FROM t
"""

# identical constant literals + operation order as text_analysis.quality_score
# -> identical IEEE doubles -> floor() is engine-independent
_QUALITY_SCORE_SQL = f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    r AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio,
             len(list_intersect(list_transform(toks, x -> lower(x)),
                                {_STOPWORDS_SQL}))::DOUBLE
               / greatest(len(toks), 1) AS stop_ratio,
             len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)
               AS distinct_ratio,
             least(length(text) / 200.0, 1.0) AS len_score
      FROM t)
    SELECT doc_id,
           floor(punct_ratio * 10000.0)::BIGINT AS punct_ratio_bp,
           floor(stop_ratio * 10000.0)::BIGINT AS stopword_ratio_bp,
           floor(distinct_ratio * 10000.0)::BIGINT AS distinct_token_ratio_bp,
           floor((0.3::DOUBLE * len_score + 0.3::DOUBLE * distinct_ratio
                  + 0.2::DOUBLE * (1 - least(punct_ratio * 4, 1.0))
                  + 0.2::DOUBLE * least(stop_ratio * 5, 1.0)) * 10000.0)::BIGINT
             AS quality_bp
    FROM r
"""

# true winnowing: k=8 char grams (md5 hex), window=8 gram hashes,
# per-window minima deduped + sorted — byte-for-byte the Python kernel
_FINGERPRINT_SQL = """
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(coalesce(text, '')) < 8
                  THEN [md5(coalesce(text, ''))]
                  ELSE list_transform(generate_series(1, length(text) - 7),
                                      i -> md5(substr(text, i, 8)))
             END AS hs
      FROM documents)
    SELECT doc_id,
           unnest(CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
                       ELSE list_sort(list_distinct(
                              list_transform(generate_series(1, len(hs) - 7),
                                             j -> list_min(hs[j:j+7]))))
                  END) AS fp_hash
    FROM g
"""

# fake decode oracle: payload = first 256 chars of media_ref x 8; digest =
# md5_number_lower (low 64 bits of md5, little-endian) exactly as the
# Python stub computes it
_MEDIA_SQL = """
    WITH m AS (
      SELECT 'media://' || source || '/' || doc_id || '.bin' AS media_ref
      FROM documents WHERE doc_id % 3 = 0),
    p AS (
      SELECT media_ref,
             substr(repeat(media_ref, 8), 1, 256) AS payload
      FROM m),
    h AS (
      SELECT media_ref,
             octet_length(encode(payload)) AS n_bytes,
             md5_number_lower(payload) AS d
      FROM p)
    SELECT media_ref,
           n_bytes,
           (d % 2147483648)::BIGINT AS checksum,
           CASE WHEN d % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
           (16 + (d >> 8) % 4096)::INT AS width,
           (16 + (d >> 20) % 2160)::INT AS height,
           CASE WHEN d % 2 = 0 THEN 0
                ELSE (1000 + d % 600000) END::INT AS duration_ms
    FROM h
"""

# threshold-1.0 MinHash dedup == equal-PER-TOKEN-3-gram-set groups (the
# verify kernel is the reference's get_ngrams: char 3-grams per token,
# union over tokens, tokens shorter than 3 contribute nothing —
# alligator/utils.py:119-140). Empty gram sets never verify (0/1 < 1.0)
# -> those docs stay singletons.
_MINHASH_EXACTSET_SQL = """
    WITH c AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0),
    g AS (
      SELECT doc_id,
             list_sort(list_distinct(flatten(list_transform(
               string_split(text, ' '),
               t -> CASE WHEN length(t) >= 3
                         THEN list_transform(generate_series(1, length(t) - 2),
                                             i -> substr(t, i, 3))
                         ELSE [] END)))) AS grams
      FROM c),
    k AS (
      SELECT doc_id,
             CASE WHEN len(grams) = 0 THEN 'EMPTY:' || doc_id
                  ELSE array_to_string(grams, chr(1)) END AS gs
      FROM g)
    SELECT doc_id, min(doc_id) OVER (PARTITION BY gs) AS component_id FROM k
"""

_LANG_LISTS = {
    "en": "['the','and','of','to','in','is','that','for','with','as']",
    "de": "['der','die','das','und','ist','von','mit','für','auf','ein']",
    "fr": "['le','la','les','et','est','de','pour','avec','dans','une']",
    "es": "['el','la','los','y','es','de','para','con','en','una']",
}

_LANG_SQL = f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS toks
      FROM documents),
    h AS (
      SELECT doc_id,
             len(list_intersect(toks, {_LANG_LISTS["en"]})) AS hits_en,
             len(list_intersect(toks, {_LANG_LISTS["de"]})) AS hits_de,
             len(list_intersect(toks, {_LANG_LISTS["fr"]})) AS hits_fr,
             len(list_intersect(toks, {_LANG_LISTS["es"]})) AS hits_es
      FROM t)
    SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
           CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
                WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
                WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
                WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM h
"""
