"""Structured-Streaming ingest: link arriving documents against an
onboarded static corpus.

The reference is a batch system (Mongo queue + worker pool); its closest
notion of "arriving data" is onboarding new tables into the same
status-driven pipeline (``alligator/manager/data.py``). The Spark-native
equivalent of that incremental intake is a stream-static plan: documents
arrive on any streaming source (files landing in a directory, Kafka,
rate), are normalized/blocked with the SAME column expressions the batch
pipeline uses, and are matched against the static corpus's block-key and
feature tables with stream-static equi-joins — fully incremental, no
rescan of the corpus per micro-batch.

Streaming-specific semantics (documented deviations from the batch path):

* Acceptance is STRONG-ONLY (score >= strong). The batch borderline rule
  ranks each doc's full candidate list with window functions, which
  Structured Streaming cannot evaluate incrementally; a row-local strong
  threshold needs no global state. Borderline candidates are emitted
  with ``accepted = false`` so a periodic batch reconciliation can apply
  the full M4 decision.
* The pairwise battery here is the JVM half only (token/3-gram overlap
  hash arrays precomputed on the static side, computed per micro-batch
  on the stream side) — no Python workers in the micro-batch hot path.

Exact duplicates on the stream are handled by ``stream_exact_dedup``:
watermark + dropDuplicates on the text hash (Spark's canonical
streaming-dedup pattern; state expires with the event-time watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alligator_spark.functions.textnorm import clean_str_col, token_sort_key_col
from alligator_spark.operators.normalize import normalize_docs
from alligator_spark.operators.scoring import MATCH_STRONG_SCORE


def stream_block_keys(stream_docs: DataFrame) -> DataFrame:
    """Streaming normalize + blocking keys: one row per (doc, key).

    Pure column expressions (clean_str + token-sort + per-token keys), so
    the plan is a stateless projection — Catalyst runs it per micro-batch
    with no state store. MinHash banding is deliberately absent on the
    stream side: its value is fuzzy recall over the FULL corpus, which
    the periodic batch pass owns."""
    normalized = normalize_docs(stream_docs)
    base = normalized.select("doc_id", "norm_mention")
    full = base.select(
        "doc_id",
        "norm_mention",
        F.concat(F.lit("ts:"), token_sort_key_col(F.col("norm_mention"))).alias(
            "block_key"
        ),
    )
    tok = base.select(
        "doc_id",
        "norm_mention",
        F.explode(F.array_distinct(F.split("norm_mention", " "))).alias("tok"),
    ).select(
        "doc_id",
        "norm_mention",
        F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"),
    )
    return full.unionByName(tok)


def corpus_index(static_docs: DataFrame) -> DataFrame:
    """Static side of the stream-static join: (block_key, cand_id,
    cand_mention). Built once (persist/write it); micro-batches join
    against it by key without rescanning the corpus."""
    normalized = normalize_docs(static_docs)
    base = normalized.select(
        F.col("doc_id").alias("cand_id"),
        F.col("norm_mention").alias("cand_mention"),
    )
    full = base.select(
        "cand_id",
        "cand_mention",
        F.concat(F.lit("ts:"), token_sort_key_col(F.col("cand_mention"))).alias(
            "block_key"
        ),
    )
    tok = base.select(
        "cand_id",
        "cand_mention",
        F.explode(F.array_distinct(F.split("cand_mention", " "))).alias("tok"),
    ).select(
        "cand_id",
        "cand_mention",
        F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"),
    )
    return full.unionByName(tok)


def _overlap(a, b):
    return F.size(F.array_intersect(a, b)) / F.greatest(
        F.size(a), F.size(b), F.lit(1)
    )


def _grams3(c):
    m = c
    return F.when(F.length(m) < 3, F.array(m)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(m) - 2),
                lambda i: m.substr(i, F.lit(3)),
            )
        )
    )


def streaming_link(
    stream_docs: DataFrame,
    corpus_idx: DataFrame,
    strong: float = MATCH_STRONG_SCORE,
) -> DataFrame:
    """Arriving docs -> (doc_id, cand_id, score, accepted) edge stream.

    Stream-static equi-join on block_key, then a JVM-only pairwise score
    (token jaccard + 3-gram jaccard of the mentions, equal weight through
    the batch scorer's logistic). ``accepted`` = strong-only (see module
    docstring); every candidate row is emitted either way so downstream
    batch reconciliation sees the full evidence."""
    keyed = stream_block_keys(stream_docs)
    cand = keyed.join(corpus_idx, "block_key").filter(
        F.col("doc_id") != F.col("cand_id")
    )
    ma = F.array_distinct(F.split("norm_mention", " "))
    mb = F.array_distinct(F.split("cand_mention", " "))
    tok_j = _overlap(ma, mb)
    g3_j = _overlap(_grams3(F.col("norm_mention")), _grams3(F.col("cand_mention")))
    # same logistic shape as the batch M2 scorer, over the JVM features
    lin = 0.5 * tok_j + 0.5 * g3_j
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(12.0) * (lin - F.lit(0.55))))
    edges = cand.select(
        "doc_id",
        "cand_id",
        F.round(score, 6).alias("score"),
    ).dropDuplicates(["doc_id", "cand_id"])
    return edges.withColumn("accepted", F.col("score") >= strong)


def stream_exact_dedup(
    stream_docs: DataFrame,
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each distinct cleaned text
    wins; duplicate arrivals are dropped by state-store lookup. The
    watermark bounds state (a duplicate older than the watermark may
    reappear — the documented streaming-dedup contract)."""
    mention = F.expr(
        "filter(spans, s -> s.kind = 'mention')[0].text"
    )
    keyed = stream_docs.withColumn(
        "text_hash", F.md5(clean_str_col(mention))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicates(
        ["text_hash"]
    )
