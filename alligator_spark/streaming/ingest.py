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
  with ``accepted = false`` and ``reconcile_edges`` (below) is the
  periodic batch job that re-applies the full M4 decision over the
  accumulated edge sink.
* The pairwise battery here is the JVM half only (token/3-gram overlap
  hash arrays precomputed on the static side, computed per micro-batch
  on the stream side). The ONLY Python in the micro-batch hot path is
  the MinHash signature UDF (one Arrow-vectorized batch per trigger,
  bounded by the arrival rate, never corpus-sized); pass
  ``minhash=False`` to both ``corpus_index`` and ``streaming_link`` for
  a strictly JVM-only plan (at the cost of fuzzy stream recall).
* Hot/degenerate corpus block keys are pre-pruned when building
  ``corpus_index`` (the static analogue of the batch drop_block_size
  cap): without it one ubiquitous token fans every arriving doc out to
  the full block in the stream-static join.

Exact duplicates on the stream are handled by ``stream_exact_dedup``
via ``dropDuplicatesWithinWatermark``: the dedup state store is evicted
once its event time falls behind the watermark, so state is bounded; a
duplicate arriving later than the watermark delay after the original
may be re-emitted (the documented streaming-dedup trade).

RECALL STALENESS SLA. The stream path trades recall for bounded
per-arrival cost in exactly two places: (a) a pair reachable ONLY
through a block key that ``corpus_index`` dropped as hot (> max_block
corpus docs, including oversize MinHash band buckets) produces NO
candidate row in any micro-batch; (b) a pair reachable only through
the LOOSE fuzzy re-banding (the R4 rescue's wider banding of the same
signatures — ``blocking.fuzzy_rescue_pairs``) is likewise invisible:
the stream computes the STRICT bands (same hashes/bands/seed as the
batch ``block_keys``), so typo pairs that collide on a strict band are
candidates within one micro-batch, but the looser rescue banding needs
the batch pass's "which docs ended up lonely" global view. Both (a)
and (b) are recovered by the periodic batch pass — the full pipeline
(salted hot blocks + loose fuzzy banding) over corpus + arrivals,
whose accepted edges are unioned into the edge sink and re-decided by
``reconcile_edges``. The worst-case staleness of such a match EQUALS
the batch cadence: an operator who needs those matches visible within
T must schedule the batch pass at period <= T. Strong stream matches
(including strict-band fuzzy hits) are visible within one micro-batch
trigger; borderline (gap+ratio) acceptances within one reconcile
period. Size the cadence from these three tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alligator_spark.functions.textnorm import clean_str_col, token_sort_key_col
from alligator_spark.operators.blocking import (
    BlockingConfig,
    band_key_cols,
    minhash_sig_udf,
)
from alligator_spark.operators.normalize import normalize_docs
from alligator_spark.operators.scoring import MATCH_STRONG_SCORE


def _resolve_minhash(minhash) -> BlockingConfig | None:
    """True -> default BlockingConfig; False/None -> banding off."""
    if minhash is True:
        return BlockingConfig()
    return minhash or None


def stream_block_keys(
    stream_docs: DataFrame, minhash: BlockingConfig | bool = True
) -> DataFrame:
    """Streaming normalize + blocking keys: one row per (doc, key).

    clean_str + token-sort + per-token keys are pure column expressions;
    the MinHash band family adds one Arrow pandas-UDF signature pass per
    micro-batch (bounded by the arrival rate) whose STRICT bands — same
    hashes/bands/seed as the batch ``block_keys`` — are derived JVM-side.
    The whole plan stays a stateless projection: Catalyst runs it per
    micro-batch with no state store. The LOOSE fuzzy re-banding stays
    batch-only (it needs the global lonely-doc view; see module SLA).
    ``minhash`` must agree with the config the corpus index was built
    with, or band keys will never collide."""
    cfg = _resolve_minhash(minhash)
    extra = ("event_ts",) if "event_ts" in stream_docs.columns else ()
    normalized = normalize_docs(stream_docs, carry=extra)
    base = normalized.select("doc_id", "norm_mention", *extra)
    carry = list(base.columns)
    full = base.select(
        *carry,
        F.concat(F.lit("ts:"), token_sort_key_col(F.col("norm_mention"))).alias(
            "block_key"
        ),
    )
    tok = (
        base.select(
            *carry,
            F.explode(F.array_distinct(F.split("norm_mention", " "))).alias("tok"),
        )
        # an empty norm_mention explodes to one empty token — a degenerate
        # key every empty arrival would share; drop it
        .filter(F.length("tok") > 0)
        .select(
            *carry,
            F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"),
        )
    )
    out = full.unionByName(tok)
    if cfg is not None:
        sig = minhash_sig_udf(cfg)
        mh = (
            base.filter(F.length("norm_mention") > 0)
            .withColumn("sig", sig(F.col("norm_mention")))
            .select(
                *carry,
                F.explode(
                    F.array(
                        *band_key_cols(
                            "sig", cfg.minhash_hashes, cfg.minhash_bands, "mh"
                        )
                    )
                ).alias("block_key"),
            )
        )
        out = out.unionByName(mh)
    return out


def corpus_index(
    static_docs: DataFrame,
    max_block: int = 1024,
    minhash: BlockingConfig | bool = True,
) -> DataFrame:
    """Static side of the stream-static join: (block_key, cand_id,
    cand_mention). Built once (persist/write it); micro-batches join
    against it by key without rescanning the corpus.

    Keys shared by more than ``max_block`` corpus docs are DROPPED from
    the index (the static analogue of the batch path's drop_block_size
    cap, ``operators/pairs.py``): a hot token like a stopword would
    otherwise fan every arriving doc out to its full block in the
    stream-static join — per-arrival cost must stay bounded. Recall for
    docs only reachable through a dropped hot key falls to the periodic
    batch pass, which handles hot blocks with salting.

    ``minhash`` adds the strict MinHash band keys (same family the batch
    ``block_keys`` uses) so typo'd arrivals with no shared token still
    find their corpus twin in one micro-batch; it must match the config
    passed to ``stream_block_keys``/``streaming_link``. Oversize band
    buckets are subject to the same ``max_block`` cap."""
    cfg = _resolve_minhash(minhash)
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
    ).filter(F.length("tok") > 0).select(
        "cand_id",
        "cand_mention",
        F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"),
    )
    idx = full.unionByName(tok)
    if cfg is not None:
        sig = minhash_sig_udf(cfg)
        mh = (
            base.filter(F.length("cand_mention") > 0)
            .withColumn("sig", sig(F.col("cand_mention")))
            .select(
                "cand_id",
                "cand_mention",
                F.explode(
                    F.array(
                        *band_key_cols(
                            "sig", cfg.minhash_hashes, cfg.minhash_bands, "mh"
                        )
                    )
                ).alias("block_key"),
            )
        )
        idx = idx.unionByName(mh)
    if max_block is not None:
        sizes = idx.groupBy("block_key").agg(F.count("*").alias("_bs"))
        idx = (
            idx.join(sizes.hint("shuffle_hash"), "block_key")
            .filter(F.col("_bs") <= max_block)
            .drop("_bs")
        )
    return idx


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
    watermark: str = "10 minutes",
    minhash: BlockingConfig | bool = True,
) -> DataFrame:
    """Arriving docs -> (doc_id, cand_id, score[, event_ts], accepted)
    edge stream.

    Stream-static equi-join on block_key (token, token-sort and strict
    MinHash band families — ``minhash`` must match the config
    ``corpus_idx`` was built with), then a JVM-only pairwise score
    (token jaccard + 3-gram jaccard of the mentions, equal weight through
    the batch scorer's logistic). ``accepted`` = strong-only (see module
    docstring); every candidate row is emitted either way so
    ``reconcile_edges`` sees the full evidence.

    Duplicate (doc_id, cand_id) rows arise when a doc shares several
    block keys with the same candidate (identical score on every copy).
    When the stream carries an ``event_ts`` column they are dropped with
    watermark-bounded state (``dropDuplicatesWithinWatermark`` — state
    evicted once older than the watermark, never unbounded). Without an
    event-time column NO stateful dedup is attempted — equal-score
    duplicates may pass through and are collapsed by ``reconcile_edges``
    (unbounded dedup state in a continuous stream is the worse trade)."""
    keyed = stream_block_keys(stream_docs, minhash=minhash)
    has_ts = "event_ts" in keyed.columns
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
    cols = ["doc_id", "cand_id"] + (["event_ts"] if has_ts else [])
    edges = cand.select(*cols, F.round(score, 6).alias("score"))
    if has_ts:
        edges = edges.withWatermark(
            "event_ts", watermark
        ).dropDuplicatesWithinWatermark(["doc_id", "cand_id"])
    return edges.withColumn("accepted", F.col("score") >= strong)


def stream_exact_dedup(
    stream_docs: DataFrame,
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each distinct cleaned text
    wins; duplicate arrivals are dropped by state-store lookup.

    Uses ``dropDuplicatesWithinWatermark`` so the state store actually
    expires: a plain ``dropDuplicates(["text_hash"])`` under a watermark
    never evicts keys that lack the event-time column in the dedup
    subset — state grows without bound in a continuous stream. The
    contract is therefore time-bounded: duplicates arriving within the
    watermark delay of the first copy are dropped; a duplicate arriving
    later than that MAY be re-emitted (its state has been evicted)."""
    mention = F.expr(
        "filter(spans, s -> s.kind = 'mention')[0].text"
    )
    keyed = stream_docs.withColumn(
        "text_hash", F.md5(clean_str_col(mention))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def reconcile_edges(edge_sink: DataFrame, cfg=None) -> DataFrame:
    """Periodic batch reconciliation of the streamed edge sink: apply the
    FULL M4 match decision (strong OR borderline top-1 with gap+ratio,
    ``operators/scoring.py:accept_edges``) that the stream's strong-only
    rule could not evaluate incrementally.

    ``edge_sink`` is the accumulated output of ``streaming_link``
    (doc_id, cand_id, score, accepted, ...). Rows are canonicalized to
    unordered (doc_a, doc_b) edges, equal-score duplicates collapsed
    (max score per pair — copies only differ if the corpus index changed
    between micro-batches), then re-decided. Returns
    (doc_a, doc_b, score, accepted) with ``accepted`` recomputed; feed
    ``accepted`` edges to ``connected_components`` to merge clusters."""
    from alligator_spark.operators.scoring import accept_edges

    edges = (
        edge_sink.select(
            F.least("doc_id", "cand_id").alias("doc_a"),
            F.greatest("doc_id", "cand_id").alias("doc_b"),
            "score",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("score").alias("score"))
    )
    return accept_edges(edges, cfg)
