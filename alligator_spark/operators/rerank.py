"""Stage 4b — M3 rerank: second scoring pass with corpus-global frequencies.

The reference's signature accuracy mechanism is two-stage ranking
(``alligator/manager/ml.py:18-60``): after the rank stage scores every
candidate, the driver computes *global* type/predicate frequencies over
every doc's top-N candidates (``alligator/feature.py:113-269``: per-doc
dedup via ``seen_types``/``seen_predicates``, normalized by doc count),
fills per-candidate ``cta_t1..t5`` / ``cpa_t1..t5`` features (sorted-desc
frequency lists, ``alligator/ml.py:166-199``) and re-scores. Single-pass
scoring has no corpus context: it cannot tell "these two mentions share
rare, discriminative tokens" from "they share tokens every mention has".

Pairwise mapping (our engine has no external KB; the paired doc IS the
candidate):

* column        -> the corpus (one mention column)
* candidate     -> the other endpoint of a scored edge; each doc's
                   candidate list = its edges sorted by rank-stage score
* type          -> a mention token (and, for typo robustness, a mention
                   3-gram); a candidate "carries" its mention's tokens
* predicate     -> a literal-span kind (number/date/string) with the
                   pair's literal similarity as its value

Global frequency (A2 semantics): ``freq(key) = #docs whose top-N
candidates' mentions contain key / n_docs`` — per-doc dedup exactly as the
reference's ``seen_types``. The rerank decision feature is the
rarity-weighted shared-key overlap

    rw = sum_{k in A∩B} (n_docs - count(k)) / sum_{k in A∪B} (n_docs - count(k))

computed in INTEGER weights (exact, associative — no float-summation
order sensitivity, so a SQL oracle reproduces it bit-for-bit) and only
divided once at the end. Ubiquitous keys (count ~ n_docs) weigh ~0; keys
unique to the pair weigh ~n_docs. ``cta_t1..t5`` (sorted-desc token freqs
of the pair's mention-token union) and ``cpa_t1..t3`` (global kind freq x
pair literal sim, sorted desc) are recorded for reference parity.

Scale notes: the frequency tables are pruned to keys seen in >= min_docs
docs (a pruned key reads back as count 0 = max rarity via the left join).
Pruning bounds them by DOC frequency, not vocabulary size, so the token
table still grows with corpus vocabulary — the freq join therefore
carries no broadcast hint (AQE broadcasts while small, shuffles once it
is not). The per-pair explode is O(pairs x keys-per-mention), the same
order as the rank battery.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alligator_spark.operators.scoring import MATCH_MIN_SCORE

RERANK_TOP_N = 3  # reference top_n_cta_cpa_freq (alligator/feature.py:229)

# deterministic second-stage scorer (replaces reranker.h5, same contract
# as the rank stage's scorer — SURVEY §2.9 M2/M3):
# score2 = sigmoid(SLOPE * (W_RANK*score1 + W_GLOBAL*max(rw_tok, rw_g3) - CENTER))
#
# Weight rationale: a corpus-ubiquitous-context false pair reaches
# score1 ~ 1.0 with rw ~ 0 -> x = W_RANK - CENTER must sit clearly below
# the 0.75 borderline band; a heavily-noised true pair keeps score1 ~ 0.95
# with rw >= ~1/3 (one shared rare token of three) -> x must clear the
# 0.92 strong band. 0.7/0.3 with center 0.675 gives 0.66 vs 0.93 on those
# two anchors (slope 25 stretches the gap onto the M4 thresholds).
RERANK_W_RANK = 0.7
RERANK_W_GLOBAL = 0.3
RERANK_CENTER = 0.675
RERANK_SLOPE = 25.0


@dataclass(frozen=True)
class RerankConfig:
    enabled: bool = True
    top_n: int = RERANK_TOP_N
    # prune global-frequency tables to keys seen in >= min_docs docs so
    # they broadcast at any corpus size; pruned == "rare" (count 0)
    min_docs: int = 2
    w_rank: float = RERANK_W_RANK
    w_global: float = RERANK_W_GLOBAL
    center: float = RERANK_CENTER
    slope: float = RERANK_SLOPE
    # pairs below this rank score can NEVER be accepted after rerank even
    # at rw == 1.0 (w_rank*s1 + w_global >= center + ln(0.75/0.25)/slope
    # requires s1 >= 0.598 with the default constants), so the expensive
    # per-pair key explode skips them; they get the neutral-rw score and
    # zeroed global features. Most candidate pairs are low-scoring, so
    # this bounds the rerank's heavy stage to the plausible-match subset.
    # The bound is DERIVED (rw_floor_bound) and asserted at construction:
    # a floor above it would silently drop acceptable pairs if the scorer
    # constants ever drift.
    rw_floor: float = 0.55

    def rw_floor_bound(self) -> float:
        """Largest safe prefilter floor: the lowest rank-stage score s1
        that can still reach the borderline acceptance threshold at the
        maximal global overlap rw == 1.0. From
        sigmoid(slope*(w_rank*s1 + w_global*1 - center)) >= MATCH_MIN_SCORE:
        s1 >= (center + logit(MIN)/slope - w_global) / w_rank."""
        logit = math.log(MATCH_MIN_SCORE / (1.0 - MATCH_MIN_SCORE))
        return (self.center + logit / self.slope - self.w_global) / self.w_rank

    def __post_init__(self):
        bound = self.rw_floor_bound()
        if self.rw_floor > bound + 1e-12:
            raise ValueError(
                f"rw_floor={self.rw_floor} exceeds the safe bound "
                f"{bound:.6f} derived from slope/center/weights — the "
                "prefilter would drop pairs the match decision could accept"
            )


def candidate_topn(scored: DataFrame, n: int = RERANK_TOP_N) -> DataFrame:
    """Each endpoint's top-n candidates by rank-stage score (T3 slice the
    frequency pass reads, ``alligator/feature.py:229``).

    Returns (ep, cand, score, rk)."""
    sides = scored.select(
        F.col("doc_a").alias("ep"), F.col("doc_b").alias("cand"), "score"
    ).unionByName(
        scored.select(
            F.col("doc_b").alias("ep"), F.col("doc_a").alias("cand"), "score"
        )
    )
    w = Window.partitionBy("ep").orderBy(F.desc("score"), F.asc("cand"))
    return sides.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= n)


def mention_token_keys(normalized: DataFrame) -> DataFrame:
    """(doc_id, key): one row per distinct mention token."""
    return normalized.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("norm_mention", " "))).alias("key"),
    ).filter(F.length("key") > 0)


def mention_gram_keys(normalized: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, key): one row per distinct mention char n-gram — pure JVM
    (sequence + substr inside a higher-order transform), no Python."""
    m = F.col("norm_mention")
    grams = F.when(F.length(m) < n, F.array(m)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(m) - (n - 1)),
            lambda i: m.substr(i, F.lit(n)),
        )
    )
    return normalized.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("key")
    ).filter(F.length("key") > 0)


def global_key_freq(
    topn: DataFrame, doc_keys: DataFrame, min_docs: int = 2
) -> DataFrame:
    """A2 global frequency counts: (key, doc_count) where doc_count =
    number of endpoint docs whose top-N candidates carry the key, deduped
    per doc (the reference's ``seen_types``, alligator/feature.py:226-233).
    Consumers divide by n_docs; pruning keeps the table broadcastable."""
    per_doc = (
        topn.join(doc_keys, topn.cand == doc_keys.doc_id)
        .select("ep", "key")
        .distinct()
    )
    return (
        per_doc.groupBy("key")
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= min_docs)
    )


def _keys_per_doc(doc_keys: DataFrame, freq: DataFrame) -> DataFrame:
    """(doc_id, kw): each doc's distinct keys with their global doc_count
    attached as a key-sorted array<struct<key, cnt>>.

    Attaching the frequency at DOC granularity (corpus x keys-per-doc
    rows, once) instead of at exploded-pair granularity (pairs x
    union-keys rows, per weighted_overlap call) removes the two largest
    shuffles of the rerank stage: the old shape shuffled the exploded
    pair-key table on `key` to meet the freq table and then shuffled it
    back to regroup per pair — both at pairs x ~30 rows."""
    kw = doc_keys.join(freq, "key", "left").select(
        "doc_id",
        F.struct(
            F.col("key"),
            F.coalesce("doc_count", F.lit(0)).cast("long").alias("cnt"),
        ).alias("kc"),
    )
    return kw.groupBy("doc_id").agg(F.array_sort(F.collect_list("kc")).alias("kw"))


def weighted_overlap(
    pairs: DataFrame,
    doc_keys: DataFrame,
    freq: DataFrame,
    n_docs_df: DataFrame,
    out_col: str,
    cta_col: str | None = None,
) -> DataFrame:
    """Rarity-weighted key overlap per pair (+ optional cta frequency list).

    pairs(doc_a, doc_b) -> (doc_a, doc_b, <out_col> double[, <cta_col>
    array<double> sorted desc]). Integer rarity weights (n_docs -
    doc_count; missing key -> n_docs) summed exactly, one final double
    division; when every union key is ubiquitous (union weight 0) the
    overlap is neutral 0.5 — the rank-stage score must decide alone.

    Plan shape: the global counts ride inside each doc's key array
    (``_keys_per_doc``), so after the two pair-side joins the whole
    computation is JVM array algebra (array_intersect/array_union over
    (key, cnt) structs + an integer F.aggregate) — no explode, no
    key-join shuffle, no regroup-by-pair shuffle. Struct equality makes
    array_intersect/union key-set operations because a key's cnt is a
    function of the key."""
    # shuffle-hash, never broadcast: the per-doc key-set table is the
    # CORPUS (a broadcast build is serial driver time growing with it).
    # persist: both pair-side joins read this subtree, which now contains
    # the freq aggregation — without caching it executes twice per call.
    sides = _keys_per_doc(doc_keys, freq).persist()
    sides.count()  # eager: two concurrent join-side stages would other-
    # wise each recompute the keys+freq subtree before the cache exists
    sides = sides.hint("shuffle_hash")
    enriched = (
        pairs.select("doc_a", "doc_b")
        .join(sides.select(F.col("doc_id").alias("doc_a"), F.col("kw").alias("ka")), "doc_a")
        .join(sides.select(F.col("doc_id").alias("doc_b"), F.col("kw").alias("kb")), "doc_b")
        .crossJoin(F.broadcast(n_docs_df))
    )
    nd = F.col("n_docs")

    def rar_sum(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, x: acc + (nd - x["cnt"]),
        )

    shared = rar_sum(F.array_intersect("ka", "kb"))
    union_arr = F.array_union("ka", "kb")
    cols = [
        "doc_a",
        "doc_b",
        shared.alias("_shared"),
        rar_sum(union_arr).alias("_union"),
    ]
    if cta_col is not None:
        cols.append(
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            union_arr, lambda x: x["cnt"].cast("double") / nd
                        )
                    )
                ),
                1,
                5,
            ).alias(cta_col)
        )
    out = enriched.select(*cols)
    out = out.withColumn(
        out_col,
        F.when(F.col("_union") <= 0, F.lit(0.5)).otherwise(
            F.col("_shared").cast("double") / F.col("_union").cast("double")
        ),
    ).drop("_shared", "_union")
    return out


def _fused_rw(
    pairs: DataFrame,
    tok_keys: DataFrame,
    g3_keys: DataFrame,
    topn: DataFrame,
    n_docs_df: DataFrame,
    min_docs: int,
) -> DataFrame:
    """rw_tok + rw_g3 + cta_list in ONE keys/freq/pair-join pipeline.

    The token and 3-gram pipelines are disjoint namespaces, so tagging
    keys with a ``t:`` / ``g:`` prefix and running ONE frequency count,
    ONE per-doc key-array build and ONE pair-side join pass yields the
    exact same integer rarity sums as the two separate
    ``weighted_overlap`` calls it replaces (set ops on the fused array
    restricted to a namespace == set ops on that namespace's array; the
    rarity aggregate is order-independent integer addition). Halves the
    rerank stage's joins/shuffles; ``weighted_overlap`` remains for
    direct single-family callers."""
    fused = tok_keys.select(
        "doc_id", F.concat(F.lit("t:"), F.col("key")).alias("key")
    ).unionAll(
        g3_keys.select("doc_id", F.concat(F.lit("g:"), F.col("key")).alias("key"))
    )
    freq = global_key_freq(topn, fused, min_docs)
    sides = _keys_per_doc(fused, freq).persist()
    sides.count()  # eager single-flight cache build (see weighted_overlap)
    sides = sides.hint("shuffle_hash")
    enriched = (
        pairs.select("doc_a", "doc_b")
        .join(sides.select(F.col("doc_id").alias("doc_a"), F.col("kw").alias("ka")), "doc_a")
        .join(sides.select(F.col("doc_id").alias("doc_b"), F.col("kw").alias("kb")), "doc_b")
        .crossJoin(F.broadcast(n_docs_df))
    )
    nd = F.col("n_docs")

    def is_kind(x, prefix: str):
        return x["key"].startswith(prefix)

    def rar_sum(arr, prefix: str):
        return F.aggregate(
            F.filter(arr, lambda x: is_kind(x, prefix)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (nd - x["cnt"]),
        )

    inter = F.array_intersect("ka", "kb")
    uni = F.array_union("ka", "kb")
    out = enriched.select(
        "doc_a",
        "doc_b",
        rar_sum(inter, "t:").alias("_sh_t"),
        rar_sum(uni, "t:").alias("_un_t"),
        rar_sum(inter, "g:").alias("_sh_g"),
        rar_sum(uni, "g:").alias("_un_g"),
        F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        F.filter(uni, lambda x: is_kind(x, "t:")),
                        lambda x: x["cnt"].cast("double") / nd,
                    )
                )
            ),
            1,
            5,
        ).alias("cta_list"),
    )

    def ratio(sh: str, un: str):
        return F.when(F.col(un) <= 0, F.lit(0.5)).otherwise(
            F.col(sh).cast("double") / F.col(un).cast("double")
        )

    return out.select(
        "doc_a",
        "doc_b",
        ratio("_sh_t", "_un_t").alias("rw_tok"),
        ratio("_sh_g", "_un_g").alias("rw_g3"),
        "cta_list",
    )


def global_pred_freq(topn: DataFrame, scored: DataFrame) -> DataFrame:
    """A3 predicate frequencies over literal-span kinds: per endpoint doc,
    the FIRST (best-ranked) top-N candidate carrying a kind contributes its
    value once (``seen_predicates`` dedup, alligator/feature.py:236-246);
    freq(kind) = sum over docs / n_docs is left to the consumer as
    (kind, value_sum)."""
    kinds = ["lit_num_sim", "lit_date_sim", "lit_str_sim"]
    lit = scored.select(
        "doc_a",
        "doc_b",
        *[F.col("features")[k].alias(k) for k in kinds],
    )
    edges = topn.join(
        lit,
        (
            (F.least("ep", "cand") == lit.doc_a)
            & (F.greatest("ep", "cand") == lit.doc_b)
        ),
    ).select("ep", "rk", *kinds)
    melted = edges.select(
        "ep",
        "rk",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in kinds]),
                F.array(*[F.col(k) for k in kinds]),
            )
        ).alias("kind", "value"),
    ).filter(F.col("value") > 0)
    w = Window.partitionBy("ep", "kind").orderBy("rk")
    first_seen = melted.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return first_seen.groupBy("kind").agg(F.sum("value").alias("value_sum"))


def rerank_edges(
    scored: DataFrame, normalized: DataFrame, cfg: RerankConfig | None = None
) -> DataFrame:
    """M3: rank-stage edges -> reranked edges.

    Output = scored's columns with ``rank_score`` (the stage-1 score),
    ``score`` (the rerank score the match decision reads) and the global
    features merged into the ``features`` map (cta_t1..t5, cpa_t1..t3,
    rw_tok, rw_g3 — reference alligator/ml.py:166-199)."""
    cfg = cfg or RerankConfig()
    n_docs_df = normalized.agg(F.count("*").cast("long").alias("n_docs"))
    # topn feeds three frequency aggregations — persist the one shuffle
    topn = candidate_topn(scored, cfg.top_n).persist()
    topn.count()  # eager: three frequency aggregations fan out from it

    tok_keys = mention_token_keys(normalized)
    g3_keys = mention_gram_keys(normalized)

    # heavy per-pair stage only for pairs that can possibly be accepted;
    # tok + g3 run as ONE fused namespaced pipeline (see _fused_rw)
    pairs = scored.filter(F.col("score") >= cfg.rw_floor).select("doc_a", "doc_b")
    rw_both = _fused_rw(pairs, tok_keys, g3_keys, topn, n_docs_df, cfg.min_docs)

    # pred freqs as a broadcast 1-row map (<= 3 kinds) — no driver collect
    pred_map_df = global_pred_freq(topn, scored).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("kind"), F.col("value_sum")))
        ).alias("pred_map")
    )

    out = (
        scored.join(rw_both, ["doc_a", "doc_b"], "left")
        .crossJoin(F.broadcast(n_docs_df))
        .crossJoin(F.broadcast(pred_map_df))
    )
    # cpa_t1..t3: global kind freq (value_sum / n_docs) x this pair's kind
    # similarity, sorted desc (alligator/ml.py:186-199 shape)
    kinds = ["lit_num_sim", "lit_date_sim", "lit_str_sim"]
    cpa_arr = F.reverse(
        F.array_sort(
            F.array(
                *[
                    F.coalesce(F.col("pred_map")[k], F.lit(0.0))
                    / F.col("n_docs")
                    * F.coalesce(F.col("features")[k], F.lit(0.0))
                    for k in kinds
                ]
            )
        )
    )
    rw_tok_c = F.coalesce("rw_tok", F.lit(0.5))
    rw_g3_c = F.coalesce("rw_g3", F.lit(0.5))
    lin = (
        cfg.w_rank * F.col("score")
        + cfg.w_global * F.greatest(rw_tok_c, rw_g3_c)
        - F.lit(cfg.center)
    )
    score2 = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(cfg.slope) * lin))
    cta_names = [f"cta_t{i}" for i in range(1, 6)]
    cpa_names = [f"cpa_t{i}" for i in range(1, 4)]
    extra = F.map_from_arrays(
        F.array(
            *[F.lit(n) for n in cta_names + cpa_names + ["rw_tok", "rw_g3"]]
        ),
        F.array(
            *[
                # try_element_at: ANSI-safe pad to 5 (alligator/ml.py:176)
                F.coalesce(F.try_element_at("cta_list", F.lit(i)), F.lit(0.0))
                for i in range(1, 6)
            ],
            *[F.element_at(cpa_arr, i) for i in range(1, 4)],
            rw_tok_c,
            rw_g3_c,
        ),
    )
    passthrough = [c for c in ("matches", "predicates") if c in scored.columns]
    return out.select(
        "doc_a",
        "doc_b",
        "block_key",
        F.map_concat("features", extra).alias("features"),
        *passthrough,
        F.col("score").alias("rank_score"),
        score2.alias("score"),
    )
