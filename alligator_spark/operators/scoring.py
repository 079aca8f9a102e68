"""Stage 4 — pairwise scoring: the Alligator feature battery + match rule.

Per candidate pair we compute the pairwise adaptation of the reference's
29-feature vector (``DEFAULT_FEATURES``, ``alligator/feature.py:18-48``):
retrieval-side features become symmetric mention-vs-mention measures, the
LIT-context features (R3, ``alligator/feature.py:361-459``) compare the
two docs' literal spans by datatype, and desc/descNgram compare full row
text (``alligator/feature.py:94-99``). The opaque Keras ranker
(``alligator/models/ranker.h5``) is replaced by a deterministic weighted
scorer over the same features — the contract is gold-pair F1, not weight
equality (SURVEY §2.9 M2).

Edge acceptance follows the reference's match decision
(``backend/app/endpoints/alligator_api.py:58-105``): strong score >= 0.92,
or >= 0.75 with gap >= 0.15 AND ratio >= 1.2 vs the runner-up — applied
per (doc, side) over its candidate list, generalized to the pairwise
setting: strong edges always accepted; borderline edges accepted only for
the top-1 candidate of either endpoint under the gap/ratio rule, where
"runner-up" means the best candidate from a DIFFERENT strong component
(same-cluster candidates corroborate the top-1, they don't compete — the
transitive adaptation of the reference's pick-one-entity rule; see
``accept_edges``).

The whole feature battery runs in ONE Arrow-vectorized pandas UDF; the
acceptance rule is a window function (JVM-side).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alligator_spark.functions import similarity as sim

MATCH_MIN_SCORE = 0.75
MATCH_STRONG_SCORE = 0.92
MATCH_GAP_THRESHOLD = 0.15
MATCH_RATIO_THRESHOLD = 1.2

FEATURE_NAMES = [
    "ntoken_mention",
    "ntoken_entity",
    "length_mention",
    "length_entity",
    "ed_score",
    "jaccard_score",
    "jaccardNgram_score",
    "jw_score",
    "desc",
    "descNgram",
    "lit_num_sim",
    "lit_date_sim",
    "lit_str_sim",
    "lit_num_close",
    "lit_date_close",
    "p_subj_lit_datatype",
    "p_subj_lit_all_datatype",
    "p_subj_lit_row",
]

# Deterministic logistic scorer (SURVEY §2.9 M2: replaces the opaque
# ranker.h5 with fixed, documented weights over the same features).
# score = sigmoid(SLOPE * (sum(w_i * f_i) - CENTER)).
#
# Weight rationale: mention-identity features carry 0.40; string literal
# context 0.25; sharp numeric/date closeness 0.25 (the reference's
# 1-|a-b|/max similarity is near 1.0 for ANY two plausible years/values,
# so the raw sims are faithfully computed but carry no weight — the
# *_close rescalings concentrate their discriminative range); row-text
# token overlap 0.10. The logistic stretch maps the empirical margin
# (true pairs s>=~0.73, false pairs s<=~0.55) onto the reference's match
# thresholds (0.92 strong / 0.75 min).
SCORE_WEIGHTS = {
    "ed_score": 0.10,
    "jaccard_score": 0.08,
    "jaccardNgram_score": 0.12,
    "jw_score": 0.10,
    "lit_str_sim": 0.25,
    "lit_num_close": 0.15,
    "lit_date_close": 0.10,
    "p_subj_lit_row": 0.10,
}
SCORE_CENTER = 0.62
SCORE_SLOPE = 30.0


def _close(x: float, lo: float) -> float:
    """Rescale a similarity's top band [lo, 1] onto [0, 1] (clipped)."""
    return min(max((x - lo) / (1.0 - lo), 0.0), 1.0)


@lru_cache(maxsize=1 << 16)
def _ngram3_cached(a: str, b: str) -> float:
    return sim.ngram_overlap(a, b, 3)


@dataclass(frozen=True)
class ScoringConfig:
    strong: float = MATCH_STRONG_SCORE
    min_score: float = MATCH_MIN_SCORE
    gap: float = MATCH_GAP_THRESHOLD
    ratio: float = MATCH_RATIO_THRESHOLD


# features computed in the (light) pandas UDF; the overlap features are
# JVM-side array_intersect expressions
_PY_FEATURES = [
    "ed_score",
    "jw_score",
    "lit_num_sim",
    "lit_date_sim",
    "lit_str_sim",
    "lit_num_close",
    "lit_date_close",
    "p_subj_lit_datatype",
    "p_subj_lit_all_datatype",
]

# provenance columns (R2 analogue): per literal kind, the best-matching
# (value_a, value_b) pair — the reference records per-pair `matches`
# [{p, o, s}] and `predicates` {pred: score} the same way
# (alligator/feature.py:313-359) so CPA outputs can cite their evidence
_PROV_FIELDS = [
    ("best_num_a", "best_num_b"),
    ("best_date_a", "best_date_b"),
    ("best_str_a", "best_str_b"),
]

_RESULT_TYPE = T.StructType(
    [T.StructField(n, T.DoubleType()) for n in _PY_FEATURES]
    + [
        T.StructField(n, T.StringType())
        for pair in _PROV_FIELDS
        for n in pair
    ]
)


def _argmax_pair(xs, ys, score_fn):
    best, ba, bb = -1.0, None, None
    for x in xs:
        for y in ys:
            v = score_fn(x, y)
            if v > best:
                best, ba, bb = v, x, y
    return best, ba, bb


def _lit_sims(nums_a, nums_b, dates_a, dates_b, strs_a, strs_b):
    """Per-datatype max similarity between the two docs' literal spans —
    the pairwise analogue of p_subj_lit_datatype (max over KB literals of
    a datatype, normalized by LIT column count; alligator/feature.py:361-459).

    Returns (num, date, str, mean-over-present, max-over-present,
    provenance dict of the argmax value pairs per kind).
    """
    num = date = s = 0.0
    parts = []
    prov: dict[str, str | None] = {a: None for pair in _PROV_FIELDS for a in pair}
    if len(nums_a) and len(nums_b):
        num, pa, pb = _argmax_pair(nums_a, nums_b, sim.number_similarity)
        prov["best_num_a"], prov["best_num_b"] = pa, pb
        parts.append(num)
    if len(dates_a) and len(dates_b):
        date, pa, pb = _argmax_pair(dates_a, dates_b, sim.date_similarity)
        prov["best_date_a"], prov["best_date_b"] = pa, pb
        parts.append(date)
    if len(strs_a) and len(strs_b):
        s, pa, pb = _argmax_pair(
            strs_a, strs_b, lambda x, y: _ngram3_cached(str(x), str(y))
        )
        prov["best_str_a"], prov["best_str_b"] = pa, pb
        parts.append(s)
    if not parts:
        return 0.0, 0.0, 0.0, 0.0, 0.0, prov
    return num, date, s, sum(parts) / len(parts), max(parts), prov


def _score_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Python half of the battery: levenshtein, jaro-winkler, literal
    similarities (reference-exact, lru-cached scalar kernels). All
    overlap/count features run JVM-side — see score_pairs.

    Rows flagged ``_skip`` (the JVM prefilter proved their score can
    never matter — see ``prefilter_lin_cap``) keep the zero/None
    defaults and cost no Python compute."""
    n = len(pdf)
    cols = {name: np.zeros(n) for name in _PY_FEATURES}
    prov_cols: dict[str, list] = {
        name: [None] * n for pair in _PROV_FIELDS for name in pair
    }
    ma = pdf["mention_a"].tolist()
    mb = pdf["mention_b"].tolist()
    lna = pdf["lit_numbers_a"].tolist()
    lnb = pdf["lit_numbers_b"].tolist()
    lda = pdf["lit_dates_a"].tolist()
    ldb = pdf["lit_dates_b"].tolist()
    lsa = pdf["lit_strings_a"].tolist()
    lsb = pdf["lit_strings_b"].tolist()
    skip = pdf["_skip"].tolist() if "_skip" in pdf.columns else [False] * n

    for i in range(n):
        if skip[i]:
            continue
        a = ma[i] or ""
        b = mb[i] or ""
        cols["ed_score"][i] = 1.0 - sim.levenshtein_norm(a, b)
        cols["jw_score"][i] = sim.jaro_winkler(a, b)
        lit_num, lit_date, lit_str, lit_mean, lit_max, prov = _lit_sims(
            lna[i], lnb[i], lda[i], ldb[i], lsa[i], lsb[i]
        )
        for name, v in prov.items():
            prov_cols[name][i] = v
        cols["lit_num_sim"][i] = lit_num
        cols["lit_date_sim"][i] = lit_date
        cols["lit_str_sim"][i] = lit_str
        # values within 2% / dates within ~a year count as "close"
        cols["lit_num_close"][i] = _close(lit_num, 0.98)
        cols["lit_date_close"][i] = _close(lit_date, 0.999)
        cols["p_subj_lit_datatype"][i] = lit_mean
        cols["p_subj_lit_all_datatype"][i] = lit_max
    out = pd.DataFrame(cols)
    for name, vals in prov_cols.items():
        out[name] = vals
    return out


# all hash arrays ship as int32: the arrays ride EVERY pair row through
# two wide shuffles, so element width is shuffle bytes. crc32 values fold
# bijectively (wraparound cast — equality preserved exactly); the 63-bit
# packed 3-gram hashes xor-fold to 32 bits (collision odds per pair
# ~|A||B|/2^32 ~ 1e-6, deterministic — oracle-verified after the change).
_SIDE_ARRAYS_TYPE = T.StructType(
    [
        T.StructField("g3_m", T.ArrayType(T.IntegerType())),
        T.StructField("tok_m", T.ArrayType(T.IntegerType())),
        T.StructField("g3_r", T.ArrayType(T.IntegerType())),
        T.StructField("gw_r", T.ArrayType(T.IntegerType())),
        # stopword-filtered row tokens (tokenize_text), crc32-hashed:
        # computed ONCE per doc so the pair battery never re-tokenizes
        # (the old per-pair regexp_extract_all ran 4x per pair row) and
        # the raw row_text never ships through the pair shuffles
        T.StructField("st_r", T.ArrayType(T.IntegerType())),
        # prefilter inputs (r6, see prefilter_lin_cap): union of the
        # string literals' packed 3-gram hashes (63-bit codepoint pack —
        # collision-FREE, so the bound stays sound), the min per-literal
        # gram count (lower-bounds the argmax pair's denominator), and
        # the float()-parsed numeric literals (the battery's own parse,
        # so the JVM closeness check sees identical doubles)
        T.StructField("sl_g3", T.ArrayType(T.LongType())),
        T.StructField("sl_min", T.IntegerType()),
        T.StructField("num_vals", T.ArrayType(T.DoubleType())),
    ]
)


def _fold32(arr: np.ndarray) -> np.ndarray:
    """uint64 hash array -> sorted unique int32 (xor-fold high bits)."""
    a = arr.astype(np.uint64)
    folded = (a ^ (a >> np.uint64(31))).astype(np.uint32).astype(np.int32)
    return np.unique(folded)


def featurize_sides(normalized: DataFrame) -> DataFrame:
    """Precompute per-DOC hash arrays (mention 3-grams/tokens, row-text
    3-grams/whole-token grams) once — O(docs), not O(pairs). The pair
    battery then only does array intersections; recomputing n-gram sets
    per pair was the dominant cost (each doc appears in ~dozens of pairs
    and random repartitioning defeats batch-local caches)."""

    import zlib

    from alligator_spark.functions.textnorm import tokenize_text

    def _stop_tok_hashes(r: str) -> np.ndarray:
        toks = tokenize_text(r)
        if not toks:
            return np.zeros(0, dtype=np.int32)
        return _fold32(
            np.fromiter(
                (zlib.crc32(t.encode()) for t in toks),
                dtype=np.uint64,
                count=len(toks),
            )
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty_i64 = np.zeros(0, dtype=np.int64)
        for pdf in it:
            out = {
                "g3_m": [], "tok_m": [], "g3_r": [], "gw_r": [], "st_r": [],
                "sl_g3": [], "sl_min": [], "num_vals": [],
            }
            for m, r, strs, nums in zip(
                pdf["norm_mention"], pdf["row_text"],
                pdf["lit_strings"], pdf["lit_numbers"],
            ):
                m = m or ""
                r = r or ""
                out["g3_m"].append(_fold32(sim.ngram_hash_array(m, 3)))
                out["tok_m"].append(_fold32(sim.token_hash_array(m)))
                out["g3_r"].append(_fold32(sim.ngram_hash_array(r, 3)))
                out["gw_r"].append(_fold32(sim.ngram_hash_array(r, None)))
                out["st_r"].append(_stop_tok_hashes(r))
                arrs = [
                    sim.ngram_hash_array(str(x), 3)
                    for x in (strs if strs is not None else [])
                ]
                if arrs:
                    out["sl_g3"].append(
                        np.unique(np.concatenate(arrs)).astype(np.int64)
                    )
                    out["sl_min"].append(min(len(a) for a in arrs))
                else:
                    out["sl_g3"].append(empty_i64)
                    out["sl_min"].append(0)
                vals = []
                for x in (nums if nums is not None else []):
                    try:
                        vals.append(float(x))
                    except Exception:
                        vals.append(None)
                out["num_vals"].append(vals)
            res = pdf[["doc_id", "norm_mention",
                       "lit_numbers", "lit_dates", "lit_strings"]].copy()
            for k, v in out.items():
                res[k] = v
            yield res

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("norm_mention", T.StringType()),
            T.StructField("lit_numbers", T.ArrayType(T.StringType())),
            T.StructField("lit_dates", T.ArrayType(T.StringType())),
            T.StructField("lit_strings", T.ArrayType(T.StringType())),
        ]
        + list(_SIDE_ARRAYS_TYPE.fields)
    )
    cols = [
        "doc_id", "norm_mention", "row_text", "lit_numbers", "lit_dates", "lit_strings"
    ]
    return normalized.select(*cols).mapInPandas(run, schema=schema)


_SIDE_COLS = [
    "norm_mention", "lit_numbers", "lit_dates", "lit_strings",
    "g3_m", "tok_m", "g3_r", "gw_r", "st_r",
    "sl_g3", "sl_min", "num_vals",
]


def prefilter_lin_cap() -> float:
    """Largest weighted-sum value whose pair can be PROVEN irrelevant.

    Derivation (all constants are the published scorer/decision
    constants — the same style as RerankConfig.rw_floor_bound):

    1. rival-irrelevance threshold r* = min(min_score - gap,
       min_score / ratio): an edge with score < r* can never be accepted
       (needs >= min_score) and can never BLOCK a borderline acceptance
       (for any accepted s >= min_score, gap and ratio both clear
       against any rival < r*), so lowering its score further cannot
       change any accept decision.
    2. the accept stage reads the RERANK score when rerank is enabled:
       rank score s1 keeps the rerank score below r* even at the maximal
       global boost rw == 1 iff
       s1 < (rerank_center + logit(r*)/rerank_slope - w_global)/w_rank.
       With rerank disabled the cap is r* itself; the min of the two
       covers both paths.
    3. rank score < cap iff weighted sum < score_center +
       logit(cap)/score_slope.

    A pair whose JVM-computable UPPER BOUND on the weighted sum is below
    this value gets zeroed Python features (score only drops — weights
    are positive and features non-negative — so it stays below r* and
    stays irrelevant), and the Python battery skips it."""
    import math

    from alligator_spark.operators.rerank import (
        RERANK_CENTER,
        RERANK_SLOPE,
        RERANK_W_GLOBAL,
        RERANK_W_RANK,
    )

    def logit(p: float) -> float:
        return math.log(p / (1.0 - p))

    r_star = min(
        MATCH_MIN_SCORE - MATCH_GAP_THRESHOLD,
        MATCH_MIN_SCORE / MATCH_RATIO_THRESHOLD,
    )
    s1_rerank = (
        RERANK_CENTER + logit(r_star) / RERANK_SLOPE - RERANK_W_GLOBAL
    ) / RERANK_W_RANK
    s1_cap = min(r_star, s1_rerank)
    return SCORE_CENTER + logit(s1_cap) / SCORE_SLOPE


def score_pairs(
    pairs: DataFrame,
    normalized: DataFrame,
    prefilter: bool = True,
    n_pairs_hint: int | None = None,
) -> DataFrame:
    """pairs(doc_a, doc_b, block_key) + normalized -> scored edges.

    Output: (doc_a, doc_b, block_key, features map, score).

    ``prefilter`` (default on) routes pairs around the Python half of
    the battery when a JVM-side upper bound proves their score can
    never reach relevance (see ``prefilter_lin_cap``); their Python
    features read as 0 and their score is a sound underestimate of an
    already-irrelevant value. Pass False to force the full battery
    (the equivalence test uses it).
    """
    # persist + EAGER count: BOTH side joins read this subtree and
    # exchange-reuse does not fire across the differently-keyed joins
    # (verified: 0 ReusedExchange, the per-doc featurize pandas pass ran
    # twice). The count matters as much as the persist: AQE materializes
    # the two join-side shuffles as CONCURRENT jobs, and with a lazy
    # persist each of them recomputes the whole featurize pass before
    # the cache exists (cache stampede) — exactly the duplication the
    # persist was meant to prevent. Build the cache once, then fan out.
    feats = featurize_sides(normalized).persist()
    feats.count()

    def side(suffix: str):
        alias = {"norm_mention": "mention"}
        return feats.select(
            F.col("doc_id").alias(f"doc_{suffix}"),
            *[
                F.col(c).alias(f"{alias.get(c, c)}_{suffix}")
                for c in _SIDE_COLS
            ],
        )

    # shuffle-hash, never broadcast: the feature side is the CORPUS — a
    # broadcast would serially collect+rebuild it on the driver per run
    # (measured: the dominant non-scaling cost of this stage) and cannot
    # exist at real scale. Both sides shuffle on doc id; the hash table
    # builds on the (smaller) per-doc feature side within each partition.
    enriched = pairs.join(side("a").hint("shuffle_hash"), "doc_a").join(
        side("b").hint("shuffle_hash"), "doc_b"
    )

    def ov(a: str, b: str):
        """|A∩B| / max(|A|,|B|,1) on precomputed hash arrays — pure JVM
        (whole-stage codegen), zero Python."""
        return F.size(F.array_intersect(F.col(a), F.col(b))) / F.greatest(
            F.size(F.col(a)), F.size(F.col(b)), F.lit(1)
        )

    jvm_feats = {
        "ntoken_mention": F.size(F.split("mention_a", " ")).cast("double"),
        "ntoken_entity": F.size(F.split("mention_b", " ")).cast("double"),
        "length_mention": F.length("mention_a").cast("double"),
        "length_entity": F.length("mention_b").cast("double"),
        "jaccard_score": ov("tok_m_a", "tok_m_b"),
        "jaccardNgram_score": ov("g3_m_a", "g3_m_b"),
        "desc": ov("gw_r_a", "gw_r_b"),
        "descNgram": ov("g3_r_a", "g3_r_b"),
        # F3/F5 parity: token_based similarity over tokenize_text sets
        # (lowercase, word_tokenize-approx, English stopwords removed —
        # alligator/utils.py:50-53,143-150) on the per-DOC precomputed
        # hash arrays: O(docs) tokenization, JVM array_intersect per pair
        "p_subj_lit_row": ov("st_r_a", "st_r_b"),
    }

    # light Python half: levenshtein + jaro-winkler + literal sims
    py_in = [
        "mention_a", "mention_b",
        "lit_numbers_a", "lit_numbers_b",
        "lit_dates_a", "lit_dates_b",
        "lit_strings_a", "lit_strings_b",
    ]

    @F.pandas_udf(_RESULT_TYPE)
    def battery(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _score_batch(pdf)

    withf = enriched.withColumns(jvm_feats)
    if prefilter:
        # JVM upper bound on the weighted feature sum (see
        # prefilter_lin_cap for why a pair below the cap is provably
        # irrelevant). Per weighted feature:
        #  * jaccard / jaccardNgram / p_subj_lit_row: the EXACT JVM value
        #  * jw_score: <= 1 always
        #  * ed_score = 1 - lev/max(len): lev >= |len_a - len_b| and
        #    lev >= (max(|G_a|,|G_b|) - |G_a∩G_b|)/3 (one edit destroys
        #    at most 3 distinct per-token 3-grams); the mention gram
        #    arrays are 32-bit-folded, so 2 units of slack absorb any
        #    conceivable fold collision in the intersect
        #  * lit_str_sim = max over literal pairs of |Gx∩Gy|/max(|Gx|,|Gy|,1)
        #    <= |U_a∩U_b| / max(min_gram_a, min_gram_b, 1) on the
        #    collision-free packed union arrays (numerator: Gx∩Gy ⊆
        #    U_a∩U_b; denominator: |Gx| >= min_a, |Gy| >= min_b)
        #  * lit_num_close > 0 iff some numeric pair's similarity > 0.98;
        #    checked on the battery's own float()-parsed doubles with the
        #    identical formula (0.979 adds pure-defense margin)
        #  * lit_date_close <= 1 if both sides have date literals else 0
        la, lb = F.length("mention_a"), F.length("mention_b")
        ga, gb = F.size("g3_m_a"), F.size("g3_m_b")
        inter_g3m = F.size(F.array_intersect("g3_m_a", "g3_m_b"))
        deficit = F.greatest(
            F.abs(la - lb).cast("double"),
            (F.greatest(ga, gb) - inter_g3m - F.lit(2)).cast("double") / F.lit(3.0),
            F.lit(0.0),
        )
        ub_ed = F.lit(1.0) - deficit / F.greatest(la, lb, F.lit(1)).cast("double")
        str_present = (F.size("lit_strings_a") > 0) & (F.size("lit_strings_b") > 0)
        ub_str = F.when(
            str_present,
            F.least(
                F.lit(1.0),
                F.size(F.array_intersect("sl_g3_a", "sl_g3_b")).cast("double")
                / F.greatest(
                    F.greatest("sl_min_a", "sl_min_b"), F.lit(1)
                ).cast("double"),
            ),
        ).otherwise(F.lit(0.0))
        num_close_possible = F.exists(
            "num_vals_a",
            lambda x: F.exists(
                "num_vals_b",
                lambda y: x.isNotNull()
                & y.isNotNull()
                & (
                    F.lit(1.0)
                    - F.abs(x - y) / F.greatest(F.abs(x), F.abs(y), F.lit(1.0))
                    > F.lit(0.979)
                ),
            ),
        )
        date_present = (F.size("lit_dates_a") > 0) & (F.size("lit_dates_b") > 0)
        w = SCORE_WEIGHTS
        ub_lin = (
            F.lit(w["jaccard_score"]) * F.col("jaccard_score")
            + F.lit(w["jaccardNgram_score"]) * F.col("jaccardNgram_score")
            + F.lit(w["p_subj_lit_row"]) * F.col("p_subj_lit_row")
            + F.lit(w["ed_score"]) * ub_ed
            + F.lit(w["jw_score"])
            + F.lit(w["lit_str_sim"]) * ub_str
            + F.lit(w["lit_num_close"]) * num_close_possible.cast("double")
            + F.lit(w["lit_date_close"]) * date_present.cast("double")
        )
        withf = withf.withColumn("_skip", ub_lin < F.lit(prefilter_lin_cap()))
    # Project to exactly what the battery + output need, THEN spread.
    # The round-robin exchange (a) drops the per-doc hash arrays from the
    # shuffle — every JVM feature and the prefilter bound are already
    # computed map-side, so only 9 doubles + the py_in columns ship
    # (guide: project before the exchange) — and (b) is a projection
    # barrier, so the Arrow battery's input struct reads plain post-
    # shuffle attributes (inlining the HOF-bearing bound expression into
    # a PythonUDF argument fails codegen and cannot be interpreted).
    # AQE targets ~64MB partitions — right for JVM operators, wrong for a
    # CPU-bound Python stage (a 25MB pair table coalesces to ONE task and
    # serializes the whole battery). Spread explicitly across cores.
    sc = pairs.sparkSession.sparkContext
    keep = (
        ["doc_a", "doc_b", "block_key"]
        + list(jvm_feats.keys())
        + py_in
        + (["_skip"] if prefilter else [])
    )
    # spread width: volume-adaptive when the caller knows the pair count
    # (~1000 pairs/task amortizes the Arrow round-trip; a 500-doc corpus
    # then runs 8 battery tasks instead of 64 fixed-overhead ones),
    # falling back to the 2x-core spread for unknown-size callers. Large
    # inputs clamp to 2x cores either way — identical to the old plan.
    spread = max(sc.defaultParallelism * 2, 8)
    if n_pairs_hint is not None:
        spread = min(max(int(n_pairs_hint) // 1000 + 1, 8), spread)
    withf = withf.select(*keep).repartition(spread)
    py_struct = (
        F.struct(*py_in, F.col("_skip").alias("_skip"))
        if prefilter
        else F.struct(*py_in)
    )
    withf = withf.withColumn("_f", battery(py_struct))
    feat_col = {
        n: (F.col(f"_f.{n}") if n in _PY_FEATURES else F.col(n))
        for n in FEATURE_NAMES
    }
    lin = sum(
        (w * feat_col[name] for name, w in SCORE_WEIGHTS.items()), F.lit(0.0)
    )
    score = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-F.lit(SCORE_SLOPE) * (lin - F.lit(SCORE_CENTER)))
    )
    # R2 provenance (alligator/feature.py:313-359 analogue): which literal
    # evidence produced each kind's similarity, plus the per-kind score map
    def match_struct(kind: str, va: str, vb: str, s: str):
        return F.struct(
            F.lit(kind).alias("kind"),
            F.col(f"_f.{va}").alias("value_a"),
            F.col(f"_f.{vb}").alias("value_b"),
            F.col(f"_f.{s}").alias("sim"),
        )

    matches = F.filter(
        F.array(
            match_struct("number", "best_num_a", "best_num_b", "lit_num_sim"),
            match_struct("date", "best_date_a", "best_date_b", "lit_date_sim"),
            match_struct("string", "best_str_a", "best_str_b", "lit_str_sim"),
        ),
        lambda x: x["value_a"].isNotNull(),
    )
    predicates = F.map_from_arrays(
        F.array(F.lit("number"), F.lit("date"), F.lit("string")),
        F.array(
            F.col("_f.lit_num_sim"), F.col("_f.lit_date_sim"), F.col("_f.lit_str_sim")
        ),
    )
    scored = withf.select(
        "doc_a",
        "doc_b",
        "block_key",
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in FEATURE_NAMES]),
            F.array(*[feat_col[n] for n in FEATURE_NAMES]),
        ).alias("features"),
        matches.alias("matches"),
        predicates.alias("predicates"),
        score.alias("score"),
    )
    return scored


def strong_components(scored: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Connected components over the STRONG edges only (score >= strong).

    Used twice by the pipeline: (1) inside :func:`accept_edges`, where the
    borderline gap/ratio rule ignores runner-up candidates that sit in the
    same strong component as the top-1 (they corroborate the same cluster
    rather than compete with it); (2) as the base map for the final
    clustering, which only needs to contract the few borderline-accepted
    edges on top (``clustering.components_from_strong``).
    Returns ``(doc_id, component_id)`` for docs incident to a strong edge.
    """
    from alligator_spark.operators.clustering import connected_components

    cfg = cfg or ScoringConfig()
    return connected_components(
        scored.filter(F.col("score") >= cfg.strong).select("doc_a", "doc_b")
    )


def accepted_edge_keys(
    scored: DataFrame,
    cfg: ScoringConfig | None = None,
    strong_comps: DataFrame | None = None,
) -> DataFrame:
    """The accepted (doc_a, doc_b) key set of :func:`accept_edges`,
    WITHOUT the join back onto the wide scored table. The clustering
    path only contracts keys, so consuming this directly keeps the wide
    rerank-feature rows out of the accept shuffle entirely (accept_edges
    remains the full-table contract for CEA/CPA consumers)."""
    return _accept_keys(scored, cfg or ScoringConfig(), strong_comps)


def accept_edges(
    scored: DataFrame,
    cfg: ScoringConfig | None = None,
    strong_comps: DataFrame | None = None,
) -> DataFrame:
    """Apply the reference match decision per endpoint candidate list.

    Transitive adaptation of the runner-up rule
    (``backend/app/endpoints/alligator_api.py:63-105``): the reference
    picks ONE entity per mention, so any runner-up is a competing
    alternative. In a clustering setting, a runner-up that is already in
    the same strong component as the top-1 candidate names the SAME
    cluster — ambiguity between two members of one cluster is harmless —
    so the gap/ratio test runs against the best candidate from a
    DIFFERENT strong component. ``strong_comps`` may be passed in
    (precomputed by the pipeline, reused for the final clustering);
    otherwise it is derived here.
    """
    cfg = cfg or ScoringConfig()
    accepted_keys = _accept_keys(scored, cfg, strong_comps)
    return scored.join(accepted_keys, ["doc_a", "doc_b"], "left").withColumn(
        "accepted", F.coalesce("accepted", F.lit(False))
    )


def _accept_keys(
    scored: DataFrame,
    cfg: ScoringConfig,
    strong_comps: DataFrame | None,
) -> DataFrame:
    """(doc_a, doc_b, accepted=true) rows of the match decision."""
    # Strong edges (score >= strong) are accepted UNCONDITIONALLY, so
    # they never need the window — and any endpoint that has a strong
    # edge can never accept a borderline edge through that endpoint
    # (every borderline score < strong <= its rk-1 strong edge's score,
    # so the borderline edge can't be rk == 1 there). The window
    # therefore runs ONLY over the non-strong edges of endpoints with
    # zero strong edges — provably the same accept set as windowing
    # everything, with the window input bounded by construction:
    # non-strong edges come from the capped candidate retrieval
    # (~2 x candidate_limit rows per endpoint), while the UNCAPPED
    # exact-duplicate star edges (pairs.exact_mention_pairs — a mention
    # repeated 10^6 times is a 10^6-edge star) score strong and are
    # routed around it, so a mega-hot mention no longer lands its whole
    # star in one window partition (r5 verdict "What's wrong #2").
    strong_cond = F.col("score") >= cfg.strong
    strong_keys = scored.filter(strong_cond).select("doc_a", "doc_b")
    ns = scored.filter(~strong_cond)

    # candidate list of each endpoint: the non-strong edge seen from
    # both sides
    from_a = ns.select(
        F.col("doc_a").alias("ep"), F.col("doc_b").alias("other"),
        "doc_a", "doc_b", "score",
    )
    from_b = ns.select(
        F.col("doc_b").alias("ep"), F.col("doc_a").alias("other"),
        "doc_a", "doc_b", "score",
    )
    sides = from_a.unionByName(from_b)
    strong_eps = (
        strong_keys.select(F.col("doc_a").alias("ep"))
        .unionAll(strong_keys.select(F.col("doc_b").alias("ep")))
        .distinct()
    )
    # corpus-scale anti join: never broadcast (grows with the corpus)
    sides = sides.join(strong_eps.hint("shuffle_hash"), "ep", "left_anti")

    if strong_comps is None:
        strong_comps = strong_components(scored, cfg)
    # corpus-scale map join: never broadcast (grows with the corpus)
    comp = strong_comps.select(
        F.col("doc_id").alias("other"), F.col("component_id").alias("_oc")
    )
    sides = (
        sides.join(comp.hint("shuffle_hash"), "other", "left")
        .withColumn("other_comp", F.coalesce("_oc", "other"))
        .drop("_oc", "other")
    )

    w = Window.partitionBy("ep").orderBy(F.desc("score"), "doc_a", "doc_b")
    wep = Window.partitionBy("ep")
    # both windows share the ep partitioning: one shuffle, three Window ops
    ranked = (
        sides.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "_top_comp",
            F.max(F.when(F.col("rk") == 1, F.col("other_comp"))).over(wep),
        )
        .withColumn(
            "rival_score",
            F.max(
                F.when(
                    (F.col("rk") > 1) & (F.col("other_comp") != F.col("_top_comp")),
                    F.col("score"),
                )
            ).over(wep),
        )
    )
    borderline = (
        (F.col("rk") == 1)
        & (F.col("score") >= cfg.min_score)
        & (
            F.col("rival_score").isNull()
            | (
                ((F.col("score") - F.col("rival_score")) >= cfg.gap)
                & ((F.col("score") / F.greatest(F.col("rival_score"), F.lit(1e-6))) >= cfg.ratio)
            )
        )
    )
    return (
        strong_keys.unionByName(ranked.filter(borderline).select("doc_a", "doc_b"))
        .distinct()
        .withColumn("accepted", F.lit(True))
    )
