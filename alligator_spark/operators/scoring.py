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
the top-1 candidate of either endpoint under the gap/ratio rule.

The whole feature battery runs in ONE Arrow-vectorized pandas UDF; the
acceptance rule is a window function (JVM-side).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

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


@dataclass(frozen=True)
class ScoringConfig:
    strong: float = MATCH_STRONG_SCORE
    min_score: float = MATCH_MIN_SCORE
    gap: float = MATCH_GAP_THRESHOLD
    ratio: float = MATCH_RATIO_THRESHOLD


_RESULT_TYPE = T.StructType(
    [T.StructField(n, T.DoubleType()) for n in FEATURE_NAMES]
    + [T.StructField("score", T.DoubleType())]
)


def _lit_sims(nums_a, nums_b, dates_a, dates_b, strs_a, strs_b):
    """Per-datatype max similarity between the two docs' literal spans —
    the pairwise analogue of p_subj_lit_datatype (max over KB literals of
    a datatype, normalized by LIT column count; alligator/feature.py:361-459).

    Returns (num, date, str, mean-over-present, max-over-present).
    """
    num = date = s = 0.0
    parts = []
    if len(nums_a) and len(nums_b):
        num = max(sim.number_similarity(x, y) for x in nums_a for y in nums_b)
        parts.append(num)
    if len(dates_a) and len(dates_b):
        date = max(sim.date_similarity(x, y) for x in dates_a for y in dates_b)
        parts.append(date)
    if len(strs_a) and len(strs_b):
        s = max(
            sim.ngram_overlap(str(x), str(y), 3) for x in strs_a for y in strs_b
        )
        parts.append(s)
    if not parts:
        return 0.0, 0.0, 0.0, 0.0, 0.0
    return num, date, s, float(np.mean(parts)), float(max(parts))


def _score_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    cols = {name: np.zeros(n) for name in FEATURE_NAMES}
    cols["score"] = np.zeros(n)
    ma = pdf["mention_a"].values
    mb = pdf["mention_b"].values
    ra = pdf["row_text_a"].values
    rb = pdf["row_text_b"].values
    for i in range(n):
        a = ma[i] or ""
        b = mb[i] or ""
        cols["ntoken_mention"][i] = len(a.split(" "))
        cols["ntoken_entity"][i] = len(b.split(" "))
        cols["length_mention"][i] = len(a)
        cols["length_entity"][i] = len(b)
        cols["ed_score"][i] = 1.0 - sim.levenshtein_norm(a, b)
        cols["jaccard_score"][i] = sim.token_overlap(a, b)
        cols["jaccardNgram_score"][i] = sim.ngram_overlap(a, b, 3)
        cols["jw_score"][i] = sim.jaro_winkler(a, b)
        cols["desc"][i] = sim.ngram_overlap(ra[i] or "", rb[i] or "", None)
        cols["descNgram"][i] = sim.ngram_overlap(ra[i] or "", rb[i] or "", 3)
        lit_num, lit_date, lit_str, lit_mean, lit_max = _lit_sims(
            pdf["lit_numbers_a"].iat[i],
            pdf["lit_numbers_b"].iat[i],
            pdf["lit_dates_a"].iat[i],
            pdf["lit_dates_b"].iat[i],
            pdf["lit_strings_a"].iat[i],
            pdf["lit_strings_b"].iat[i],
        )
        cols["lit_num_sim"][i] = lit_num
        cols["lit_date_sim"][i] = lit_date
        cols["lit_str_sim"][i] = lit_str
        # values within 2% / dates within ~a year count as "close"
        cols["lit_num_close"][i] = _close(lit_num, 0.98)
        cols["lit_date_close"][i] = _close(lit_date, 0.999)
        cols["p_subj_lit_datatype"][i] = lit_mean
        cols["p_subj_lit_all_datatype"][i] = lit_max
        cols["p_subj_lit_row"][i] = sim.token_overlap(ra[i] or "", rb[i] or "")
    s = np.zeros(n)
    for name, w in SCORE_WEIGHTS.items():
        s = s + w * cols[name]
    cols["score"] = 1.0 / (1.0 + np.exp(-SCORE_SLOPE * (s - SCORE_CENTER)))
    return pd.DataFrame(cols)


def score_pairs(pairs: DataFrame, normalized: DataFrame) -> DataFrame:
    """pairs(doc_a, doc_b, block_key) + normalized -> scored edges.

    Output: (doc_a, doc_b, block_key, features map, score).
    """
    feats = normalized.select(
        "doc_id", "norm_mention", "row_text", "lit_numbers", "lit_dates", "lit_strings"
    )

    def side(suffix: str):
        return feats.select(
            F.col("doc_id").alias(f"doc_{suffix}"),
            F.col("norm_mention").alias(f"mention_{suffix}"),
            F.col("row_text").alias(f"row_text_{suffix}"),
            F.col("lit_numbers").alias(f"lit_numbers_{suffix}"),
            F.col("lit_dates").alias(f"lit_dates_{suffix}"),
            F.col("lit_strings").alias(f"lit_strings_{suffix}"),
        )

    enriched = pairs.join(side("a"), "doc_a").join(side("b"), "doc_b")

    in_cols = [
        "mention_a", "mention_b", "row_text_a", "row_text_b",
        "lit_numbers_a", "lit_numbers_b", "lit_dates_a", "lit_dates_b",
        "lit_strings_a", "lit_strings_b",
    ]

    @F.pandas_udf(_RESULT_TYPE)
    def battery(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _score_batch(pdf)

    battery_in = F.struct(*[F.col(c) for c in in_cols])
    scored = enriched.withColumn("_f", battery(battery_in)).select(
        "doc_a",
        "doc_b",
        "block_key",
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in FEATURE_NAMES]),
            F.array(*[F.col(f"_f.{n}") for n in FEATURE_NAMES]),
        ).alias("features"),
        F.col("_f.score").alias("score"),
    )
    return scored


def accept_edges(scored: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Apply the reference match decision per endpoint candidate list."""
    cfg = cfg or ScoringConfig()

    # candidate list of each endpoint: the edge seen from both sides
    from_a = scored.select(F.col("doc_a").alias("ep"), "doc_a", "doc_b", "score")
    from_b = scored.select(F.col("doc_b").alias("ep"), "doc_a", "doc_b", "score")
    sides = from_a.unionByName(from_b)

    w = Window.partitionBy("ep").orderBy(F.desc("score"), "doc_a", "doc_b")
    ranked = sides.withColumn("rk", F.row_number().over(w)).withColumn(
        "next_score", F.lead("score").over(w)
    )
    strong = F.col("score") >= cfg.strong
    borderline = (
        (F.col("rk") == 1)
        & (F.col("score") >= cfg.min_score)
        & (
            F.col("next_score").isNull()
            | (
                ((F.col("score") - F.col("next_score")) >= cfg.gap)
                & ((F.col("score") / F.greatest(F.col("next_score"), F.lit(1e-6))) >= cfg.ratio)
            )
        )
    )
    accepted_keys = (
        ranked.filter(strong | borderline)
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("accepted", F.lit(True))
    )
    return scored.join(accepted_keys, ["doc_a", "doc_b"], "left").withColumn(
        "accepted", F.coalesce("accepted", F.lit(False))
    )
