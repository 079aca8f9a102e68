"""The r6 scoring prefilter must be decision-invisible: routing
provably-irrelevant pairs around the Python battery may change their
(already-irrelevant) scores, but never an accept decision or a
component. See scoring.prefilter_lin_cap for the derivation."""

import functools

import pytest


class TestPrefilterDerivation:
    def test_lin_cap_matches_hand_derivation(self):
        import math

        from alligator_spark.operators.rerank import (
            RERANK_CENTER,
            RERANK_SLOPE,
            RERANK_W_GLOBAL,
            RERANK_W_RANK,
        )
        from alligator_spark.operators.scoring import (
            MATCH_GAP_THRESHOLD,
            MATCH_MIN_SCORE,
            MATCH_RATIO_THRESHOLD,
            SCORE_CENTER,
            SCORE_SLOPE,
            prefilter_lin_cap,
        )

        logit = lambda p: math.log(p / (1 - p))  # noqa: E731
        r_star = min(
            MATCH_MIN_SCORE - MATCH_GAP_THRESHOLD,
            MATCH_MIN_SCORE / MATCH_RATIO_THRESHOLD,
        )
        s1 = min(
            r_star,
            (RERANK_CENTER + logit(r_star) / RERANK_SLOPE - RERANK_W_GLOBAL)
            / RERANK_W_RANK,
        )
        assert prefilter_lin_cap() == pytest.approx(
            SCORE_CENTER + logit(s1) / SCORE_SLOPE
        )
        # with the published constants the cap sits just above 0.62 —
        # i.e. well below any true duplicate's weighted sum
        assert 0.60 < prefilter_lin_cap() < 0.65

    def test_rival_threshold_never_blocks(self):
        # any rival strictly below r* clears both the gap and the ratio
        # test for every acceptable score — the exact property the
        # prefilter relies on
        from alligator_spark.operators.scoring import (
            MATCH_GAP_THRESHOLD,
            MATCH_MIN_SCORE,
            MATCH_RATIO_THRESHOLD,
        )

        r_star = min(
            MATCH_MIN_SCORE - MATCH_GAP_THRESHOLD,
            MATCH_MIN_SCORE / MATCH_RATIO_THRESHOLD,
        )
        for s in [MATCH_MIN_SCORE, 0.8, 0.9, 0.99]:
            for r in [r_star - 1e-9, 0.5, 0.1]:
                assert s - r >= MATCH_GAP_THRESHOLD
                assert s / max(r, 1e-6) >= MATCH_RATIO_THRESHOLD


class TestPrefilterDecisionInvariance:
    def test_pipeline_identical_with_and_without(self, spark):
        from alligator_spark.datagen import CorpusSpec, generate_docs
        from alligator_spark.operators import scoring as SC
        from alligator_spark.plans import pipeline as PL

        spec = CorpusSpec(n_entities=60, dups_per_entity=3, n_distractors=60, seed=7)

        def run(prefilter):
            docs = generate_docs(spark, spec)
            orig = PL.score_pairs
            PL.score_pairs = functools.partial(SC.score_pairs, prefilter=prefilter)
            try:
                out = PL.run_linkage(spark, docs)
                comps = sorted(
                    map(
                        tuple,
                        out["components"].select("doc_id", "component_id").collect(),
                    )
                )
                acc = sorted(
                    map(
                        tuple,
                        out["accepted_edges"]
                        .filter("accepted")
                        .select("doc_a", "doc_b")
                        .collect(),
                    )
                )
            finally:
                PL.score_pairs = orig
            return comps, acc

        c_on, a_on = run(True)
        c_off, a_off = run(False)
        assert c_on == c_off
        assert a_on == a_off


def _reference_accept(scored, cfg, strong_comps, F, Window):
    """The pre-r6 accept_edges (single window over ALL edges) — kept as
    the executable specification the bounded decomposition must match."""
    from_a = scored.select(
        F.col("doc_a").alias("ep"), F.col("doc_b").alias("other"),
        "doc_a", "doc_b", "score",
    )
    from_b = scored.select(
        F.col("doc_b").alias("ep"), F.col("doc_a").alias("other"),
        "doc_a", "doc_b", "score",
    )
    sides = from_a.unionByName(from_b)
    comp = strong_comps.select(
        F.col("doc_id").alias("other"), F.col("component_id").alias("_oc")
    )
    sides = (
        sides.join(comp, "other", "left")
        .withColumn("other_comp", F.coalesce("_oc", "other"))
        .drop("_oc", "other")
    )
    w = Window.partitionBy("ep").orderBy(F.desc("score"), "doc_a", "doc_b")
    wep = Window.partitionBy("ep")
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
    strong = F.col("score") >= cfg.strong
    borderline = (
        (F.col("rk") == 1)
        & (F.col("score") >= cfg.min_score)
        & (
            F.col("rival_score").isNull()
            | (
                ((F.col("score") - F.col("rival_score")) >= cfg.gap)
                & (
                    (F.col("score") / F.greatest(F.col("rival_score"), F.lit(1e-6)))
                    >= cfg.ratio
                )
            )
        )
    )
    return sorted(
        map(tuple, ranked.filter(strong | borderline).select("doc_a", "doc_b")
            .distinct().collect())
    )


class TestBoundedAcceptWindow:
    """r6: strong edges are routed around the accept window (a mega-hot
    exact-mention star no longer lands its whole degree in one window
    partition). The decomposition must accept EXACTLY the same edges as
    the single-window reference."""

    def _run_both(self, spark, rows):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from alligator_spark.operators.scoring import (
            ScoringConfig,
            accept_edges,
            strong_components,
        )

        scored = spark.createDataFrame(rows, "doc_a string, doc_b string, score double")
        cfg = ScoringConfig()
        sc = strong_components(scored, cfg).localCheckpoint(eager=True)
        got = sorted(
            map(
                tuple,
                accept_edges(scored, cfg, strong_comps=sc)
                .filter("accepted")
                .select("doc_a", "doc_b")
                .collect(),
            )
        )
        want = _reference_accept(scored, cfg, sc, F, Window)
        assert got == want
        return got

    def test_hot_star_plus_borderline(self, spark):
        # a 1000-edge strong star on one representative (the exact-dup
        # shape pairs.exact_mention_pairs emits) + borderline edges on
        # other endpoints, incl. one that must be rejected by a rival
        rows = [(f"d{i:05d}", "rep", 0.97) for i in range(1, 1001)]
        rows += [
            ("x1", "x2", 0.80),          # lone borderline pair: accept
            ("y1", "y2", 0.80),
            ("y1", "y3", 0.74),          # rival at y1: gap 0.06 < 0.15
            ("y2", "y4", 0.74),          # rival at y2 too -> y1-y2 rejected
        ]
        got = self._run_both(spark, rows)
        assert ("x1", "x2") in got
        assert ("y1", "y2") not in got
        assert len([e for e in got if e[1] == "rep"]) == 1000

    def test_borderline_under_strong_endpoint(self, spark):
        # an endpoint with a strong edge can never borderline-accept:
        # s-a strong; a-b borderline THROUGH a is impossible, but b has
        # no strong edge, so a-b is b's rk-1 and accepts via b when
        # unrivalled
        rows = [("a", "s", 0.95), ("a", "b", 0.80)]
        got = self._run_both(spark, rows)
        assert got == [("a", "b"), ("a", "s")]

    def test_fuzz_matches_reference(self, spark):
        import random

        rng = random.Random(13)
        docs = [f"n{i:03d}" for i in range(40)]
        rows = []
        seen = set()
        for _ in range(300):
            a, b = rng.sample(docs, 2)
            key = (min(a, b), max(a, b))
            if key in seen:
                continue
            seen.add(key)
            rows.append((key[0], key[1], round(rng.uniform(0.3, 1.0), 3)))
        self._run_both(spark, rows)


class TestCandidateLimitFlag:
    def test_cli_flag_reaches_pair_config(self, spark, tmp_path, monkeypatch):
        # --candidate-limit N / none must land in PairConfig (r5 verdict
        # "What's wrong #3": the knob was config-only)
        from alligator_spark import cli as cli_mod

        captured = {}
        import alligator_spark.plans.pipeline as PL

        real = PL.run_pipeline

        def spy(spark_, docs, workdir, cfg=None, resume=True):
            captured["limit"] = cfg.pairs.candidate_limit
            return real(spark_, docs, workdir, cfg, resume)

        monkeypatch.setattr(cli_mod, "run_pipeline", spy, raising=False)
        # cli imports run_pipeline inside main -> patch the module it
        # imports from
        monkeypatch.setattr(PL, "run_pipeline", spy)
        for flag, want in [("7", 7), ("none", None)]:
            captured.clear()
            rc = cli_mod.main(
                [
                    "--synthesize",
                    "5x2+5",
                    "--workdir",
                    str(tmp_path / f"wd_{flag}"),
                    "--candidate-limit",
                    flag,
                ]
            )
            assert rc == 0
            assert captured["limit"] == want

    def test_default_limit_unchanged(self):
        from alligator_spark.operators.pairs import PairConfig

        assert PairConfig().candidate_limit == 32
