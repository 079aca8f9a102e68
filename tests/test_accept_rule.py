"""M4 match-decision semantics: the transitive runner-up rule and the
strong-component-contracted final clustering.

The reference's gap/ratio rule (backend/app/endpoints/alligator_api.py:
63-105) compares the top candidate against the runner-up because the
reference picks ONE entity per mention. In the clustering setting a
runner-up that already sits in the same strong component as the top-1
names the SAME cluster — it corroborates rather than competes — so
``accept_edges`` measures gap/ratio against the best candidate from a
DIFFERENT strong component (BASELINE.md round-5 fn diagnosis).
"""

import random

import pytest
from pyspark.sql import functions as F

from alligator_spark.operators.clustering import (
    components_from_strong,
    connected_components,
)
from alligator_spark.operators.scoring import (
    ScoringConfig,
    accept_edges,
    strong_components,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_a string, doc_b string, score double")


def _accepted_set(df):
    return {
        (r["doc_a"], r["doc_b"])
        for r in df.filter("accepted").select("doc_a", "doc_b").collect()
    }


class TestTransitiveRunnerUpRule:
    def test_same_cluster_runner_up_corroborates(self, spark):
        # a's runner-up c is in the same strong component as the top-1 b
        # (edge b-c is strong), so it must NOT suppress the borderline
        # a-b edge even though the raw gap (0.02) fails the 0.15 bar.
        scored = _scored(
            spark,
            [("a", "b", 0.80), ("b", "c", 0.95), ("a", "c", 0.78)],
        )
        acc = _accepted_set(accept_edges(scored, ScoringConfig()))
        assert ("a", "b") in acc
        assert ("b", "c") in acc  # strong, always accepted

    def test_cross_cluster_rival_still_suppresses(self, spark):
        # both endpoints of a-b have a close rival in a DIFFERENT
        # (singleton) strong component -> gap 0.02 < 0.15 rejects it.
        scored = _scored(
            spark,
            [("a", "b", 0.80), ("a", "c", 0.78), ("b", "d", 0.78)],
        )
        acc = _accepted_set(accept_edges(scored, ScoringConfig()))
        assert ("a", "b") not in acc

    def test_one_free_endpoint_is_enough(self, spark):
        # acceptance is the union over both endpoint views: b has no
        # rival at all, so a-b is accepted from b's side regardless of
        # a's crowded candidate list.
        scored = _scored(
            spark,
            [("a", "b", 0.80), ("a", "c", 0.79), ("a", "d", 0.78)],
        )
        acc = _accepted_set(accept_edges(scored, ScoringConfig()))
        assert ("a", "b") in acc

    def test_below_min_score_never_accepted(self, spark):
        scored = _scored(spark, [("a", "b", 0.74)])
        assert _accepted_set(accept_edges(scored, ScoringConfig())) == set()

    def test_precomputed_strong_comps_match_derived(self, spark):
        rows = [
            ("a", "b", 0.93),
            ("b", "c", 0.95),
            ("a", "d", 0.80),
            ("d", "e", 0.78),
            ("c", "f", 0.76),
        ]
        scored = _scored(spark, rows)
        sc = strong_components(scored, ScoringConfig())
        derived = _accepted_set(accept_edges(scored, ScoringConfig()))
        passed = _accepted_set(
            accept_edges(scored, ScoringConfig(), strong_comps=sc)
        )
        assert derived == passed


class TestComponentsFromStrong:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_full_cc_fuzz(self, spark, seed):
        rng = random.Random(seed)
        nodes = [f"n{i:03d}" for i in range(60)]
        rows = []
        for _ in range(150):
            a, b = rng.sample(nodes, 2)
            if a > b:
                a, b = b, a
            rows.append((a, b, round(rng.uniform(0.5, 1.0), 3)))
        scored = _scored(spark, rows).dropDuplicates(["doc_a", "doc_b"])
        cfg = ScoringConfig()
        sc = strong_components(scored, cfg)
        accepted = scored.filter(F.col("score") >= 0.75).select("doc_a", "doc_b")
        all_nodes = spark.createDataFrame(
            [(n,) for n in nodes], "doc_id string"
        )
        got = {
            (r["doc_id"], r["component_id"])
            for r in components_from_strong(sc, accepted, all_nodes).collect()
        }
        want = {
            (r["doc_id"], r["component_id"])
            for r in connected_components(accepted, all_nodes=all_nodes).collect()
        }
        assert got == want

    def test_default_all_nodes_covers_accepted_endpoints(self, spark):
        scored = _scored(
            spark, [("a", "b", 0.95), ("b", "c", 0.80), ("x", "y", 0.93)]
        )
        sc = strong_components(scored, ScoringConfig())
        accepted = scored.select("doc_a", "doc_b")
        out = {
            (r["doc_id"], r["component_id"])
            for r in components_from_strong(sc, accepted).collect()
        }
        assert out == {
            ("a", "a"),
            ("b", "a"),
            ("c", "a"),
            ("x", "x"),
            ("y", "x"),
        }
