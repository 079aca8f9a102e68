"""R4 fuzzy-retry blocking pass (reference alligator/processors.py:169-198)."""

from pyspark.sql import functions as F

from alligator_spark.operators.blocking import (
    BlockingConfig,
    block_keys,
    fuzzy_rescue_pairs,
)
from alligator_spark.operators.pairs import candidate_pairs


def _norm(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "norm_mention"])


class TestCandidateCapRanking:
    def test_sig_relevance_beats_block_size(self, spark):
        # The per-endpoint cap must keep the most-SIMILAR candidate, not
        # the one from the smallest block: with limit=1, endpoint dx's
        # junk pair (da, size-2 block) and dt's junk pair (db, size-2)
        # would both outrank the true pair (dt, dx) (size-3 block) under
        # the old block-size ordering — squeezing it from BOTH sides —
        # while signature-agreement ranking keeps it (the 600k
        # never-paired regression, BASELINE.md round-5).
        from alligator_spark.operators.pairs import PairConfig

        keys = spark.createDataFrame(
            [
                ("dx", "tk:shared", "token"),
                ("dt", "tk:shared", "token"),
                ("df", "tk:shared", "token"),
                ("dx", "tk:xj", "token"),
                ("da", "tk:xj", "token"),
                ("dt", "tk:tj", "token"),
                ("db", "tk:tj", "token"),
            ],
            ["doc_id", "block_key", "key_kind"],
        )
        sigs = spark.createDataFrame(
            [
                ("dx", list(range(16))),
                ("dt", list(range(16))),  # identical to dx -> sim 16
                ("df", [100 + i for i in range(16)]),
                ("da", [200 + i for i in range(16)]),
                ("db", [300 + i for i in range(16)]),
            ],
            "doc_id string, sig array<long>",
        )
        cfg = PairConfig(candidate_limit=1)
        with_sigs, _ = candidate_pairs(keys, cfg, sigs=sigs)
        got = {(r["doc_a"], r["doc_b"]) for r in with_sigs.collect()}
        assert ("dt", "dx") in got

        without, _ = candidate_pairs(keys, cfg)
        got_old = {(r["doc_a"], r["doc_b"]) for r in without.collect()}
        assert ("dt", "dx") not in got_old  # the documented old failure


class TestFuzzyRescue:
    def test_lonely_docs_get_loose_pairs(self, spark):
        # single-token mentions, one char apart: no shared token key, no
        # token-sort key; the strict 4x4 bands may miss, the loose 8x2
        # pass must co-block them
        norm = _norm(
            spark,
            [
                ("d1", "kelvortasunbel"),
                ("d2", "kelvortesunbel"),
                ("d3", "zzqqxxyyww"),
            ],
        )
        empty_pairs = spark.createDataFrame([], "doc_a string, doc_b string, block_key string")
        extra = fuzzy_rescue_pairs(norm, empty_pairs).collect()
        got = {(r["doc_a"], r["doc_b"]) for r in extra}
        assert ("d1", "d2") in got
        assert all("d3" not in p for p in got)
        assert all(r["block_key"].startswith("fz:") for r in extra)

    def test_rescue_disjoint_from_existing_pairs(self, spark):
        norm = _norm(spark, [("d1", "alpha beta"), ("d2", "alpha beta")])
        keys = block_keys(norm, BlockingConfig())
        pairs, _ = candidate_pairs(keys)
        extra = fuzzy_rescue_pairs(norm, pairs)
        # both docs already participate -> nothing to rescue
        assert extra.count() == 0

    def test_pipeline_includes_rescue_edges(self, spark):
        from alligator_spark.plans.pipeline import run_linkage

        spans = lambda m: [  # noqa: E731
            {"kind": "mention", "text": m, "media_ref": None, "offset": 0}
        ]
        docs = spark.createDataFrame(
            [
                ("d1", spans("kelvortasunbel")),
                ("d2", spans("kelvortesunbel")),
                ("d3", spans("unrelatedzzz")),
            ],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        out = run_linkage(spark, docs)
        assert out["candidate_edges"].filter("block_key like 'fz:%'").count() >= 0
        comps = {r["doc_id"]: r["component_id"] for r in out["components"].collect()}
        assert comps["d3"] == "d3"
