"""Structured-Streaming ingest: stream-static linkage + streaming dedup.

Runs real micro-batches: a file-source stream (parquet files landing in a
directory) through streaming_link / stream_exact_dedup into a memory
sink with an availableNow trigger.
"""

import pytest
from pyspark.sql import functions as F


def _span(kind, text, off):
    return {"kind": kind, "text": text, "media_ref": None, "offset": off}


def _doc(doc_id, mention, lit="x"):
    return {
        "doc_id": doc_id,
        "spans": [
            _span("mention", mention, 0),
            _span("literal_string", lit, 1),
        ],
    }


SPANS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


@pytest.fixture(scope="module")
def static_corpus(spark):
    rows = [
        _doc("c1", "korolen vortis marbel"),
        _doc("c2", "sundun polgal finhol"),
        _doc("c3", "xanyor zelkel lamnor"),
    ]
    return spark.createDataFrame(rows, SPANS_DDL)


class TestStreamingLink:
    def test_stream_static_linkage_strong_only(self, spark, static_corpus, tmp_path):
        from alligator_spark.streaming.ingest import corpus_index, streaming_link

        idx = corpus_index(static_corpus).localCheckpoint(eager=True)

        # arriving docs: one clean-str variant of c1 (must match strongly),
        # one reordered variant of c2 (token-sort key catches it), one
        # unrelated doc (must produce no ACCEPTED edge)
        arrivals = [
            _doc("s1", "Korolen_Vortis_Marbel [3a]"),
            _doc("s2", "finhol sundun polgal"),
            _doc("s3", "totally unrelated words"),
        ]
        src = str(tmp_path / "arrivals")
        spark.createDataFrame(arrivals, SPANS_DDL).write.parquet(src)

        stream = spark.readStream.schema(SPANS_DDL).parquet(src)
        assert stream.isStreaming
        edges = streaming_link(stream, idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("edge_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.table("edge_sink").collect()
        accepted = {(r["doc_id"], r["cand_id"]) for r in out if r["accepted"]}
        assert ("s1", "c1") in accepted
        assert ("s2", "c2") in accepted
        assert not any(d == "s3" for d, _ in accepted)
        # full evidence is emitted: every row carries a score in [0, 1]
        assert all(0.0 <= r["score"] <= 1.0 for r in out)

    def test_incremental_second_batch(self, spark, static_corpus, tmp_path):
        # a second file landing in the directory is picked up as a new
        # micro-batch against the SAME static index — incremental intake,
        # no corpus rescan in the plan (stream-static join)
        from alligator_spark.streaming.ingest import corpus_index, streaming_link

        idx = corpus_index(static_corpus).localCheckpoint(eager=True)
        src = str(tmp_path / "arr2")
        spark.createDataFrame([_doc("s1", "korolen vortis marbel")], SPANS_DDL) \
            .write.parquet(src)
        stream = spark.readStream.schema(SPANS_DDL).parquet(src)
        edges = streaming_link(stream, idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("edge_sink2")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n1 = spark.table("edge_sink2").filter("accepted").count()
        assert n1 >= 1
        # land a second batch and run another availableNow pass
        spark.createDataFrame([_doc("s9", "sundun polgal finhol")], SPANS_DDL) \
            .write.mode("append").parquet(src)
        q2 = (
            streaming_link(spark.readStream.schema(SPANS_DDL).parquet(src), idx)
            .writeStream.format("memory")
            .queryName("edge_sink3")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        acc = {
            (r["doc_id"], r["cand_id"])
            for r in spark.table("edge_sink3").filter("accepted").collect()
        }
        assert ("s9", "c2") in acc


class TestStreamMinhashBands:
    def test_band_key_catches_typo_with_no_shared_token(
        self, spark, tmp_path
    ):
        # "bramblewik" vs corpus "bramblewick": no shared token, different
        # token-sort key — only the strict MinHash band family (band 0
        # collides deterministically at the default 16x4/seed-7 config)
        # can produce the candidate row. The edge must be EMITTED within
        # the micro-batch (acceptance tiering is separate; the batch pass
        # owns the final decision for weak JVM-score pairs).
        from alligator_spark.streaming.ingest import corpus_index, streaming_link

        corpus = spark.createDataFrame([_doc("c4", "bramblewick")], SPANS_DDL)
        src = str(tmp_path / "typo_arrivals")
        spark.createDataFrame([_doc("s4", "bramblewik")], SPANS_DDL).write.parquet(src)

        def run(idx, name, minhash):
            q = (
                streaming_link(
                    spark.readStream.schema(SPANS_DDL).parquet(src),
                    idx,
                    minhash=minhash,
                )
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {
                (r["doc_id"], r["cand_id"]) for r in spark.table(name).collect()
            }

        idx_on = corpus_index(corpus).localCheckpoint(eager=True)
        assert ("s4", "c4") in run(idx_on, "mh_sink_on", True)

        # with banding off on both sides the pair is invisible to the
        # stream (falls to the batch pass per the module SLA) — proves
        # the band family is the load-bearing key here
        idx_off = corpus_index(corpus, minhash=False).localCheckpoint(eager=True)
        assert ("s4", "c4") not in run(idx_off, "mh_sink_off", False)


class TestReconciliation:
    def test_borderline_rejected_on_stream_accepted_after_reconcile(
        self, spark, static_corpus, tmp_path
    ):
        """The module-docstring promise: strong-only rejects a borderline
        candidate on the stream; the batch reconciliation job applies the
        full M4 window rule (rank-1 + gap/ratio) and accepts it."""
        from alligator_spark.streaming.ingest import (
            corpus_index,
            reconcile_edges,
            streaming_link,
        )

        idx = corpus_index(static_corpus).localCheckpoint(eager=True)
        # "korolen vortis zzz" vs c1 "korolen vortis marbel": tok_j=2/3,
        # g3-jaccard puts the JVM score at ~0.818 — borderline band
        # [0.75, 0.92): rejected strong-only, accepted by the M4 rule
        # (rank-1, no runner-up)
        src = str(tmp_path / "borderline")
        spark.createDataFrame(
            [_doc("s1", "korolen vortis zzz")], SPANS_DDL
        ).write.parquet(src)
        edges = streaming_link(spark.readStream.schema(SPANS_DDL).parquet(src), idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("rec_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        sink = spark.table("rec_sink")
        row = sink.filter("cand_id = 'c1'").collect()[0]
        assert 0.75 <= row["score"] < 0.92 and not row["accepted"]

        rec = {
            (r["doc_a"], r["doc_b"]): r["accepted"]
            for r in reconcile_edges(sink).collect()
        }
        assert rec[("c1", "s1")] is True

    def test_reconcile_collapses_duplicate_edges(self, spark):
        from alligator_spark.streaming.ingest import reconcile_edges

        sink = spark.createDataFrame(
            [
                ("s1", "c1", 0.80, False),
                ("c1", "s1", 0.80, False),  # reversed duplicate
                ("s1", "c2", 0.60, False),
            ],
            ["doc_id", "cand_id", "score", "accepted"],
        )
        out = reconcile_edges(sink)
        assert out.count() == 2
        acc = {(r["doc_a"], r["doc_b"]): r["accepted"] for r in out.collect()}
        # 0.80 vs runner-up 0.60: gap 0.2 >= 0.15, ratio 1.33 >= 1.2 -> top-1 in
        assert acc[("c1", "s1")] is True and acc[("c2", "s1")] is False


class TestStreamingCaps:
    def test_hot_corpus_key_is_pruned(self, spark, tmp_path):
        from alligator_spark.streaming.ingest import corpus_index, streaming_link

        corpus = [
            _doc(f"h{i}", f"hotword uniq{i}a uniq{i}b") for i in range(5)
        ]
        idx = corpus_index(
            spark.createDataFrame(corpus, SPANS_DDL), max_block=4
        ).localCheckpoint(eager=True)
        assert idx.filter("block_key = 'tk:hotword'").count() == 0
        # an arrival reachable ONLY through the hot token gets no fan-out
        src = str(tmp_path / "hot")
        spark.createDataFrame(
            [_doc("s1", "hotword somethingelse")], SPANS_DDL
        ).write.parquet(src)
        edges = streaming_link(spark.readStream.schema(SPANS_DDL).parquet(src), idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("hot_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("hot_sink").count() == 0

    def test_hot_key_only_pair_recovered_by_batch_pass(self, spark, tmp_path):
        """Staleness SLA (module docstring): a pair reachable ONLY via a
        dropped hot key is invisible to the stream, and is recovered by
        the periodic batch pass whose accepted edges flow through
        reconcile_edges — worst-case staleness = batch cadence."""
        from alligator_spark.plans.pipeline import run_linkage
        from alligator_spark.streaming.ingest import (
            corpus_index,
            reconcile_edges,
            streaming_link,
        )

        lit = "shared industrial catalog context entry"
        # every corpus mention is exactly the hot token -> BOTH its keys
        # (ts: and tk:) exceed max_block and are dropped from the index
        corpus_rows = [_doc(f"h{i}", "hotword", lit) for i in range(5)]
        corpus = spark.createDataFrame(corpus_rows, SPANS_DDL)
        idx = corpus_index(corpus, max_block=4).localCheckpoint(eager=True)
        assert idx.count() == 0  # the pair is unreachable on the stream

        src = str(tmp_path / "hotonly")
        arrival = spark.createDataFrame([_doc("s1", "hotword", lit)], SPANS_DDL)
        arrival.write.parquet(src)
        edges = streaming_link(spark.readStream.schema(SPANS_DDL).parquet(src), idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("hotonly_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        stream_edges = spark.table("hotonly_sink")
        assert stream_edges.count() == 0  # stream-blind, as documented

        # the periodic batch pass: full pipeline (salted hot blocks) over
        # corpus + arrivals; its accepted edges join the edge sink
        out = run_linkage(spark, corpus.unionByName(arrival))
        batch_edges = out["final_edges"].filter("accepted").select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("cand_id"),
            "score",
        )
        sink = stream_edges.select("doc_id", "cand_id", "score").unionByName(
            batch_edges
        )
        rec = reconcile_edges(sink)
        s1_edges = rec.filter(
            "accepted AND (doc_a = 's1' OR doc_b = 's1')"
        ).count()
        assert s1_edges >= 1  # recovered after one batch period

    def test_event_ts_stream_dedups_within_watermark(self, spark, tmp_path):
        from datetime import datetime

        from alligator_spark.streaming.ingest import corpus_index, streaming_link

        corpus = [_doc("c1", "korolen vortis marbel")]
        idx = corpus_index(spark.createDataFrame(corpus, SPANS_DDL)).localCheckpoint(
            eager=True
        )
        ddl = SPANS_DDL + ", event_ts timestamp"
        src = str(tmp_path / "ts_arrivals")
        # shares 4 keys with c1 (ts: + three tk:) -> 4 raw join rows
        spark.createDataFrame(
            [{**_doc("s1", "korolen vortis marbel"),
              "event_ts": datetime(2026, 1, 1)}],
            ddl,
        ).write.parquet(src)
        edges = streaming_link(spark.readStream.schema(ddl).parquet(src), idx)
        q = (
            edges.writeStream.format("memory")
            .queryName("ts_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("ts_sink").collect()
        assert len(rows) == 1  # watermark-bounded state dedup, no unbounded store
        assert rows[0]["accepted"]


class TestStreamingDedup:
    def test_watermarked_exact_dedup(self, spark, tmp_path):
        from alligator_spark.streaming.ingest import stream_exact_dedup

        from datetime import datetime

        rows = [
            {**_doc("d1", "same text"), "event_ts": datetime(2026, 1, 1, 0, 0, 0)},
            {**_doc("d2", "Same_Text"), "event_ts": datetime(2026, 1, 1, 0, 0, 1)},
            {**_doc("d3", "different"), "event_ts": datetime(2026, 1, 1, 0, 0, 2)},
        ]
        ddl = SPANS_DDL + ", event_ts timestamp"
        src = str(tmp_path / "dedup_src")
        spark.createDataFrame(rows, ddl).write.parquet(src)
        stream = spark.readStream.schema(ddl).parquet(src)
        out = stream_exact_dedup(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("dedup_sink").collect()
        # d1/d2 normalize to the same cleaned text -> exactly one survives
        hashes = [r["text_hash"] for r in got]
        assert len(hashes) == len(set(hashes)) == 2
