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
