"""CEA-style ranked output + CSV export sink (S6, J4, T1/T2)."""

import csv
import glob
import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def scored_edges(spark):
    # doc "a" has 7 candidates -> truncation to 5; scores force a known order
    rows = [("a", f"c{i}", 0.9 - i * 0.1, i == 0) for i in range(7)]
    rows.append(("b", "c0", 0.5, False))
    return spark.createDataFrame(rows, ["doc_a", "doc_b", "score", "accepted"])


class TestCeaExploded:
    def test_rank_order_and_truncation(self, spark, scored_edges):
        from alligator_spark.operators.output import cea_exploded

        out = cea_exploded(scored_edges, k=5)
        a = sorted(
            [r for r in out.collect() if r["doc_id"] == "a"],
            key=lambda r: r["rank"],
        )
        assert [r["cand_id"] for r in a] == ["c0", "c1", "c2", "c3", "c4"]
        assert a[0]["accepted"] is True and a[1]["accepted"] is False
        # reverse direction: c0 sees candidates a (0.9) and b (0.5)
        c0 = sorted(
            [r for r in out.collect() if r["doc_id"] == "c0"],
            key=lambda r: r["rank"],
        )
        assert [r["cand_id"] for r in c0] == ["a", "b"]

    def test_deterministic_tiebreak(self, spark):
        from alligator_spark.operators.output import cea_exploded

        ties = spark.createDataFrame(
            [("a", "z", 0.5), ("a", "y", 0.5)], ["doc_a", "doc_b", "score"]
        )
        got = sorted(
            [r for r in cea_exploded(ties, 5).collect() if r["doc_id"] == "a"],
            key=lambda r: r["rank"],
        )
        assert [r["cand_id"] for r in got] == ["y", "z"]  # cand asc on tie


class TestCeaTopk:
    def test_spans_intact_and_empty_candidates(self, spark, scored_edges):
        from alligator_spark.operators.output import cea_topk

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )
        docs = spark.createDataFrame(
            [
                ("a", [{"kind": "mention", "text": "t", "media_ref": None, "offset": 0}]),
                ("lonely", [{"kind": "mention", "text": "u", "media_ref": None, "offset": 0}]),
            ],
            schema,
        )
        out = cea_topk(scored_edges, docs, k=5)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows["a"]["spans"] == docs.filter("doc_id='a'").collect()[0]["spans"]
        assert [c["cand_id"] for c in rows["a"]["candidates"]] == [
            "c0", "c1", "c2", "c3", "c4",
        ]
        assert rows["lonely"]["candidates"] == []

    def test_pipeline_emits_cea(self, spark, smoke_docs):
        from alligator_spark.plans.pipeline import run_linkage

        out = run_linkage(spark, smoke_docs)
        cea = out["cea"]
        assert cea.count() == smoke_docs.count()
        # top candidate of a doc with accepted edges is its best match
        with_cands = cea.filter(F.size("candidates") > 0).limit(1).collect()
        if with_cands:
            c = with_cands[0]["candidates"]
            assert c[0]["rank"] == 1
            assert all(
                c[i]["score"] >= c[i + 1]["score"] for i in range(len(c) - 1)
            )


class TestCsvExport:
    def test_roundtrip_with_nested_columns(self, spark, tmp_path):
        from alligator_spark.operators.output import export_csv

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>, n int"
        )
        docs = spark.createDataFrame(
            [
                ("d1", [{"kind": "mention", "text": "hello, world", "media_ref": None, "offset": 0}], 1),
                ("d2", [], 2),
            ],
            schema,
        )
        path = str(tmp_path / "out_csv")
        export_csv(docs, path)
        rows = []
        for f in glob.glob(path + "/part-*.csv"):
            with open(f, newline="") as fh:
                rows += list(csv.DictReader(fh))
        assert len(rows) == 2
        by_id = {r["doc_id"]: r for r in rows}
        spans = json.loads(by_id["d1"]["spans"])
        assert spans[0]["text"] == "hello, world"  # comma survives quoting
        assert by_id["d2"]["n"] == "2"


class TestCeaGolden:
    def test_export_matches_committed_golden(self, spark, tmp_path):
        """End-to-end golden-file replay (the reference's
        tables/imdb_top_100_output.csv pattern): flagship pipeline on the
        deterministic smoke corpus -> CEA CSV export must byte-match the
        committed tests/golden/cea_smoke.csv (rows compared sorted — the
        export is distributed, so on-disk part order is not meaningful).
        Regenerate with scripts/make_cea_golden.py after an intentional
        scorer/pipeline change."""
        import importlib.util
        import os

        spec_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "make_cea_golden.py",
        )
        spec = importlib.util.spec_from_file_location("make_cea_golden", spec_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        out = str(tmp_path / "cea_csv")
        from alligator_spark.operators.output import export_csv

        export_csv(mod.build_cea_rounded(spark).coalesce(1), out)
        part = sorted(glob.glob(f"{out}/part-*.csv"))[0]
        with open(part) as f:
            header, *rows = f.read().splitlines()
        with open(mod.GOLDEN) as f:
            g_header, *g_rows = f.read().splitlines()
        assert header == g_header
        assert sorted(rows) == g_rows
