"""CTA/CPA final outputs + hierarchical evaluation credit.

Mirrors the reference's rerank-stage final writes (per-column argmax type
/ predicate keys, ties kept — /root/reference/alligator/ml.py:237-269)
and the CTA evaluator's 0.8^depth / 0.7^depth hierarchy credit
(/root/reference/eval/evaluators/cta_wd.py:66-95).
"""

import pytest
from pyspark.sql import functions as F

from alligator_spark.eval import hierarchical_prf
from alligator_spark.operators.cta import cpa_winners, cta_winners


class TestCtaWinners:
    def test_argmax_with_ties_and_per_doc_dedup(self, spark):
        comps = spark.createDataFrame(
            [("d1", "c1"), ("d2", "c1"), ("d3", "c1"), ("d4", "c2")],
            ["doc_id", "component_id"],
        )
        # d1 carries "x" twice -> must count once (per-doc dedup)
        keys = spark.createDataFrame(
            [
                ("d1", "x"), ("d1", "x"), ("d1", "y"),
                ("d2", "x"), ("d2", "y"),
                ("d3", "z"),
                ("d4", "w"),
            ],
            ["doc_id", "key"],
        )
        out = {
            (r["component_id"], r["type_key"]): r["doc_count"]
            for r in cta_winners(comps, keys).collect()
        }
        # c1: x->2 docs, y->2 docs (TIE, both kept), z->1
        assert out == {("c1", "x"): 2, ("c1", "y"): 2, ("c2", "w"): 1}

    def test_cpa_argmax_over_predicate_sums(self, spark):
        comps = spark.createDataFrame(
            [("d1", "c1"), ("d2", "c1"), ("d3", "c1")],
            ["doc_id", "component_id"],
        )
        edges = spark.createDataFrame(
            [
                ("d1", "d2", {"number": 0.9, "string": 0.5}),
                ("d2", "d3", {"number": 0.3, "string": 0.8, "date": 0.0}),
            ],
            ["doc_a", "doc_b", "predicates"],
        )
        out = {
            (r["component_id"], r["pred_key"]): r["value_sum"]
            for r in cpa_winners(comps, edges).collect()
        }
        # number: 1.2, string: 1.3 -> string wins; date filtered (value 0)
        assert out == {("c1", "string"): 1.3}


class TestHierarchicalPrf:
    @pytest.fixture()
    def hierarchy(self, spark):
        # gold type T: ancestors A1 (depth 1), A6 (depth 6 -> no credit);
        # descendants D1 (depth 1), D4 (depth 4 -> no credit)
        anc = spark.createDataFrame(
            [("T", "A1", 1), ("T", "A6", 6)], ["gt_type", "node", "depth"]
        )
        desc = spark.createDataFrame(
            [("T", "D1", 1), ("T", "D4", 4)], ["gt_type", "node", "depth"]
        )
        return anc, desc

    def _run(self, spark, hierarchy, annotation, gt_types=("T",)):
        anc, desc = hierarchy
        sub = spark.createDataFrame([("c1", annotation)], ["col_id", "annotation"])
        gt = spark.createDataFrame(
            [("c1", t) for t in gt_types], ["col_id", "gt_type"]
        )
        return hierarchical_prf(sub, gt, anc, desc)

    def test_exact_match_scores_1(self, spark, hierarchy):
        m = self._run(spark, hierarchy, "T")
        assert m["precision"] == m["recall"] == m["f1"] == 1.0

    def test_ancestor_depth1_scores_08(self, spark, hierarchy):
        m = self._run(spark, hierarchy, "A1")
        assert m["total_score"] == pytest.approx(0.8)

    def test_descendant_depth1_scores_07(self, spark, hierarchy):
        m = self._run(spark, hierarchy, "D1")
        assert m["total_score"] == pytest.approx(0.7)

    def test_deep_nodes_score_zero(self, spark, hierarchy):
        assert self._run(spark, hierarchy, "A6")["total_score"] == 0.0
        assert self._run(spark, hierarchy, "D4")["total_score"] == 0.0

    def test_max_over_gold_types_and_case_insensitive(self, spark, hierarchy):
        # second gold type matches exactly (case-insensitive) -> max(1.0, .8)
        m = self._run(spark, hierarchy, "a1", gt_types=("T", "A1"))
        assert m["total_score"] == pytest.approx(1.0)

    def test_precision_recall_split(self, spark, hierarchy):
        anc, desc = hierarchy
        # 1 annotated col (exact), 2 gold cols -> P=1, R=0.5, F1=2/3
        sub = spark.createDataFrame([("c1", "T")], ["col_id", "annotation"])
        gt = spark.createDataFrame(
            [("c1", "T"), ("c2", "T")], ["col_id", "gt_type"]
        )
        m = hierarchical_prf(sub, gt, anc, desc)
        assert m["precision"] == pytest.approx(1.0)
        assert m["recall"] == pytest.approx(0.5)
        assert m["f1"] == pytest.approx(2 / 3)

    def test_duplicate_submission_raises(self, spark, hierarchy):
        anc, desc = hierarchy
        sub = spark.createDataFrame(
            [("c1", "T"), ("c1", "T")], ["col_id", "annotation"]
        )
        gt = spark.createDataFrame([("c1", "T")], ["col_id", "gt_type"])
        with pytest.raises(ValueError, match="Duplicate"):
            hierarchical_prf(sub, gt, anc, desc)

    def test_deep_ancestor_also_descendant_scores_zero(self, spark):
        # reference elif ordering (cta_wd.py:74-86): a node that IS an
        # ancestor (depth 6 -> 0) never falls through to descendant
        # credit, even if it is also a descendant within depth
        anc = spark.createDataFrame([("T", "B", 6)], ["gt_type", "node", "depth"])
        desc = spark.createDataFrame([("T", "B", 2)], ["gt_type", "node", "depth"])
        sub = spark.createDataFrame([("c1", "B")], ["col_id", "annotation"])
        gt = spark.createDataFrame([("c1", "T")], ["col_id", "gt_type"])
        m = hierarchical_prf(sub, gt, anc, desc)
        assert m["total_score"] == 0.0


class TestCeaPrf:
    def test_set_based_scoring(self, spark):
        """Pinned arithmetic vs eval/evaluators/cea_wd.py:26-62: 3 gt
        cells, 2 annotated (1 correct via case-insensitive list match,
        1 wrong), 1 submission cell outside the gt universe ignored."""
        from alligator_spark.eval import cea_prf

        gt = spark.createDataFrame(
            [
                ("t1", "1", "0", "http://www.wikidata.org/entity/Q1 http://www.wikidata.org/entity/Q2"),
                ("t1", "2", "0", "http://www.wikidata.org/entity/Q3"),
                ("t1", "3", "0", "http://www.wikidata.org/entity/Q4"),
            ],
            ["tab_id", "row_id", "col_id", "entity"],
        )
        sub = spark.createDataFrame(
            [
                ("t1", "1", "0", "q2"),       # bare qid, wrong case -> correct
                ("t1", "2", "0", "Q999"),     # wrong
                ("t9", "1", "0", "Q1"),       # not in gt -> ignored
            ],
            ["tab_id", "row_id", "col_id", "entity"],
        )
        m = cea_prf(sub, gt)
        assert m["correct"] == 1 and m["annotated"] == 2 and m["gt_cells"] == 3
        assert m["precision"] == pytest.approx(0.5)
        assert m["recall"] == pytest.approx(1 / 3)
        assert m["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))

    def test_duplicate_cells_raise(self, spark):
        from alligator_spark.eval import cea_prf

        gt = spark.createDataFrame(
            [("t1", "1", "0", "Q1")], ["tab_id", "row_id", "col_id", "entity"]
        )
        sub = spark.createDataFrame(
            [("t1", "1", "0", "Q1"), ("t1", "1", "0", "Q2")],
            ["tab_id", "row_id", "col_id", "entity"],
        )
        with pytest.raises(ValueError, match="Duplicate"):
            cea_prf(sub, gt)

    def test_cli_main_cea(self, spark, tmp_path, capsys):
        """The __main__ surface: toy CSVs -> one JSON line with P/R/F1."""
        import json

        from alligator_spark.eval import main

        gt = tmp_path / "gt.csv"
        gt.write_text(
            "t1,1,0,http://www.wikidata.org/entity/Q1\n"
            "t1,2,0,http://www.wikidata.org/entity/Q3\n"
        )
        pred = tmp_path / "pred.csv"
        pred.write_text("t1,1,0,Q1\nt1,2,0,Q9\n")
        assert main(["--task", "cea", "--pred", str(pred), "--gt", str(gt)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["correct"] == 1 and out["annotated"] == 2
        assert out["precision"] == pytest.approx(0.5)
        assert out["rows_per_sec"] is not None


class TestCpaPrf:
    def test_pinned_arithmetic(self, spark):
        """Pinned vs eval/evaluators/cpa_wd.py:33-65: 3 gt pairs, 2
        annotated within the gt universe (1 correct via bare-property
        prefixing + case fold, 1 wrong), 1 outside ignored."""
        from alligator_spark.eval import cpa_prf

        gt = spark.createDataFrame(
            [
                ("t1", "0", "1", "http://www.wikidata.org/prop/direct/P17"),
                ("t1", "0", "2", "http://www.wikidata.org/prop/direct/P31"),
                ("t1", "0", "3", "http://www.wikidata.org/prop/direct/P50"),
            ],
            ["tab_id", "sub_col_id", "obj_col_id", "property"],
        )
        sub = spark.createDataFrame(
            [
                ("t1", "0", "1", "p17"),   # bare, wrong case -> correct
                ("t1", "0", "2", "P99"),   # wrong
                ("t9", "0", "1", "P17"),   # outside gt -> ignored
            ],
            ["tab_id", "sub_col_id", "obj_col_id", "property"],
        )
        m = cpa_prf(sub, gt)
        assert m["correct"] == 1 and m["annotated"] == 2 and m["gt_pairs"] == 3
        assert m["precision"] == pytest.approx(0.5)
        assert m["recall"] == pytest.approx(1 / 3)
        assert m["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))

    def test_duplicate_pairs_raise_and_gt_dedupes(self, spark):
        from alligator_spark.eval import cpa_prf

        gt = spark.createDataFrame(
            [
                # duplicated gt key must dedupe to ONE entry (dict
                # semantics, cpa_wd.py:33-35), not fan out the join
                ("t1", "0", "1", "http://www.wikidata.org/prop/direct/P17"),
                ("t1", "0", "1", "http://www.wikidata.org/prop/direct/P17"),
            ],
            ["tab_id", "sub_col_id", "obj_col_id", "property"],
        )
        sub = spark.createDataFrame(
            [("t1", "0", "1", "P17")],
            ["tab_id", "sub_col_id", "obj_col_id", "property"],
        )
        m = cpa_prf(sub, gt)
        assert m["gt_pairs"] == 1 and m["correct"] == 1
        dup_sub = spark.createDataFrame(
            [("t1", "0", "1", "P17"), ("t1", "0", "1", "P31")],
            ["tab_id", "sub_col_id", "obj_col_id", "property"],
        )
        with pytest.raises(ValueError, match="Duplicate column pairs"):
            cpa_prf(dup_sub, gt)

    def test_cli_main_cpa(self, spark, tmp_path, capsys):
        import json

        from alligator_spark.eval import main

        gt = tmp_path / "gt.csv"
        gt.write_text(
            "t1,0,1,http://www.wikidata.org/prop/direct/P17\n"
            "t1,0,2,http://www.wikidata.org/prop/direct/P31\n"
        )
        pred = tmp_path / "pred.csv"
        pred.write_text("t1,0,1,P17\nt1,0,2,P99\n")
        assert main(["--task", "cpa", "--pred", str(pred), "--gt", str(gt)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["correct"] == 1 and out["annotated"] == 2
        assert out["precision"] == pytest.approx(0.5)


class TestCtaCliIriPrefix:
    def test_bare_qid_scores_against_iri_gt(self, spark, tmp_path, capsys):
        """ADVICE r4 (medium): the CTA CLI must prepend the entity/ IRI
        prefix to bare annotations (cta_wd.py:62-63) — a bare-QID
        submission scores 1.0 against IRI ground truth."""
        import json

        from alligator_spark.eval import main

        gt = tmp_path / "gt.csv"
        gt.write_text("t1,0,http://www.wikidata.org/entity/Q5\n")
        pred = tmp_path / "pred.csv"
        pred.write_text("t1,0,Q5\n")
        assert main(["--task", "cta", "--pred", str(pred), "--gt", str(gt)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["f1"] == pytest.approx(1.0)
        # opt-out restores raw comparison -> 0
        assert main(
            ["--task", "cta", "--pred", str(pred), "--gt", str(gt),
             "--no-iri-prefix"]
        ) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["f1"] == 0.0


class TestPipelineCtaCpa:
    def test_pipeline_emits_cta_cpa(self, spark, smoke_docs):
        from alligator_spark.plans.pipeline import run_linkage

        out = run_linkage(spark, smoke_docs)
        cta = out["cta"]
        assert set(cta.columns) == {"component_id", "type_key", "doc_count"}
        # every multi-doc component must have at least one winning token
        comps = out["components"]
        multi = (
            comps.groupBy("component_id").count().filter("count > 1")
        )
        missing = multi.join(
            cta.select("component_id").distinct(), "component_id", "left_anti"
        ).count()
        assert missing == 0
        cpa = out["cpa"]
        kinds = {r["pred_key"] for r in cpa.select("pred_key").distinct().collect()}
        assert kinds <= {"number", "date", "string"} and kinds
