"""Column classification for untyped input + raw-table onboarding.

Mirrors the reference's sample-based NE/LIT/IGNORED routing
(/root/reference/alligator/manager/data.py:78-141) and its
target_columns override (data.py:114-126).
"""

import pytest
from pyspark.sql import functions as F

from alligator_spark.operators.classify import classify_columns, docs_from_table


@pytest.fixture()
def raw_table(spark):
    rows = [
        (
            str(i),                                    # id: NUMBER
            f"entity name {i}",                        # name: NE (short)
            " ".join(["tok"] * 12),                    # desc: STRING (wordy)
            f"2024-01-{(i % 27) + 1:02d}",             # day: DATETIME
            f"{i}.25",                                 # amount: NUMBER
            "",                                        # blank: IGNORED
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, ["id", "name", "desc", "day", "amount", "blank"]
    )


class TestClassifyColumns:
    def test_kinds(self, spark, raw_table):
        kinds = {
            r["col_name"]: r["kind"] for r in classify_columns(raw_table).collect()
        }
        assert kinds == {
            "id": "NUMBER",
            "name": "NE",
            "desc": "STRING",
            "day": "DATETIME",
            "amount": "NUMBER",
            "blank": "IGNORED",
        }

    def test_sample_is_32_rows(self, spark, raw_table):
        out = classify_columns(raw_table).collect()
        assert all(r["non_empty"] == 32 for r in out if r["col_name"] != "blank")

    def test_mixed_column_threshold(self, spark):
        # 60% threshold: 19/32 numbers -> NUMBER not reached (19*5 < 32*3);
        # 20/32 (62.5%) -> NUMBER
        def tbl(n_nums):
            rows = [
                (f"{i:02d}", str(i) if i < n_nums else f"w{i}") for i in range(32)
            ]
            return spark.createDataFrame(rows, ["k", "v"])

        k19 = {r["col_name"]: r["kind"] for r in classify_columns(tbl(19)).collect()}
        k20 = {r["col_name"]: r["kind"] for r in classify_columns(tbl(20)).collect()}
        assert k19["v"] == "NE" and k20["v"] == "NUMBER"

    def test_target_override_wins(self, spark, raw_table):
        kinds = {
            r["col_name"]: r["kind"]
            for r in classify_columns(
                raw_table, target_overrides={"desc": "NE", "id": "IGNORED"}
            ).collect()
        }
        assert kinds["desc"] == "NE" and kinds["id"] == "IGNORED"
        assert kinds["amount"] == "NUMBER"  # untouched columns keep inference


class TestDocsFromTable:
    def test_spans_shape_and_kinds(self, spark, raw_table):
        cls = {
            r["col_name"]: r["kind"] for r in classify_columns(raw_table).collect()
        }
        docs = docs_from_table(raw_table, cls, id_col="id")
        row = docs.filter("doc_id = '7'").collect()[0]
        kinds = [s["kind"] for s in row["spans"]]
        # mention first, then literals in column order (id itself is a
        # NUMBER column -> literal_number span); IGNORED dropped
        assert kinds == [
            "mention",
            "literal_number",   # id
            "literal_string",   # desc
            "literal_date",     # day
            "literal_number",   # amount
        ]
        assert row["spans"][0]["text"] == "entity name 7"
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets)

    def test_no_ne_column_raises(self, spark, raw_table):
        with pytest.raises(ValueError, match="no NE column"):
            docs_from_table(raw_table, {"id": "NUMBER"})

    def test_cli_csv_path_links_variant_rows(self, spark, tmp_path):
        """The full untyped-CSV CLI surface: classify -> onboard -> link.
        25 pairs of clean_str-variant names must land in 25 components."""
        import csv

        from alligator_spark.cli import main

        p = tmp_path / "untyped.csv"
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["rowid", "name", "amount", "when", "notes"])
            for i in range(50):
                grp = i // 2
                name = (
                    f"acme widget {grp:03d}"
                    if i % 2 == 0
                    else f"Acme_Widget_{grp:03d} [1x]"
                )
                w.writerow(
                    [
                        str(i),
                        name,
                        f"{grp}.50",
                        f"2024-02-{(grp % 27) + 1:02d}",
                        " ".join(["note"] * 10),
                    ]
                )
        wd = str(tmp_path / "wd")
        assert (
            main(["--csv", str(p), "--id-column", "rowid", "--workdir", wd]) == 0
        )
        comps = spark.read.parquet(f"{wd}/*/components")
        assert comps.select("component_id").distinct().count() == 25

    def test_synth_doc_id_no_collisions(self, spark):
        """Without id_col, duplicate mention strings must NOT collapse:
        doc_id hashes the whole row (+ a rank for bit-identical rows)."""
        df = spark.createDataFrame(
            [
                ("acme widget", "1.50"),   # same mention, different literal
                ("acme widget", "2.75"),
                ("acme widget", "2.75"),   # bit-identical to the row above
                ("other corp", "9.00"),
            ],
            ["name", "amount"],
        )
        docs = docs_from_table(df, {"name": "NE", "amount": "NUMBER"})
        rows = docs.collect()
        assert len(rows) == 4
        assert len({r["doc_id"] for r in rows}) == 4  # no silent merge
        # determinism across partitioning: same doc-id SET either way
        ids1 = {r["doc_id"] for r in docs_from_table(df.repartition(7),
                {"name": "NE", "amount": "NUMBER"}).collect()}
        assert ids1 == {r["doc_id"] for r in rows}

    def test_cli_csv_duplicate_names_link_not_premerge(self, spark, tmp_path):
        """ADVICE r4 (high): two CSV rows with the SAME name and different
        literals, onboarded WITHOUT --id-column, must arrive as two docs
        and be linked by the pipeline (1 accepted edge, 1 component) —
        not pre-merged into one doc."""
        import csv

        from alligator_spark.cli import main

        p = tmp_path / "dups.csv"
        notes = " ".join(["industrial fastener supplier catalog"] * 3)
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "amount", "notes"])
            # same mention + corroborating STRING context, amount differs:
            # must onboard as TWO docs and link (the rank model requires
            # literal corroboration, so the notes column carries it)
            w.writerow(["acme widget 001", "1.50", notes])
            w.writerow(["acme widget 001", "2.75", notes])
        wd = str(tmp_path / "wd")
        assert main(["--csv", str(p), "--workdir", wd]) == 0
        comps = spark.read.parquet(f"{wd}/*/components")
        assert comps.count() == 2  # two docs survived onboarding
        assert comps.select("component_id").distinct().count() == 1
        edges = spark.read.parquet(f"{wd}/*/accepted_edges")
        assert edges.filter("accepted").count() == 1

    def test_cli_unknown_target_kind_errors(self, spark, tmp_path):
        """ADVICE r4 (low): a typo'd --target-column kind must error out,
        not silently drop the column."""
        import csv

        from alligator_spark.cli import main

        p = tmp_path / "t.csv"
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "amount"])
            w.writerow(["acme", "1.5"])
        with pytest.raises(SystemExit):
            main(
                ["--csv", str(p), "--target-column", "amount=Number",
                 "--workdir", str(tmp_path / "wd")]
            )

    def test_onboarded_docs_run_the_pipeline(self, spark, raw_table):
        """The full untyped-CSV path: classify -> docs_from_table ->
        normalize/linkage smoke (schema-compatible input)."""
        from alligator_spark.operators.normalize import normalize_docs

        cls = {
            r["col_name"]: r["kind"] for r in classify_columns(raw_table).collect()
        }
        docs = docs_from_table(raw_table, cls, id_col="id")
        norm = normalize_docs(docs)
        assert norm.count() == 40
        got = norm.filter("doc_id = '3'").collect()[0]
        assert got["norm_mention"] == "entity name 3"
        assert got["lit_numbers"] == ["3", "3.25"]  # id + amount columns
        assert got["lit_dates"] == ["2024-01-04"]
