"""Driver-contract smoke: entry() runs, every queries() entry returns a
DataFrame at sf0.001, oracle_sql() keys are a subset of queries()."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# cheap queries worth smoke-running per test session (the full oracle
# sweep is scripts/check_oracle.py)
SMOKE = [
    "clean_str",
    "block_keys_token_sort",
    "dedup_exact",
    "token_stats",
    "quality_counts",
    "lang_id",
    "agg_type_freq",
    "topk_per_group",
    "embedding_topk",
    "row_filter_whitelist",
    "set_ops",
    "arrays_overlap_semijoin",
    "sorted_freq_lists",
    "sample_scan",
    "rerank_token_freq",
    "cea_topk",
    "quality_score",
    "fingerprints",
    "media_decode",
]


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


def test_entry_returns_rows(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "component_id"}


def test_oracle_keys_subset_of_queries(entrymod):
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, o - q


@pytest.mark.parametrize("name", SMOKE)
def test_query_smoke(spark, entrymod, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_oracle_spot_check_duckdb(spark, entrymod):
    """One end-to-end oracle comparison inside pytest (clean_str)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    odf = con.execute(entrymod.oracle_sql()["clean_str"]).df()
    sdf = entrymod.queries()["clean_str"](spark, SF).toPandas()
    merged = odf.merge(sdf, on="doc_id", suffixes=("_o", "_s"))
    assert (merged["ctext_o"] == merged["ctext_s"]).all()
