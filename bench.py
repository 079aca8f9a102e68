"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus docs/sec for the flagship linkage pipeline}.

Load-robust protocol (round 5): every query runs REPEATS times (default 3,
override with $SPARK_GRAFT_BENCH_REPEATS), INTERLEAVED round-robin — the
full headline list is swept once per repeat, so an ambient host-load window
(this sandbox has external load arriving in ~10-min windows) hits all
queries in a sweep equally instead of holding a single query hostage.
Reported per-query time is the MEDIAN across repeats; "value" is the sum of
medians. Per-repeat sweeps are kept in "repeats" for auditability.

Each query is forced with a count() (no result materialization to the
driver beyond the count).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "er_clusters",
    "minhash_dedup",
    "simhash_dedup",
    "dedup_exact",
    "embedding_topk",
    "embedding_lsh_topk",
    "join_agg_revenue",
    "topk_per_group",
    "agg_type_freq",
    "token_stats",
    "quality_counts",
    "lang_id",
    "token_jaccard_pairs",
    "block_keys_token_sort",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    import __spark_entry__ as entrymod
    from alligator_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm the JVM once (tiny job)
    spark.range(1000).selectExpr("sum(id)").collect()

    # warm the reusable python-worker pool (one no-op Arrow task per core)
    # so the first pandas-UDF query does not pay 32 interpreter spinups
    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, 3200, 1, 32).mapInPandas(_noop, schema="id long").count()

    queries = entrymod.queries()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    for _rep in range(repeats):
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.monotonic()
            rows[name] = fn(spark, sf_dir).count()
            samples[name].append(round(time.monotonic() - t0, 3))

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}

    # flagship throughput: docs/sec over the full linkage pipeline
    n_docs = rows["er_clusters"]
    er_sec = timings["er_clusters"]
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "er_docs": n_docs,
        "er_docs_per_sec": round(n_docs / er_sec, 1) if er_sec else None,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "all"),
        "protocol": {"repeats": repeats, "stat": "median", "interleaved": True},
        "repeats": samples,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
