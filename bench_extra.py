"""Extra measurement harness (guide §1.4): per-stage decomposition of the
expensive queries with noop-sink isolation and job labels. NOT the frozen
driver bench — bench.py is untouched; numbers here feed OPTIMIZATION_r06.md.

Usage: python bench_extra.py [er|minhash|simhash|all] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn):
    spark.sparkContext.setJobDescription(name)
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {name:40s} {dt:7.2f}s")
    return out


def decompose_er(spark, sf_dir):
    import __spark_entry__ as em
    from alligator_spark.datagen import generate_docs
    from alligator_spark.plans.pipeline import run_linkage

    print("er_clusters stage decomposition:")
    stage_times: dict = {}
    t0 = time.monotonic()
    docs = generate_docs(spark, em._corpus_spec(sf_dir))
    out = run_linkage(spark, docs, stage_times=stage_times)
    n = out["components"].select("doc_id", "component_id").count()
    total = time.monotonic() - t0
    print(f"  rows={n} total={total:.2f}s stages={stage_times}")


def decompose_minhash(spark, sf_dir):
    import __spark_entry__ as em
    from alligator_spark.operators.dedup import minhash_lsh_dedup

    print("minhash_dedup phase decomposition:")
    corpus = em._md5_planted_docs(spark, sf_dir)
    t0 = time.monotonic()
    n = minhash_lsh_dedup(corpus, "doc_id", "text", threshold=0.7).count()
    print(f"  rows={n} total={time.monotonic()-t0:.2f}s")


def decompose_simhash(spark, sf_dir):
    import __spark_entry__ as em
    from alligator_spark.operators.dedup import simhash_dedup

    print("simhash_dedup phase decomposition:")
    corpus = em._md5_planted_docs(spark, sf_dir)
    t0 = time.monotonic()
    n = simhash_dedup(corpus, "doc_id", "text", max_hamming=3).count()
    print(f"  rows={n} total={time.monotonic()-t0:.2f}s")


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from alligator_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    spark.range(1000).selectExpr("sum(id)").collect()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    for r in range(reps):
        print(f"--- repeat {r} ---")
        if which in ("er", "all"):
            decompose_er(spark, sf_dir)
        if which in ("minhash", "all"):
            decompose_minhash(spark, sf_dir)
        if which in ("simhash", "all"):
            decompose_simhash(spark, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
