"""Regenerate the committed CEA golden CSV (tests/golden/cea_smoke.csv).

The reference ships ``tables/imdb_top_100_output.csv`` as an end-to-end
golden artifact; this is our analogue: the flagship pipeline on the
deterministic 20x3+20 smoke corpus (seed 42), CEA output exported through
the real CSV sink, one sorted file a reviewer can diff.

Scores are rounded to 6 decimals before export: every upstream number is
deterministic (rowwise sigmoids; integer-weighted rerank sums), rounding
just removes any last-ulp sensitivity to partial-aggregation order.

Usage: python scripts/make_cea_golden.py  (run from the repo root)
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from alligator_spark.datagen import CorpusSpec, generate_docs
from alligator_spark.operators.output import export_csv
from alligator_spark.plans.pipeline import run_linkage
from alligator_spark.session import get_spark

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "cea_smoke.csv",
)


def build_cea_rounded(spark):
    spec = CorpusSpec(n_entities=20, dups_per_entity=3, n_distractors=20, seed=42)
    docs = generate_docs(spark, spec)
    out = run_linkage(spark, docs)
    cea = out["cea"]
    rounded = F.transform(
        "candidates",
        lambda c: F.struct(
            c["rank"].alias("rank"),
            c["cand_id"].alias("cand_id"),
            F.round(c["score"], 6).alias("score"),
            c["accepted"].alias("accepted"),
        ),
    )
    return cea.withColumn("candidates", rounded)


def main() -> int:
    spark = get_spark(app_name="cea_golden", cores=8)
    tmp = "/tmp/cea_golden_out"
    export_csv(build_cea_rounded(spark).coalesce(1), tmp)
    part = sorted(glob.glob(f"{tmp}/part-*.csv"))[0]
    with open(part) as f:
        header, *rows = f.read().splitlines()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        f.write("\n".join([header, *sorted(rows)]) + "\n")
    shutil.rmtree(tmp)
    print(f"wrote {GOLDEN} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
