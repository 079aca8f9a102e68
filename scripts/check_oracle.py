"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet tables; compare row count + column names +
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if isinstance(v, float):
            # Collapse -0.0/0.0 and tiny representation drift, but KEEP the
            # float-ness visible: the driver's value hash distinguishes int64
            # 32 from float64 32.0 (this masked the r4 infer_column_kinds
            # dtype bug), so an integral float must not canonicalize to the
            # same string as an int.
            s = f"{v:.9g}"
            if "." not in s and "e" not in s and "n" not in s:
                s += ".0"
            return s
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return tuple(cols), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from alligator_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{wall:.1f}s]")
            if len(spdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, srows = canon(spdf)
        oc, orows = canon(odf)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        if srows != orows:
            ndiff = sum(1 for a, b in zip(srows, orows) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(srows)} rows differ")
            for a, b in list(zip(srows, orows))[:2000]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows match [{wall:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
