"""Small shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Ensure >= core-count partitions before a corpus-wide compute pass.

    A few-MB parquet corpus scans as 1-2 input splits, which serializes
    any per-row-heavy pass (pandas UDF signatures, per-vector cosine
    aggregates) onto 1-2 cores of a 32-core local master. At real scale
    the scan already yields >> defaultParallelism splits and this is a
    structural no-op — the partition check is driver-side planning only,
    no job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return df
    return df.repartition(target) if n < target else df
