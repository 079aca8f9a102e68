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

# Supported flat-codebook ceiling for ivf_topk: beyond this, the
# UDF-closure centroid matrix (~n_centroids x dim x 8 bytes per task
# serialization) and the per-Lloyd-round means collect stop being "tiny";
# see the ivf_topk docstring for the hierarchical-IVF scale path.
IVF_MAX_CENTROIDS = 100_000


def _cosine_expr(a, b):
    """JVM-side cosine between two array<float/double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = _norm2_expr(a)
    nb = _norm2_expr(b)
    return F.when(na * nb > 0, dot / (na * nb)).otherwise(F.lit(0.0))


def _norm2_expr(v):
    """L2 norm of an array column — the exact subexpression _cosine_expr
    uses, exposed so join sides can precompute it ONCE per vector instead
    of once per scored pair (identical IEEE doubles either way: same
    expression, same element order)."""
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _dot_expr(a, b):
    """The dot-product half of _cosine_expr (same expression tree)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cos_from_norms(a, b, na, nb):
    """Cosine from precomputed side norms. Bit-identical to
    _cosine_expr(a, b): the norm columns are the same expression
    evaluated on the same array, just hoisted above the join so each
    side's norm is computed once per VECTOR, not once per PAIR (the
    pre-r6 shape re-ran both norm aggregates inside every scored row —
    ~2/3 of the brute-force stage's element operations)."""
    return F.when(na * nb > 0, _dot_expr(a, b) / (na * nb)).otherwise(F.lit(0.0))


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
    from alligator_spark.operators.util import spread_scan

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm2_expr(F.col(vec_col)).alias("_qn"),
    )
    # spread_scan: the join itself never shuffles the corpus (queries
    # broadcast), but a 1-2 split parquet scan would run the whole
    # cosine pass on 1-2 cores — spread only then (at scale the scan is
    # already wide and no repartition happens)
    c = spread_scan(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm2_expr(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            _cos_from_norms(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
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
    max_bucket: int | None = 100_000,
    stats_acc: dict | None = None,
) -> DataFrame:
    """ANN top-k: hyperplane buckets; queries multi-probe (1-bit flips).

    Corpus vectors land in exactly one bucket (scales linearly); only
    queries fan out n_planes+1 probes. Size n_planes with the corpus
    (~log2(N / target_bucket)); a skewed bucket larger than ``max_bucket``
    is truncated to its min-id members (deterministic) and the truncation
    is REPORTED via ``stats_acc`` — never silent. For corpus-scale search
    prefer ``ivf_topk``, whose cell count is an explicit knob.
    """
    buckets = _hyperplane_bucket_udf(n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm2_expr(F.col(vec_col)).alias("_cn"),
        F.element_at(buckets(F.col(vec_col)), 1).alias("bucket"),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("bucket").orderBy("neighbor_id")
        c = c.withColumn("_bn", F.row_number().over(wb))
        if stats_acc is not None:
            # materialize the numbered corpus ONCE so the truncation count
            # and the filter read the same data — the previous shape ran
            # the bucket window twice (one eager stats job + one lazy)
            c = c.localCheckpoint(eager=True)
            row = c.agg(
                F.sum((F.col("_bn") > max_bucket).cast("long")).alias("truncated")
            ).collect()[0]
            stats_acc["truncated_corpus_vectors"] = int(row["truncated"] or 0)
        c = c.filter(F.col("_bn") <= max_bucket).drop("_bn")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm2_expr(F.col(vec_col)).alias("_qn"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos_sim",
            _cos_from_norms(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _norm_expr(v):
    """JVM-side L2 normalization of an array column (double)."""
    norm = F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return F.transform(v, lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-12)))


def _cell_assign_udf(cent: np.ndarray, probes: int):
    """pandas UDF: nearest-`probes` centroid cells per vector (the
    centroid matrix rides to executors inside the UDF closure — tiny)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        mat = np.stack(v.values).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent.T
        order = np.argsort(-sims, axis=1)[:, :probes]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return cells


def _distributed_centroids(
    sample_df: DataFrame,
    vec_col: str,
    n_centroids: int,
    iters: int,
) -> np.ndarray:
    """Spherical k-means with DISTRIBUTED Lloyd rounds — nothing
    corpus-sized ever reaches the driver (r3's version collected a
    32*n_centroids-row sample and iterated driver-side: O(sample x
    centroids x iters) driver flops, untenable once n_centroids ~ sqrt(N)).

    ``sample_df`` carries a pre-normalized ``_xn`` column and an ``_ord``
    hash-order column; per round the members are assigned to their
    nearest centroid by a broadcast-closure pandas UDF (one pass), the
    per-cell per-dimension means come back from a groupBy aggregate, and
    only the n_centroids x dim mean matrix is collected each round."""
    # deterministic init: first n_centroids rows of the hash order
    init_rows = sample_df.orderBy("_ord").limit(n_centroids).select("_xn").collect()
    cent = np.array([list(r["_xn"]) for r in init_rows], dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assign = _cell_assign_udf(cent, 1)
        stats = (
            sample_df.select(
                F.element_at(assign(F.col("_xn")), 1).alias("cell"),
                F.posexplode("_xn").alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cent.copy()
        means = np.zeros_like(cent)
        seen = np.zeros(len(cent), dtype=bool)
        for r in stats:
            means[r["cell"], r["pos"]] = r["m"]
            seen[r["cell"]] = True
        norms = np.linalg.norm(means, axis=1)
        ok = seen & (norms > 1e-12)
        new[ok] = means[ok] / norms[ok, None]
        cent = new
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 5,
    sample_size: int = 2048,
    kmeans_iters: int = 5,
) -> DataFrame:
    """IVF ANN top-k — the corpus-scale path.

    1. deterministic corpus sample (xxhash64 order, never collected) ->
       DISTRIBUTED spherical k-means (``_distributed_centroids``: Lloyd
       assignment is a broadcast-centroid pandas UDF pass, the mean step
       a groupBy aggregate; only the n_centroids x dim matrix reaches
       the driver per round);
    2. each corpus vector is assigned to its nearest centroid cell — ONE
       pass, one int per vector; cells partition the corpus evenly by
       construction (k-means balances mass), so no degenerate buckets;
    3. queries probe their ``nprobe`` nearest cells; candidate generation
       is a cell equi-join touching ~nprobe/n_centroids of the corpus;
    4. exact cosine + window top-k inside the probed cells.

    Scaling knobs are explicit: n_centroids ~ sqrt(N) keeps cells at
    ~sqrt(N) vectors; recall rises with nprobe (nprobe == n_centroids
    degenerates to exact search). ``seed`` is kept for signature
    stability (the deterministic hash-order init needs no RNG).

    SUPPORTED CENTROID CEILING: ``n_centroids <= IVF_MAX_CENTROIDS``
    (10^5). Two driver/closure costs grow linearly with n_centroids and
    bound this implementation: (a) the centroid matrix rides to
    executors inside the pandas-UDF closure — n_centroids x dim float64,
    ~100 MB at 10^5 x 128, re-serialized per stage; (b) each Lloyd round
    collects the n_centroids x dim per-cell means. Both are fine to 10^5
    centroids (cells of ~10^5 vectors cover corpora to N ~ 10^10); the
    naive n_centroids ~ sqrt(N) prescription would exceed the ceiling
    around N ~ 10^10 and emits a warning here — the scale path beyond
    that is hierarchical IVF (a second k-means level inside each cell),
    which keeps every closure at sqrt(ceiling), not a bigger flat
    codebook.
    """
    # sample scales with the requested centroid count (>= 32 rows per
    # centroid) so a sqrt(N)-sized n_centroids is never silently capped by
    # a fixed sample; xxhash64 ordering = deterministic pseudo-random
    # sample independent of partitioning, fetched as a per-partition
    # top-K (TakeOrdered — no global sort of the corpus). The sample
    # STAYS distributed; only its row count (a scalar) comes back.
    del seed
    if n_centroids > IVF_MAX_CENTROIDS:
        import warnings

        warnings.warn(
            f"ivf_topk: n_centroids={n_centroids} exceeds the supported "
            f"ceiling of {IVF_MAX_CENTROIDS} (UDF-closure centroid matrix "
            "and per-round means collect grow linearly with it); use a "
            "hierarchical IVF layout instead of a larger flat codebook",
            stacklevel=2,
        )
    sample_size = max(sample_size, 32 * n_centroids)
    sample_df = (
        corpus.select(
            F.xxhash64(F.col(id_col)).alias("_ord"),
            _norm_expr(F.col(vec_col)).alias("_xn"),
        )
        .orderBy("_ord")
        .limit(sample_size)
        .persist()
    )
    n_sample = sample_df.count()
    if n_centroids > n_sample:
        import warnings

        warnings.warn(
            f"ivf_topk: corpus sample ({n_sample} rows) smaller than "
            f"n_centroids={n_centroids}; capping centroids to the sample",
            stacklevel=2,
        )
    n_centroids = min(n_centroids, n_sample)
    cent = _distributed_centroids(sample_df, vec_col, n_centroids, kmeans_iters)
    sample_df.unpersist()

    assign1 = _cell_assign_udf(cent, 1)
    assignp = _cell_assign_udf(cent, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm2_expr(F.col(vec_col)).alias("_cn"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm2_expr(F.col(vec_col)).alias("_qn"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            _cos_from_norms(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
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
