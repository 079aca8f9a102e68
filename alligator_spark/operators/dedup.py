"""Deduplication operators for large-scale corpus curation.

Beyond the reference's entity resolution, a training-data pipeline needs
document-level dedup. All variants follow the same scalable shape as the
ER pipeline: cheap key generation -> bucket self-join -> (optional)
verify -> connected components -> representative pick. No driver-side
loops; everything shuffles on bucket keys.

* exact_dedup          — hash-groupBy on normalized text (one shuffle)
* minhash_lsh_dedup    — shingle -> MinHash -> band bucket join -> verify
* simhash_dedup        — 64-bit SimHash, banded by 16-bit chunks, verify
  by Hamming distance
* ngram_jaccard_dedup  — exact n-gram Jaccard verify inside LSH buckets
* embedding_neardup    — cosine near-dup via random-hyperplane LSH buckets
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alligator_spark.functions.hashing import minhash_band_keys, simhash64
from alligator_spark.operators.clustering import connected_components


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: representative id + duplicate count.

    Map-side partial agg + one shuffle on the text hash; at 100 TB the
    md5 keys distribute uniformly (no skew beyond genuinely repeated
    docs, which AQE skew-split handles).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _pairs_from_buckets(keyed: DataFrame, id_col: str, max_bucket: int = 256) -> DataFrame:
    """(id, bucket_key) -> candidate pairs (a < b), oversized buckets dropped."""
    sizes = keyed.groupBy("bucket_key").agg(F.count("*").alias("sz"))
    keyed = keyed.join(sizes, "bucket_key").filter(
        (F.col("sz") > 1) & (F.col("sz") <= max_bucket)
    )
    a = keyed.select(F.col("bucket_key"), F.col(id_col).alias("a"))
    b = keyed.select(F.col("bucket_key"), F.col(id_col).alias("b"))
    return (
        a.join(b, "bucket_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 17,
) -> DataFrame:
    nh, nb, sd = num_hashes, bands, seed

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def mh(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_band_keys(s.tolist(), nh, nb, sd))

    return df.select(
        F.col(id_col),
        F.explode(mh(F.col(text_col))).alias("bucket_key"),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-dup clusters: MinHash band buckets -> exact 3-gram Jaccard
    verify >= threshold -> connected components.

    Returns (id, component_id)."""
    keyed = minhash_buckets(df, id_col, text_col, num_hashes, bands)
    pairs = _pairs_from_buckets(keyed, id_col)
    texts_a = df.select(F.col(id_col).alias("a"), F.col(text_col).alias("ta"))
    texts_b = df.select(F.col(id_col).alias("b"), F.col(text_col).alias("tb"))
    sc = df.sparkSession.sparkContext
    # keep the Python verify stage spread across cores (AQE would coalesce
    # the small bucket-join output to one task — see scoring.score_pairs)
    enriched = (
        pairs.join(texts_a, "a")
        .join(texts_b, "b")
        .repartition(max(sc.defaultParallelism * 2, 8))
    )

    @F.pandas_udf(T.DoubleType())
    def jac3(sa: pd.Series, sb: pd.Series) -> pd.Series:
        from alligator_spark.functions.similarity import ngram_overlap

        return pd.Series(
            [ngram_overlap(x or "", y or "", 3) for x, y in zip(sa, sb)]
        )

    verified = enriched.withColumn("jac", jac3("ta", "tb")).filter(
        F.col("jac") >= threshold
    )
    edges = verified.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    return connected_components(edges, all_nodes=df.select(F.col(id_col).alias("doc_id")))


def simhash_dedup(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprint, banded into 4 x 16-bit chunks
    (any chunk equal -> candidate, catches all pairs with Hamming <= 3 by
    pigeonhole... with 4 bands it catches Hamming <= 3 exactly), verify
    Hamming <= max_hamming, cluster."""

    @F.pandas_udf(T.LongType())
    def sh(s: pd.Series) -> pd.Series:
        return pd.Series(
            [np.int64(np.uint64(simhash64(x or ""))) for x in s], dtype="int64"
        )

    sig = df.select(F.col(id_col), sh(F.col(text_col)).alias("sig"))
    chunks = [
        sig.select(
            id_col,
            F.concat(
                F.lit(f"c{i}:"),
                F.shiftrightunsigned(F.col("sig"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .cast("string"),
            ).alias("bucket_key"),
        )
        for i in range(4)
    ]
    keyed = chunks[0]
    for c in chunks[1:]:
        keyed = keyed.unionByName(c)
    pairs = _pairs_from_buckets(keyed, id_col)
    sa = sig.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    verified = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn("ham", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("ham") <= max_hamming)
    )
    edges = verified.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    return connected_components(edges, all_nodes=df.select(F.col(id_col).alias("doc_id")))


def embedding_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH.

    Sign pattern of `n_planes` fixed random hyperplanes = bucket key;
    verify exact cosine >= threshold inside buckets; cluster. Two docs
    with cosine c collide in one bucket with prob (1 - acos(c)/pi)^n.
    """

    def _planes(d: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        return rng.normal(size=(n_planes, d))

    @F.pandas_udf(T.StringType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.values)
        pl = _planes(mat.shape[1])
        bits = (mat @ pl.T) >= 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    @F.pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.values).astype(np.float64)
        b = np.stack(vb.values).astype(np.float64)
        num = (a * b).sum(axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    keyed = df.select(F.col(id_col), bucket(F.col(vec_col)).alias("bucket_key"))
    pairs = _pairs_from_buckets(keyed, id_col, max_bucket=4096)
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    verified = (
        pairs.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", cos("va", "vb"))
        .filter(F.col("cos") >= threshold)
    )
    edges = verified.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    return connected_components(edges, all_nodes=df.select(F.col(id_col).alias("doc_id")))
