"""Deduplication operators for large-scale corpus curation.

Beyond the reference's entity resolution, a training-data pipeline needs
document-level dedup. All variants follow the same scalable shape as the
ER pipeline: cheap key generation -> bucket self-join -> (optional)
verify -> connected components -> representative pick. No driver-side
loops; everything shuffles on bucket keys.

* exact_dedup          — hash-groupBy on normalized text (one shuffle)
* minhash_lsh_dedup    — shingle -> MinHash -> band bucket join -> exact
  n-gram Jaccard verify inside the buckets
* simhash_dedup        — 64-bit SimHash, banded by 16-bit chunks, verify
  by Hamming distance
* embedding_neardup    — cosine near-dup via random-hyperplane LSH buckets

Oversize buckets (heavy-hitter duplicates — boilerplate repeated 10^4+
times) are never dropped: ``_pairs_from_buckets`` salt-splits them and
keeps them connected through a representative chain, recording split
counts for lineage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alligator_spark.functions.hashing import minhash_band_keys
from alligator_spark.operators.clustering import connected_components


from alligator_spark.operators.util import spread_scan as _spread


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


def _pairs_from_buckets(
    keyed: DataFrame, id_col: str, max_bucket: int = 256
) -> tuple[DataFrame, DataFrame]:
    """(id, bucket_key) -> (candidate pairs (a < b), bucket stats).

    Buckets up to ``max_bucket`` pair all-vs-all. Larger buckets are NOT
    dropped (a document duplicated 10,000x is exactly what a 100 TB dedup
    run must catch — the most frequent boilerplate lands in the biggest
    buckets): they are *salt-split* into ``g = ceil(sz / max_bucket)``
    groups by ``crc32(id) % g``, pairing all-vs-all within (bucket, salt),
    PLUS all salt-group representatives (each group's min id) paired
    PAIRWISE — g reps -> g*(g-1)/2 rep edges, tiny next to the within-salt
    volume — so a split bucket of mutual near-duplicates stays one
    connected component after the verify filter (CC merges transitively).
    A single rep->bucket-min chain is NOT enough for NEAR duplicates:
    every chain edge must itself survive verification, and pairwise reps
    give g^2/2 verified paths instead of g-1. Per-bucket work is
    O(sz * max_bucket + g^2) instead of O(sz^2), and nothing is silently
    lost; the returned ``stats`` (bucket_key, sz, n_salts) feeds lineage
    (mirrors pairs.candidate_pairs' block_stats).

    Mixed-bucket handling: when ``keyed`` carries a ``salt_key`` column (a
    CONTENT prefix — here the doc's first MinHash band key, shared w.h.p.
    by near-identical docs), each (bucket, salt_key) group in a SPLIT
    bucket additionally contributes STAR edges to its min-id member:
    O(group) extra edges (heavy-hitter safe), every one between docs
    sharing the full content prefix, so it survives the downstream verify
    and keeps a near-dup group connected even when the id salt interleaves
    it with other groups across salts (the r3 residual: same-group docs in
    different salts used to connect only through rep pairs whose reps may
    belong to OTHER groups — pytest quantifies that gap on an adversarial
    interleaved fixture and pins that content stars close it). Without a
    ``salt_key`` column the plain salted pairing applies.

    Join policy: every build side here (bucket stats, the self-join
    side, rep/star tables) is CORPUS-scaled and sits below pandas-UDF
    sources whose size estimates are fiction, so all joins pin
    ``shuffle_hash`` — the same never-broadcast-the-corpus rule the
    scoring path enforces (the r4 plan audit caught the planner choosing
    broadcast for 8 such joins under the 8MB ceiling at small SF; at
    real scale each is a serial driver collect+build).
    """
    has_salt_key = "salt_key" in keyed.columns
    sizes = keyed.groupBy("bucket_key").agg(F.count("*").alias("sz"))
    stats = sizes.withColumn(
        "n_salts",
        F.when(
            F.col("sz") > max_bucket,
            F.ceil(F.col("sz") / max_bucket).cast("int"),
        ).otherwise(F.lit(1)),
    )
    # keyedf — the salted duplicate-bucket rows — is the ONLY corpus-scale
    # frame the pair machinery fans out from, and it is persisted AND
    # eagerly materialized. Two lessons are baked in here (r6, event-log
    # driven): (1) a lazy persist lets AQE's concurrent branch-stage jobs
    # each recompute the whole signature subtree before the cache exists
    # (cache stampede — the same explode+ArrowEvalPython stage ran 3-8x
    # concurrently); (2) the old shape re-executed the sizes-join from
    # cache once per branch (self-join a-side, b-side, reps, star-group,
    # star-rep: 5 scans + shuffles of the full keyed table). Now: one
    # sizes aggregate + one skew-safe shuffle-hash join (partial aggs, no
    # per-key row pileup, AQE can split it), materialized once; every
    # branch reads this small post-filter cache.
    keyedf = (
        keyed.join(stats.hint("shuffle_hash"), "bucket_key")
        .filter(F.col("sz") > 1)
        .withColumn(
            "salt",
            F.when(F.col("n_salts") == 1, F.lit(0)).otherwise(
                F.pmod(F.crc32(F.col(id_col).cast("string")), F.col("n_salts")).cast(
                    "int"
                )
            ),
        )
        .select(
            "bucket_key",
            "salt",
            F.col(id_col).alias("_id"),
            "n_salts",
            *(["salt_key"] if has_salt_key else []),
        )
        .persist()
    )
    # single-flight cache build before the fan-out; the same job reports
    # whether ANY bucket was salt-split, so the split-only machinery
    # (rep pairs, content stars) can be skipped outright below — on
    # corpora with no oversize bucket those branches are empty anyway,
    # but still cost ~4 exchange/AQE stage jobs of pure latency each run
    max_salts = keyedf.agg(F.max("n_salts")).collect()[0][0]
    has_split = (max_salts or 1) > 1
    # Within-group pairs via ONE groupBy + a codegen combination explode
    # instead of a two-sided self-join: the (bucket, salt) group is
    # BOUNDED by construction (<= ~max_bucket after the salt split), so
    # collect_list cannot materialize a mega-row, and one exchange of the
    # duplicate rows replaces the self-join's two. sort_array gives a < b
    # inside the combos directly.
    grp = keyedf.groupBy("bucket_key", "salt").agg(
        F.sort_array(F.collect_list("_id")).alias("ids"),
        F.min("_id").alias("salt_rep"),
        F.first("n_salts").alias("n_salts"),
    )
    if has_split:
        # only the split path reads grp twice (within + rep pairs);
        # unsplit corpora keep it single-consumer and skip the cache
        grp = grp.persist()
        grp.count()
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ids"), i + F.lit(2), F.size(F.col("ids")) - i - F.lit(1)
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    within = (
        grp.filter(F.size("ids") > 1)
        .select(F.explode(combos).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    )
    # split buckets: pair the g salt-group representatives PAIRWISE so the
    # bucket stays connected even when individual rep edges fail the
    # downstream verify (g is small: ceil(sz / max_bucket)); reps ride the
    # same grp aggregate (one row per (bucket, salt))
    pairs = within
    if has_split:
        reps = grp.filter(F.col("n_salts") > 1).select("bucket_key", "salt_rep")
        rep_pairs = (
            reps.select("bucket_key", F.col("salt_rep").alias("a"))
            .join(reps.select("bucket_key", F.col("salt_rep").alias("b")).hint("shuffle_hash"), "bucket_key")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        pairs = pairs.unionByName(rep_pairs)
    if has_salt_key and has_split:
        # content stars: min-id member per (split bucket, content prefix)
        # paired to every other member of that content group — O(group)
        # edges, each verify-surviving by construction (shared prefix).
        # Kept as a streaming join (NOT collect_list): a content group in
        # a split bucket is exactly the unbounded mega-duplicate case.
        grp2 = keyedf.filter(F.col("n_salts") > 1).select(
            "bucket_key", "salt_key", "_id"
        )
        grp_rep = grp2.groupBy("bucket_key", "salt_key").agg(
            F.min("_id").alias("_rep"), F.count("*").alias("_gn")
        )
        star = (
            grp2.join(
                grp_rep.filter(F.col("_gn") > 1).hint("shuffle_hash"),
                ["bucket_key", "salt_key"],
            )
            .filter(F.col("_id") != F.col("_rep"))
            .select(
                F.least("_id", "_rep").alias("a"),
                F.greatest("_id", "_rep").alias("b"),
            )
        )
        pairs = pairs.unionByName(star)
    pairs = pairs.distinct()
    return pairs, stats.select("bucket_key", "sz", "n_salts")


def _record_bucket_stats(stats: DataFrame, stats_acc: dict | None) -> None:
    """Optionally aggregate bucket lineage counts into ``stats_acc``
    (n_buckets / split_buckets / oversize_docs) — one tiny extra job over
    the per-bucket table; skipped when the caller doesn't ask."""
    if stats_acc is None:
        return
    row = stats.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("n_salts") > 1).cast("long")).alias("split_buckets"),
        F.sum(F.when(F.col("n_salts") > 1, F.col("sz")).otherwise(0)).alias(
            "oversize_docs"
        ),
    ).collect()[0]
    stats_acc.update(
        {
            "n_buckets": int(row["n_buckets"] or 0),
            "split_buckets": int(row["split_buckets"] or 0),
            "oversize_docs": int(row["oversize_docs"] or 0),
        }
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

    # salt_key = the doc's FIRST band key: a content prefix shared w.h.p.
    # by near-identical docs, so mixed oversize buckets content-co-salt
    # (see _pairs_from_buckets)
    return df.select(F.col(id_col), mh(F.col(text_col)).alias("_keys")).select(
        F.col(id_col),
        F.explode("_keys").alias("bucket_key"),
        F.element_at("_keys", 1).alias("salt_key"),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 256,
    stats_acc: dict | None = None,
) -> DataFrame:
    """Near-dup clusters: MinHash band buckets -> exact 3-gram Jaccard
    verify >= threshold -> connected components.

    Returns (id, component_id).

    At ``threshold >= 1.0`` the band buckets are skipped entirely: the
    verify accepts exactly the equal-3-gram-set pairs, and the exact-set
    bucket (below) already generates ALL of those candidates — band
    buckets can only add pairs the verify rejects. On a corpus with
    heavy boilerplate similarity the bands otherwise emit orders of
    magnitude of doomed candidates (measured at the sf0.1 planted
    corpus: 1.78M band candidates for 6,000 docs, every accepted edge
    already covered by the exact-set buckets — 22 s -> ~4 s)."""
    # ONE Arrow pass computes BOTH key families (r6 — was two separate
    # pandas-UDF passes over the corpus plus a union of two scans):
    # * LSH band keys (skipped at threshold >= 1.0 — see above)
    # * the exact-gram-set key: one extra bucket per doc keyed by the md5
    #   of its sorted distinct verify-gram hashes. Docs whose VERIFY gram
    #   sets are equal are then guaranteed candidates even when the
    #   (whole-string-shingled) MinHash bands happen to miss them —
    #   making candidate generation COMPLETE at jaccard == 1.0 (the
    #   property the exact-set oracle checks) and robust for heavy
    #   exact duplicates.
    with_bands = threshold < 1.0
    nh, nb = num_hashes, bands

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("bands", T.ArrayType(T.StringType())),
                T.StructField("es", T.StringType()),
                T.StructField("g3", T.ArrayType(T.LongType())),
            ]
        )
    )
    def all_keys(s: pd.Series) -> pd.DataFrame:
        import hashlib

        from alligator_spark.functions.similarity import ngram_hash_array

        texts = s.tolist()
        es_col = []
        g3_col = []
        for x in texts:
            arr = ngram_hash_array(x or "", 3)
            es_col.append(
                "es:" + hashlib.md5(arr.tobytes()).hexdigest() if arr.size else None
            )
            # the verify-gram set itself (63-bit collision-free codepoint
            # pack, < 2^63 so the int64 cast is lossless): shipping it out
            # of this one pass makes the verify stage pure JVM
            g3_col.append(arr.astype(np.int64))
        bands_col = (
            minhash_band_keys(texts, nh, nb, 17)  # minhash_buckets' seed
            if with_bands
            else [[] for _ in texts]
        )
        return pd.DataFrame({"bands": bands_col, "es": es_col, "g3": g3_col})

    # ONE Arrow pass over a spread corpus (see _spread), persisted: the
    # bucket explode AND both verify-side joins read it — unpersisted,
    # the whole key pass re-executes per reference
    k = _spread(df).select(F.col(id_col), all_keys(F.col(text_col)).alias("_k"))
    k = k.persist()
    # band rows salt on the first band key (a content prefix shared
    # w.h.p. by near-identical docs — see _pairs_from_buckets); the
    # exact-set bucket is content-homogeneous by construction, so its
    # key IS its salt prefix
    entries = F.concat(
        F.transform(
            F.col("_k.bands"),
            lambda bk: F.struct(
                bk.alias("bucket_key"),
                F.element_at(F.col("_k.bands"), 1).alias("salt_key"),
            ),
        ),
        F.when(
            F.col("_k.es").isNotNull(),
            F.array(
                F.struct(
                    F.col("_k.es").alias("bucket_key"),
                    F.col("_k.es").alias("salt_key"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<bucket_key:string,salt_key:string>>")),
    )
    keyed = k.select(F.col(id_col), F.explode(entries).alias("_e")).select(
        F.col(id_col),
        F.col("_e.bucket_key").alias("bucket_key"),
        F.col("_e.salt_key").alias("salt_key"),
    )
    pairs, stats = _pairs_from_buckets(keyed, id_col, max_bucket)
    _record_bucket_stats(stats, stats_acc)
    # JVM verify (r6): |A∩B|/max(|A|,|B|,1) over the collision-free packed
    # gram arrays shipped by the key pass — value-identical to the old
    # per-pair Python ngram_overlap (same gram sets, exact 63-bit pack,
    # same IEEE double division), with zero Python boundary and no extra
    # corpus text joins (both sides read the persisted key table).
    grams_a = k.select(
        F.col(id_col).alias("a"), F.col("_k.g3").alias("ga")
    )
    grams_b = k.select(
        F.col(id_col).alias("b"), F.col("_k.g3").alias("gb")
    )
    enriched = pairs.join(grams_a.hint("shuffle_hash"), "a").join(
        grams_b.hint("shuffle_hash"), "b"
    )
    jac = F.size(F.array_intersect("ga", "gb")) / F.greatest(
        F.size("ga"), F.size("gb"), F.lit(1)
    )
    verified = enriched.withColumn("jac", jac).filter(
        F.col("jac") >= threshold
    )
    edges = verified.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    return connected_components(edges, all_nodes=df.select(F.col(id_col).alias("doc_id")))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int = 256,
    stats_acc: dict | None = None,
) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprint, banded into 4 x 16-bit chunks
    (any chunk equal -> candidate, catches all pairs with Hamming <= 3 by
    pigeonhole... with 4 bands it catches Hamming <= 3 exactly), verify
    Hamming <= max_hamming, cluster."""

    @F.pandas_udf(T.LongType())
    def sh(s: pd.Series) -> pd.Series:
        from alligator_spark.functions.hashing import simhash64_batch

        return pd.Series(simhash64_batch(s.tolist()), dtype="int64")

    # ONE signature pass, persisted (r6): the old union-of-4-chunk-scans
    # re-ran the corpus UDF once per chunk and the two verify joins re-ran
    # it twice more — 6 full pandas passes for one signature column.
    # _spread first: a small parquet corpus arrives as 1-2 scan splits,
    # which single-threads the Python pass (no-op when the scan already
    # has >= core-count partitions).
    sig = _spread(df).select(F.col(id_col), sh(F.col(text_col)).alias("sig"))
    sig = sig.persist()
    keyed = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"c{i}:"),
                        F.shiftrightunsigned(F.col("sig"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bucket_key"),
    )
    pairs, stats = _pairs_from_buckets(keyed, id_col, max_bucket)
    _record_bucket_stats(stats, stats_acc)
    sa = sig.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    verified = (
        pairs.join(sa.hint("shuffle_hash"), "a")
        .join(sb.hint("shuffle_hash"), "b")
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
    max_bucket: int = 4096,
    stats_acc: dict | None = None,
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

    # spread (single-split parquet scans would single-thread the UDF),
    # persist + eager count: the sizes aggregate and the bucket join both
    # scan this UDF frame — lazily persisted they'd stampede-recompute it
    keyed = _spread(df).select(
        F.col(id_col), bucket(F.col(vec_col)).alias("bucket_key")
    ).persist()
    keyed.count()
    pairs, stats = _pairs_from_buckets(keyed, id_col, max_bucket)
    _record_bucket_stats(stats, stats_acc)
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    verified = (
        pairs.join(va.hint("shuffle_hash"), "a")
        .join(vb.hint("shuffle_hash"), "b")
        .withColumn("cos", cos("va", "vb"))
        .filter(F.col("cos") >= threshold)
    )
    edges = verified.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    return connected_components(edges, all_nodes=df.select(F.col(id_col).alias("doc_id")))
